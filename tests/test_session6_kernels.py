"""Round-4 session-6 kernels: hand-built value pins plus the never-raise
hardening contract for sole_late_supplier (Q21 shape), regional_market_share
(Q8 shape) and readability_scores.  Oracle parity at sf runs in
test_queries_oracle.py; these pin the small-case set-logic semantics the
driver fixtures can't isolate (sole-late vs multi-late orders, single-supplier
orders, NULL dates/keys, out-of-region customers, dangling dimension chains)."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from language_identification_ray.pipelines import analysis, relational


def _w(d, name, cols):
    pq.write_table(pa.table(cols), d / f"{name}.parquet")


D0 = datetime.datetime(1996, 1, 1)


def _day(n):
    return D0 + datetime.timedelta(days=n)


def _q21_tables(d, *, null_spice=False):
    """Order 1: supp 1 late, supp 2 on time  -> supp 1 counts 1.
    Order 2: supp 1 late, supp 2 late        -> nobody (two late suppliers).
    Order 3: supp 1 late, sole supplier      -> nobody (no other supplier).
    Order 4: supp 1 late twice, supp 3 on time -> supp 1 counts 2.
    Optional NULL spice (must not change the above): a NULL-suppkey line in
    order 3 (NULL is not "another supplier"), a NULL-shipdate line by supp 2
    in order 4 (never late, still counts supplier presence — making order 4
    THREE-supplier), and order 5 with a NULL orderdate (joins, never late)."""
    lo, ls, lsd = [], [], []

    def line(o, s, day):
        lo.append(o)
        ls.append(s)
        lsd.append(_day(day) if day is not None else None)

    line(1, 1, 60)   # late (order 1 placed day 0, grace 30)
    line(1, 2, 5)    # on time
    line(2, 1, 60)   # late
    line(2, 2, 70)   # late
    line(3, 1, 60)   # late, sole supplier
    line(4, 1, 45)   # late (order 4 placed day 10)
    line(4, 1, 50)   # late again
    line(4, 3, 12)   # on time
    if null_spice:
        line(3, None, 5)   # NULL suppkey: not "another supplier"
        line(4, 2, None)   # NULL shipdate: present, never late
        line(5, 1, 60)     # order 5 has NULL orderdate: never late
        line(5, 2, 5)
    _w(d, "lineitem", {
        "l_orderkey": pa.array(lo, pa.int64()),
        "l_suppkey": pa.array(ls, pa.int64()),
        "l_shipdate": pa.array(lsd, pa.timestamp("us")),
    })
    okeys = [1, 2, 3, 4] + ([5] if null_spice else [])
    odates = [_day(0), _day(0), _day(0), _day(10)] + ([None] if null_spice else [])
    _w(d, "orders", {
        "o_orderkey": pa.array(okeys, pa.int64()),
        "o_orderdate": pa.array(odates, pa.timestamp("us")),
    })
    _w(d, "supplier", {
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["SUPP_1", "SUPP_2", "SUPP_3"], pa.string()),
    })
    return str(d)


@pytest.mark.parametrize("null_spice", [False, True])
def test_sole_late_supplier_set_logic(ray_session, tmp_path, null_spice):
    sf = _q21_tables(tmp_path, null_spice=null_spice)
    rows = {
        r["s_name"]: r["numwait"]
        for r in relational.sole_late_supplier(sf).take_all()
    }
    # supp 1: 1 (order 1) + 2 (order 4) — orders 2 (two late), 3 (sole
    # supplier) and 5 (NULL orderdate) contribute nothing
    assert rows == {"SUPP_1": 3}


def test_sole_late_supplier_dangling_supplier_dropped(ray_session, tmp_path):
    sf = _q21_tables(tmp_path)
    # rewrite supplier without suppkey 1: its wait-count rows must drop
    # like the SQL inner join (but supp 1 still blocks others as l3)
    _w(tmp_path, "supplier", {
        "s_suppkey": pa.array([2, 3], pa.int64()),
        "s_name": pa.array(["SUPP_2", "SUPP_3"], pa.string()),
    })
    assert relational.sole_late_supplier(sf).take_all() == []


def test_sole_late_supplier_empty_and_all_null(ray_session, tmp_path):
    _w(tmp_path, "lineitem", {
        "l_orderkey": pa.array([None], pa.int64()),
        "l_suppkey": pa.array([None], pa.int64()),
        "l_shipdate": pa.array([None], pa.timestamp("us")),
    })
    _w(tmp_path, "orders", {
        "o_orderkey": pa.array([], pa.int64()),
        "o_orderdate": pa.array([], pa.timestamp("us")),
    })
    _w(tmp_path, "supplier", {
        "s_suppkey": pa.array([], pa.int64()),
        "s_name": pa.array([], pa.string()),
    })
    assert relational.sole_late_supplier(str(tmp_path)).take_all() == []


def _q8_tables(d):
    """Region AMERICA = nations 0,1; target NATION_3 is nation 3 in ASIA.
    Customer 10 is in-region (nation 0), customer 11 is NOT (nation 3).
    Suppliers: 1 → nation 3 (target), 2 → nation 0 (non-target),
    3 → dangling nationkey (chain breaks, rows drop)."""
    _w(d, "region", {
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["AMERICA", "ASIA"], pa.string()),
    })
    _w(d, "nation", {
        "n_nationkey": pa.array([0, 1, 3], pa.int64()),
        "n_name": pa.array(["NATION_0", "NATION_1", "NATION_3"], pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int64()),
    })
    _w(d, "customer", {
        "c_custkey": pa.array([10, 11], pa.int64()),
        "c_nationkey": pa.array([0, 3], pa.int64()),
    })
    _w(d, "supplier", {
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_nationkey": pa.array([3, 0, 99], pa.int64()),
    })
    _w(d, "orders", {
        "o_orderkey": pa.array([100, 101], pa.int64()),
        "o_custkey": pa.array([10, 11], pa.int64()),
    })
    # order 100 (in-region): supp 1 (target) 10.00, supp 2 30.00,
    # supp 3 (dangling chain) 99.00 → dropped.
    # order 101 (out-of-region customer): supp 1 50.00 → dropped.
    _w(d, "lineitem", {
        "l_orderkey": pa.array([100, 100, 100, 101], pa.int64()),
        "l_suppkey": pa.array([1, 2, 3, 1], pa.int64()),
        "l_extendedprice": pa.array([10.0, 30.0, 99.0, 50.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0], pa.float64()),
        "l_shipdate": pa.array([_day(30)] * 4, pa.timestamp("us")),
    })
    return str(d)


def test_regional_market_share_hand_case(ray_session, tmp_path):
    sf = _q8_tables(tmp_path)
    rows = relational.regional_market_share(sf).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["year"] == 1996
    assert r["nation_cents"] == 1000
    assert r["total_cents"] == 4000
    assert r["mkt_share"] == 0.25


def test_regional_market_share_empty(ray_session, tmp_path):
    sf = _q8_tables(tmp_path)
    # out-of-window shipdates → empty result, never raises
    _w(tmp_path, "lineitem", {
        "l_orderkey": pa.array([100], pa.int64()),
        "l_suppkey": pa.array([1], pa.int64()),
        "l_extendedprice": pa.array([10.0], pa.float64()),
        "l_discount": pa.array([0.0], pa.float64()),
        "l_shipdate": pa.array([datetime.datetime(2001, 1, 1)], pa.timestamp("us")),
    })
    assert relational.regional_market_share(sf).take_all() == []


def test_readability_scores_hand_case(ray_session, tmp_path):
    _w(tmp_path, "documents", {
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(
            ["Hello world! How are you?", None, "", "xyz"], pa.string()
        ),
    })
    rows = {r["doc_id"]: r for r in
            analysis.readability_scores(str(tmp_path)).take_all()}
    r1 = rows[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (5, 2, 7)
    assert r1["flesch"] == 206.835 - 1.015 * (5 / 2) - 84.6 * (7 / 5)
    assert all(rows[2][c] is None
               for c in ("n_words", "n_sentences", "n_syllables", "flesch"))
    assert (rows[3]["n_words"], rows[3]["flesch"]) == (0, None)
    # "xyz": 1 word, 0 sentences, 1 syllable ('y') → flesch NULL (s = 0)
    assert (rows[4]["n_words"], rows[4]["n_sentences"],
            rows[4]["n_syllables"], rows[4]["flesch"]) == (1, 0, 1, None)


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


def test_sole_late_supplier_matches_oracle_on_adversarial_random(
    ray_session, tmp_path
):
    """Random lineitem/orders with NULL keys and dates, dense key reuse so
    multi-supplier orders, exact-boundary ship dates (odate + exactly 30
    days must NOT be late on either engine), and dangling suppkeys all
    occur — the Ray kernel must stay frame-identical to the SQL oracle."""
    import random

    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod

    rng = random.Random(4242)
    lo, ls, lsd = [], [], []
    for _ in range(800):
        lo.append(None if rng.random() < 0.04 else rng.randint(1, 60))
        # suppkey 9 is dangling (absent from supplier): blocks others as
        # l3 but never appears in the output
        ls.append(None if rng.random() < 0.04 else rng.randint(1, 9))
        if rng.random() < 0.05:
            lsd.append(None)
        else:
            # cluster around the grace boundary: odates are day 0-5, so
            # day 30-35 offsets land exactly ON some order's boundary
            lsd.append(_day(rng.choice([5, 28, 29, 30, 31, 32, 33, 34, 35, 60])))
    _w(tmp_path, "lineitem", {
        "l_orderkey": pa.array(lo, pa.int64()),
        "l_suppkey": pa.array(ls, pa.int64()),
        "l_shipdate": pa.array(lsd, pa.timestamp("us")),
    })
    okeys = list(range(1, 61))
    odates = [
        None if rng.random() < 0.05 else _day(rng.randint(0, 5)) for _ in okeys
    ]
    _w(tmp_path, "orders", {
        "o_orderkey": pa.array(okeys, pa.int64()),
        "o_orderdate": pa.array(odates, pa.timestamp("us")),
    })
    _w(tmp_path, "supplier", {
        "s_suppkey": pa.array(list(range(1, 9)), pa.int64()),
        "s_name": pa.array([f"SUPP_{i}" for i in range(1, 9)], pa.string()),
    })
    got = relational.sole_late_supplier(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    for t in ("lineitem", "orders", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'")
    want = con.sql(entrymod.oracle_sql()["sole_late_supplier"]).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    assert len(got) > 0  # the fixture must actually exercise the emit path


def test_regional_market_share_matches_oracle_on_adversarial_random(
    ray_session, tmp_path
):
    """Random star with NULL keys/prices, dangling chains at every hop, and
    both in- and out-of-region customers — frame-identical to the oracle."""
    import random

    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod

    rng = random.Random(2424)
    _w(tmp_path, "region", {
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["AMERICA", "ASIA"], pa.string()),
    })
    # nation 7 dangles its region; NATION_3 is the target, in ASIA
    _w(tmp_path, "nation", {
        "n_nationkey": pa.array([0, 1, 3, 7], pa.int64()),
        "n_name": pa.array(
            ["NATION_0", "NATION_1", "NATION_3", "NATION_7"], pa.string()
        ),
        "n_regionkey": pa.array([0, 0, 1, 99], pa.int64()),
    })
    _w(tmp_path, "customer", {
        "c_custkey": pa.array(list(range(1, 21)), pa.int64()),
        "c_nationkey": pa.array(
            [rng.choice([0, 1, 3, 7, 42, None]) for _ in range(20)], pa.int64()
        ),
    })
    _w(tmp_path, "supplier", {
        "s_suppkey": pa.array(list(range(1, 11)), pa.int64()),
        "s_nationkey": pa.array(
            [rng.choice([0, 1, 3, 7, 42, None]) for _ in range(10)], pa.int64()
        ),
    })
    _w(tmp_path, "orders", {
        "o_orderkey": pa.array(list(range(1, 41)), pa.int64()),
        "o_custkey": pa.array(
            [None if rng.random() < 0.05 else rng.randint(1, 22)
             for _ in range(40)],
            pa.int64(),
        ),
    })
    n = 600
    _w(tmp_path, "lineitem", {
        "l_orderkey": pa.array(
            [None if rng.random() < 0.04 else rng.randint(1, 42)
             for _ in range(n)],
            pa.int64(),
        ),
        "l_suppkey": pa.array(
            [None if rng.random() < 0.04 else rng.randint(1, 12)
             for _ in range(n)],
            pa.int64(),
        ),
        "l_extendedprice": pa.array(
            [None if rng.random() < 0.04 else round(rng.uniform(1, 5000), 2)
             for _ in range(n)],
            pa.float64(),
        ),
        "l_discount": pa.array(
            [round(rng.uniform(0, 0.1), 2) for _ in range(n)], pa.float64()
        ),
        "l_shipdate": pa.array(
            [None if rng.random() < 0.04
             else datetime.datetime(rng.choice([1995, 1996, 1997, 1998]),
                                    rng.randint(1, 12), rng.randint(1, 28))
             for _ in range(n)],
            pa.timestamp("us"),
        ),
    })
    got = relational.regional_market_share(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'")
    want = con.sql(entrymod.oracle_sql()["regional_market_share"]).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    assert len(got) > 0
