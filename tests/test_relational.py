"""Regression tests for the relational join operators (pipelines/relational.py)."""

import datetime
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from language_identification_ray.pipelines.relational import (
    events_asof_purchase,
    events_purchases_within_hour,
)


@pytest.fixture()
def events_dir(tmp_path):
    """Tiny events table: user 1 has clicks AND purchases; user 2 has clicks
    but ZERO purchases (the ASOF LEFT JOIN null branch); user 3 purchases only."""
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return base + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1: purchase before + after clicks
        (1, 1, ts(0), "purchase", 10.0),
        (2, 1, ts(5), "click", 0.0),
        (3, 1, ts(10), "purchase", 20.0),
        (4, 1, ts(15), "click", 0.0),
        # user 2: clicks only — no purchases at all
        (5, 2, ts(1), "click", 0.0),
        (6, 2, ts(2), "click", 0.0),
        # user 3: purchases only — no clicks
        (7, 3, ts(3), "purchase", 5.0),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("ns")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    return str(tmp_path)


def test_asof_user_without_purchases_gets_null(ray_session, events_dir):
    df = events_asof_purchase(events_dir).to_pandas().sort_values("event_id")
    # user 1: click@5 sees purchase@0 (10.0); click@15 sees purchase@10 (20.0)
    by_id = df.set_index("event_id")
    assert by_id.loc[2, "last_purchase_value"] == 10.0
    assert by_id.loc[4, "last_purchase_value"] == 20.0
    # user 2's clicks must appear with NULL, not crash with IndexError
    assert set(df["event_id"]) == {2, 4, 5, 6}
    assert np.isnan(by_id.loc[5, "last_purchase_value"])
    assert np.isnan(by_id.loc[6, "last_purchase_value"])


def test_purchases_within_hour_user_without_purchases(ray_session, events_dir):
    df = events_purchases_within_hour(events_dir).to_pandas().set_index("event_id")
    assert df.loc[5, "n_purchases_1h"] == 0
    assert df.loc[6, "n_purchases_1h"] == 0
    assert df.loc[2, "n_purchases_1h"] == 1
    assert df.loc[4, "n_purchases_1h"] == 2


def test_inactive_customers_all_inactive_when_no_recent_orders(ray_session, sf_dir):
    """Cutoff past the last order date: the active side is EMPTY — the
    union-tag anti-join must return every customer (a left_outer
    Dataset.join crashes on this shape in Ray 2.49)."""
    import pyarrow.parquet as pq

    from language_identification_ray.pipelines.relational import inactive_customers

    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    out = inactive_customers(sf_dir, cutoff="2199-01-01").to_pandas()
    assert len(out) == n_cust


def test_top_revenue_orders_unknown_segment_returns_empty(ray_session, sf_dir):
    from language_identification_ray.pipelines.relational import top_revenue_orders

    ds = top_revenue_orders(sf_dir, segment="NOSUCHSEGMENT")
    # schema survives on the Dataset (to_pandas of 0 rows drops columns — Ray quirk)
    assert ds.schema().names == ["orderkey", "revenue", "orderdate", "orderpriority"]
    assert ds.count() == 0


def test_late_shipment_join_fallback_matches_broadcast(ray_session, sf_dir):
    """The size-gated broadcast path and the shuffle-join fallback of
    late_shipment_priority must agree row-for-row: the gate only picks a
    physical plan, never changes the answer."""
    import numpy as np

    from language_identification_ray.pipelines.relational import (
        _late_shipment_priority_join,
        late_shipment_priority,
    )

    fast = (
        late_shipment_priority(sf_dir)
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    grace_ns = np.int64(30) * np.int64(86_400_000_000_000)
    slow = (
        _late_shipment_priority_join(sf_dir, grace_ns)
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    assert fast.equals(slow), (fast, slow)


def test_orders_by_mktsegment_join_fallback_matches_broadcast(ray_session, sf_dir):
    """The size-gated broadcast-lookup plan and the shuffle-join fallback of
    orders_by_mktsegment must agree row-for-row."""
    from language_identification_ray.pipelines.relational import (
        _orders_by_mktsegment_join,
        orders_by_mktsegment,
    )

    fast = (
        orders_by_mktsegment(sf_dir)
        .to_pandas()
        .sort_values("mktsegment")
        .reset_index(drop=True)
    )
    slow = (
        _orders_by_mktsegment_join(sf_dir)
        .to_pandas()
        .sort_values("mktsegment")
        .reset_index(drop=True)
    )
    assert fast.equals(slow), (fast, slow)


def test_top_revenue_orders_join_fallback_matches_broadcast(ray_session, sf_dir):
    """The size-gated broadcast plan and the two-hash-join fallback of
    top_revenue_orders must agree row-for-row (same top-k, same tie cut)."""
    import datetime as dt

    from language_identification_ray.pipelines.relational import (
        _top_revenue_orders_join,
        top_revenue_orders,
    )

    fast = top_revenue_orders(sf_dir).to_pandas().reset_index(drop=True)
    slow = (
        _top_revenue_orders_join(
            sf_dir, "BUILDING", dt.datetime.fromisoformat("1998-07-01"), 10
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    assert fast.equals(slow), (fast, slow)


def test_asof_null_purchase_values_ignored_like_sql_max(ray_session, tmp_path):
    """A (user, ts) slot with one NULL and one real purchase value must keep
    the real value (SQL max() ignores NULLs); an all-NULL slot stays NULL."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from language_identification_ray.pipelines.relational import events_asof_purchase

    T = lambda m: dt.datetime(2026, 1, 1, 0, m)
    rows = [  # (user, minute, type, value)
        (1, 0, "purchase", None), (1, 0, "purchase", 7.0), (1, 5, "click", 0.0),
        (2, 0, "purchase", None), (2, 5, "click", 0.0),
    ]
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([T(m) for _, m, _, _ in rows], pa.timestamp("us")),
                "user_id": pa.array([u for u, _, _, _ in rows], pa.int64()),
                "event_type": pa.array([t for _, _, t, _ in rows], pa.string()),
                "value": pa.array([v for _, _, _, v in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        d / "events.parquet",
    )
    out = events_asof_purchase(str(d)).to_pandas().set_index("user_id")
    assert out.loc[1, "last_purchase_value"] == 7.0  # NULL ignored, real kept
    assert pd.isna(out.loc[2, "last_purchase_value"])  # all-NULL slot -> NULL


def test_late_shipment_null_orderdate_not_late(ray_session, tmp_path):
    """A NULL o_orderdate must exclude the order (SQL: ship >= NULL + grace
    is NULL -> not late), not wrap NaT to INT64_MIN and count everything.
    Both physical plans."""
    import datetime as dt

    from language_identification_ray.pipelines.relational import (
        _late_shipment_priority_join,
        late_shipment_priority,
    )

    d = tmp_path / "lsp"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_orderdate": pa.array(
                    [dt.datetime(2024, 1, 1), None], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"], pa.string()),
            }
        ),
        d / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 2], pa.int64()),
                "l_shipdate": pa.array(
                    [dt.datetime(2024, 3, 1)] * 2, pa.timestamp("us")
                ),
            }
        ),
        d / "lineitem.parquet",
    )
    for plan in (
        lambda: late_shipment_priority(str(d)),
        lambda: _late_shipment_priority_join(
            str(d), np.int64(30) * np.int64(86_400_000_000_000)
        ),
    ):
        out = plan().to_pandas()
        assert out["o_orderpriority"].tolist() == ["1-URGENT"], out
        assert out["n_orders"].tolist() == [1], out


def test_late_shipment_join_multi_partition_parity(monkeypatch, ray_session, sf_dir):
    """_join_partitions now floors at 1, so the default small-input path
    never exercises a multi-partition join; force 4 partitions on the dense
    sf fixture and require parity with the broadcast plan."""
    from language_identification_ray.pipelines import relational

    monkeypatch.setattr(relational, "_join_partitions", lambda *a, **k: 4)
    grace_ns = np.int64(30) * np.int64(86_400_000_000_000)
    slow = (
        relational._late_shipment_priority_join(sf_dir, grace_ns)
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    fast = (
        relational.late_shipment_priority(sf_dir)
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    assert fast.equals(slow), (fast, slow)


def _mini_tpch(tmp_path, empty=False):
    """Handcrafted TPC-H micro-tables with NULL keys and dangling FKs, so
    the inner-join drop semantics of the Q10/Q14/Q18 kernels are exercised
    beyond the well-formed driver fixtures."""
    d = tmp_path / ("tpch_empty" if empty else "tpch_mini")
    d.mkdir()
    t96 = datetime.datetime(1996, 2, 1)

    def w(name, cols):
        pq.write_table(pa.table(cols), d / f"{name}.parquet")

    if empty:
        w("lineitem", {"l_orderkey": pa.array([], pa.int64()),
                       "l_partkey": pa.array([], pa.int64()),
                       "l_quantity": pa.array([], pa.float64()),
                       "l_extendedprice": pa.array([], pa.float64()),
                       "l_discount": pa.array([], pa.float64()),
                       "l_returnflag": pa.array([], pa.string()),
                       "l_shipdate": pa.array([], pa.timestamp("us"))})
        w("orders", {"o_orderkey": pa.array([], pa.int64()),
                     "o_custkey": pa.array([], pa.int64()),
                     "o_orderdate": pa.array([], pa.timestamp("us")),
                     "o_totalprice": pa.array([], pa.float64())})
        w("customer", {"c_custkey": pa.array([], pa.int64()),
                       "c_name": pa.array([], pa.string()),
                       "c_nationkey": pa.array([], pa.int64())})
        w("nation", {"n_nationkey": pa.array([], pa.int64()),
                     "n_name": pa.array([], pa.string())})
        w("part", {"p_partkey": pa.array([], pa.int64()),
                   "p_type": pa.array([], pa.string())})
        return str(d)

    # lineitem: order 1 has R items; order 2 N only; order 3 dangles (no
    # order row); one NULL orderkey row; one NULL partkey row
    w("lineitem", {
        "l_orderkey": pa.array([1, 1, 2, 3, None, 1], pa.int64()),
        "l_partkey": pa.array([10, 11, 10, 12, 10, None], pa.int64()),
        "l_quantity": pa.array([200.0, 150.0, 40.0, 30.0, 5.0, 1.0], pa.float64()),
        "l_extendedprice": pa.array([100.005, 55.55, 20.0, 30.0, 40.0, 7.77], pa.float64()),
        "l_discount": pa.array([0.1, 0.0, 0.5, 0.0, 0.25, 0.0], pa.float64()),
        "l_returnflag": pa.array(["R", "R", "N", "R", "R", "R"], pa.string()),
        "l_shipdate": pa.array([t96 + datetime.timedelta(days=30)] * 6, pa.timestamp("us")),
    })
    # orders: 1 in-window (cust 7), 2 in-window (cust 8 -> dangling customer),
    # 4 out-of-window, 5 NULL custkey
    w("orders", {
        "o_orderkey": pa.array([1, 2, 4, 5], pa.int64()),
        "o_custkey": pa.array([7, 8, 7, None], pa.int64()),
        "o_orderdate": pa.array(
            [t96, t96, datetime.datetime(1997, 1, 1), t96], pa.timestamp("us")
        ),
        "o_totalprice": pa.array([1000.125, 2000.0, 3000.0, 4000.0], pa.float64()),
    })
    # customer 7 valid nation; customer 9 dangling nation
    w("customer", {
        "c_custkey": pa.array([7, 9], pa.int64()),
        "c_name": pa.array(["Cust7", "Cust9"], pa.string()),
        "c_nationkey": pa.array([0, 99], pa.int64()),
    })
    w("nation", {"n_nationkey": pa.array([0], pa.int64()),
                 "n_name": pa.array(["FRANCE"], pa.string())})
    w("part", {"p_partkey": pa.array([10, 11], pa.int64()),
               "p_type": pa.array(["PROMO", "MEDIUM"], pa.string())})
    return str(d)


def _oracle_con(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "nation", "part"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df):
    return (
        df.reindex(sorted(df.columns), axis=1)
        .sort_values(sorted(df.columns))
        .reset_index(drop=True)
    )


def test_returned_item_revenue_mini_matches_oracle(ray_session, tmp_path):
    import __ray_entry__ as entrymod
    from language_identification_ray.pipelines.relational import returned_item_revenue

    d = _mini_tpch(tmp_path)
    got = _canon(returned_item_revenue(d).to_pandas())
    con = _oracle_con(d)
    want = _canon(con.sql(entrymod.oracle_sql()["returned_item_revenue"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # only order 1 (in-window, cust 7, valid nation) contributes; its NULL
    # partkey R item still counts (partkey is irrelevant to Q10)
    assert got["custkey"].tolist() == [7]
    assert got["n_items"].tolist() == [3]


def test_large_order_customers_mini_matches_oracle(ray_session, tmp_path):
    import __ray_entry__ as entrymod
    from language_identification_ray.pipelines.relational import large_order_customers

    d = _mini_tpch(tmp_path)
    got = _canon(large_order_customers(d, min_qty=300.0).to_pandas())
    con = _oracle_con(d)
    want = _canon(con.sql(entrymod.oracle_sql()["large_order_customers"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # order 1: qty 200+150+40? no — R+N both count in Q18: 200+150+1=351
    # (order 1's items), passes >300; order 3 dangles; NULL orderkey drops
    assert got["orderkey"].tolist() == [1]
    assert got["total_qty"].tolist() == [351]


def test_promo_revenue_mini_matches_oracle(ray_session, tmp_path):
    import __ray_entry__ as entrymod
    from language_identification_ray.pipelines.relational import promo_revenue

    d = _mini_tpch(tmp_path)
    got = promo_revenue(d).to_pandas()
    con = _oracle_con(d)
    want = con.sql(entrymod.oracle_sql()["promo_revenue"]).df()
    for c in ["promo_revenue", "total_revenue", "promo_pct"]:
        assert got[c].iloc[0] == pytest.approx(want[c].iloc[0]), c
    # NULL-partkey line drops (dangling); part 10 is PROMO, part 11 is not
    assert got["promo_pct"].iloc[0] < 100.0


def test_customer_order_histogram_mini_matches_oracle(ray_session, tmp_path):
    import __ray_entry__ as entrymod
    from language_identification_ray.pipelines.relational import (
        customer_order_histogram,
    )

    d = _mini_tpch(tmp_path)
    got = _canon(customer_order_histogram(d).to_pandas())
    con = _oracle_con(d)
    want = _canon(con.sql(entrymod.oracle_sql()["customer_order_histogram"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # cust 7 placed orders 1 and 4 (Q13 has no date window); cust 9 placed
    # none but the LEFT JOIN keeps it at c_count=0; order 2's dangling
    # custkey 8 and order 5's NULL custkey are invisible from the customer
    # side
    assert sorted(zip(got["c_count"], got["custdist"])) == [(0, 1), (2, 1)]


def test_customer_order_histogram_survives_empty_tables(ray_session, tmp_path):
    from language_identification_ray.pipelines.relational import (
        customer_order_histogram,
    )

    d = _mini_tpch(tmp_path, empty=True)
    assert customer_order_histogram(d).to_pandas().shape[0] == 0


def test_q10_q14_q18_survive_empty_tables(ray_session, tmp_path):
    from language_identification_ray.pipelines.relational import (
        large_order_customers,
        promo_revenue,
        returned_item_revenue,
    )

    d = _mini_tpch(tmp_path, empty=True)
    assert returned_item_revenue(d).to_pandas().shape[0] == 0
    assert large_order_customers(d).to_pandas().shape[0] == 0
    pr = promo_revenue(d).to_pandas()
    assert pr.shape[0] == 1 and pd.isna(pr["promo_pct"].iloc[0])


def test_promo_revenue_empty_window_nonempty_part(ray_session, tmp_path):
    """An empty ship-date window with a NON-empty part table must finalize
    to SQL's NULL/NULL/NULL, not 0.0 — part-only union rows carry rev 0 and
    must not count as joined rows (ADVICE r3: n_rows needs n_li > 0)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from language_identification_ray.pipelines.relational import promo_revenue

    d = tmp_path / "tpch_window"
    d.mkdir()
    # every shipdate outside March 1996
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 2], pa.int64()),
                "l_partkey": pa.array([10, 11], pa.int64()),
                "l_quantity": pa.array([1.0, 2.0], pa.float64()),
                "l_extendedprice": pa.array([10.0, 20.0], pa.float64()),
                "l_discount": pa.array([0.0, 0.1], pa.float64()),
                "l_returnflag": pa.array(["R", "N"], pa.string()),
                "l_shipdate": pa.array(
                    [datetime.datetime(1995, 1, 1)] * 2, pa.timestamp("us")
                ),
            }
        ),
        d / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([10, 11], pa.int64()),
                "p_type": pa.array(["PROMO", "MEDIUM"], pa.string()),
            }
        ),
        d / "part.parquet",
    )
    pr = promo_revenue(str(d)).to_pandas()
    assert pr.shape[0] == 1
    assert pd.isna(pr["promo_revenue"].iloc[0])
    assert pd.isna(pr["total_revenue"].iloc[0])
    assert pd.isna(pr["promo_pct"].iloc[0])


def test_returned_item_revenue_plan_parity(ray_session, sf_dir):
    """The sidecar and bucket physical plans must agree row-for-row on the
    driver fixture (the orders_by_mktsegment two-plan contract)."""
    from language_identification_ray.pipelines.relational import returned_item_revenue

    a = returned_item_revenue(sf_dir).to_pandas().reset_index(drop=True)
    b = (
        returned_item_revenue(sf_dir, force_buckets=True)
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def _bracket_tables(d, lineitem_rows, part_rows):
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([r[0] for r in lineitem_rows], pa.int64()),
                "l_quantity": pa.array([r[1] for r in lineitem_rows], pa.float64()),
                "l_extendedprice": pa.array([r[2] for r in lineitem_rows], pa.float64()),
                "l_discount": pa.array([r[3] for r in lineitem_rows], pa.float64()),
            }
        ),
        d / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in part_rows], pa.int64()),
                "p_brand": pa.array([r[1] for r in part_rows], pa.string()),
                "p_type": pa.array([r[2] for r in part_rows], pa.string()),
                "p_size": pa.array([r[3] for r in part_rows], pa.int64()),
            }
        ),
        d / "part.parquet",
    )
    return str(d)


def test_brand_bracket_revenue_or_counted_once(ray_session, tmp_path):
    from language_identification_ray.pipelines.relational import brand_bracket_revenue

    # part 1: Brand#13 size 10 AND PROMO size<=35 -> brackets 1 and 3 both
    # open; a qty-10 line matches bracket 1 only, a qty-25 line matches
    # bracket 3 only; part 2: Brand#19 size 20 -> bracket 2; part 3
    # matches nothing; NULL partkey and dangling partkey 99 drop
    d = _bracket_tables(
        tmp_path / "brk",
        [
            (1, 10.0, 100.0, 0.0),   # bracket 1 via part 1 -> 100.00
            (1, 25.0, 50.0, 0.0),    # bracket 3 via part 1 -> 50.00
            (1, 10.5, 10.0, 0.0),    # qty 10.5: brackets 1 AND 2 bands, part
                                     # mask has 1 and 3 -> counted ONCE -> 10.00
            (2, 15.0, 30.0, 0.5),    # bracket 2 via part 2 -> 15.00
            (2, 35.0, 1000.0, 0.0),  # qty 35: no band
            (3, 10.0, 1000.0, 0.0),  # part 3: mask 0
            (99, 10.0, 1000.0, 0.0), # dangling partkey
            (None, 10.0, 1000.0, 0.0),
        ],
        [
            (1, "Brand#13", "PROMO", 10),
            (2, "Brand#19", "ECONOMY", 20),
            (3, "Brand#5", "ECONOMY", 60),
        ],
    )
    out = brand_bracket_revenue(d)  # returns a pandas frame
    assert int(out["n_items"].iloc[0]) == 4
    assert out["revenue"].iloc[0] == pytest.approx(175.0)

    # all-miss input: SQL SUM over zero rows is NULL, count 0
    e = _bracket_tables(
        tmp_path / "brk_empty",
        [(1, 99.0, 5.0, 0.0)],
        [(1, "Brand#5", "ECONOMY", 60)],
    )
    out0 = brand_bracket_revenue(e)
    assert int(out0["n_items"].iloc[0]) == 0 and pd.isna(out0["revenue"].iloc[0])
