"""Round-4 session-7 kernels: hand-built value pins plus the never-raise
hardening contract for returnflag_priority_counts (Q12 shape, both physical
plans), lang_source_rollup (grouping sets + SQL SUM-NULL semantics),
edit2_word_pairs (SymSpell deletion-blocking completeness), inverted_index
blocks, event_volume_trend (grouped regression edge cases) and
top_bigram_per_lang (grouped argmax tie-breaks).  Oracle parity at sf runs
in test_queries_oracle.py; these pin the small-case semantics the driver
fixtures can't isolate (NULL keys/dates, dangling orderkeys, degenerate
regressions, tie-breaks)."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from language_identification_ray.pipelines import analysis, relational


def _w(d, name, cols):
    pq.write_table(pa.table(cols), d / f"{name}.parquet")


TS = pa.timestamp("us")


def _d(day):
    return datetime.datetime(1996, 6, 1) + datetime.timedelta(days=day)


# ---------------------------------------------------------------------------
# returnflag_priority_counts (Q12 shape)


def _q12_tables(d):
    """Orders: 1 high, 2 low, 3 NULL priority (counts as low), 4 high but
    never referenced in-window.  Lineitems: in-window rows for orders 1-3,
    one out-of-window row, one NULL-shipdate row, one dangling orderkey,
    one NULL returnflag row (its own group).  NULL orderkeys on BOTH sides
    must drop (inner-join NULL semantics) rather than meet at an int-cast
    sentinel."""
    _w(d, "orders", {
        "o_orderkey": pa.array([1, 2, 3, 4, None], pa.int64()),
        "o_orderpriority": pa.array(
            ["1-URGENT", "5-LOW", None, "2-HIGH", "1-URGENT"], pa.string()),
    })
    _w(d, "lineitem", {
        "l_orderkey": pa.array([1, 1, 2, 3, 4, 1, 99, 2, None], pa.int64()),
        "l_returnflag": pa.array(
            ["A", "B", "A", "A", "A", "A", "A", None, "A"], pa.string()),
        "l_shipdate": pa.array(
            [_d(0), _d(1), _d(2), _d(3),
             datetime.datetime(1897, 1, 1),  # out of window
             None,                            # NULL shipdate: excluded
             _d(4),                           # dangling orderkey: dropped
             _d(5),                           # NULL flag, low order 2
             _d(6)],                          # NULL orderkey: dropped
            TS,
        ),
    })
    return str(d)


def _rfp_rows(sf):
    out = {}
    for r in relational.returnflag_priority_counts(sf).take_all():
        out[r["l_returnflag"]] = (r["high_count"], r["low_count"])
    return out


def test_returnflag_priority_counts_semantics(ray_session, tmp_path):
    sf = _q12_tables(tmp_path)
    # A: order1 high (1), order2 low (1), order3 NULL-prio -> low (1)
    # B: order1 high (1)
    # NULL flag: order2 low (1)
    assert _rfp_rows(sf) == {"A": (1, 2), "B": (1, 0), None: (0, 1)}


def test_returnflag_priority_counts_plan_parity(ray_session, tmp_path, monkeypatch):
    sf = _q12_tables(tmp_path)
    want = _rfp_rows(sf)
    monkeypatch.setattr(relational, "_BROADCAST_MAX_BYTES", 0)
    assert _rfp_rows(sf) == want


def test_returnflag_priority_counts_empty_sides(ray_session, tmp_path, monkeypatch):
    _w(tmp_path, "orders", {
        "o_orderkey": pa.array([], pa.int64()),
        "o_orderpriority": pa.array([], pa.string()),
    })
    _w(tmp_path, "lineitem", {
        "l_orderkey": pa.array([1], pa.int64()),
        "l_returnflag": pa.array(["A"], pa.string()),
        "l_shipdate": pa.array([_d(0)], TS),
    })
    assert relational.returnflag_priority_counts(str(tmp_path)).take_all() == []
    monkeypatch.setattr(relational, "_BROADCAST_MAX_BYTES", 0)
    assert relational.returnflag_priority_counts(str(tmp_path)).take_all() == []


# ---------------------------------------------------------------------------
# lang_source_rollup


def test_lang_source_rollup_levels_and_null_sums(ray_session, tmp_path):
    _w(tmp_path, "documents", {
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a", "b", "c", "d"], pa.string()),
        "lang": pa.array(["en", "en", None, "de"], pa.string()),
        "source": pa.array(["s1", "s2", "s1", None], pa.string()),
        "n_chars": pa.array([10, 20, None, None], pa.int64()),
    })
    rows = {
        (r["lang"], r["source"], r["g_lang"], r["g_source"]):
            (r["n_docs"], r["total_chars"])
        for r in analysis.lang_source_rollup(str(tmp_path)).take_all()
    }
    # finest level: real NULL keys distinct from rollup NULLs via g ids
    assert rows[("en", "s1", 0, 0)] == (1, 10)
    assert rows[("en", "s2", 0, 0)] == (1, 20)
    assert rows[(None, "s1", 0, 0)] == (1, None)   # all-NULL chars -> NULL sum
    assert rows[("de", None, 0, 0)] == (1, None)
    # lang subtotals
    assert rows[("en", None, 0, 1)] == (2, 30)
    assert rows[(None, None, 0, 1)] == (1, None)   # real NULL lang subtotal
    assert rows[("de", None, 0, 1)] == (1, None)
    # grand total: NULL chars ignored like SQL sum
    assert rows[(None, None, 1, 1)] == (4, 30)
    assert len(rows) == 4 + 3 + 1


def test_lang_source_rollup_empty(ray_session, tmp_path):
    _w(tmp_path, "documents", {
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64()),
    })
    # SQL ROLLUP over an empty table still emits the grand-total grouping
    # set: one (NULL, NULL) row with COUNT(*)=0 and a NULL sum.
    rows = analysis.lang_source_rollup(str(tmp_path)).take_all()
    assert [
        (r["lang"], r["source"], r["g_lang"], r["g_source"],
         r["n_docs"], r["total_chars"])
        for r in rows
    ] == [(None, None, 1, 1, 0, None)]


# ---------------------------------------------------------------------------
# edit2_word_pairs


def test_edit2_word_pairs_blocking_is_complete(ray_session, tmp_path):
    # cat~bat (sub, 1), cat~cart (ins, 1), cat~carts (2), bat~cart (2 via
    # sub+ins), frog isolated; NULL text contributes '' which pairs with
    # nothing <= 2 away except short words ('' ~ 'at' etc. absent here)
    _w(tmp_path, "documents", {
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["cat bat frog", "cart carts", None], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([12, 10, 0], pa.int64()),
    })
    got = {
        (r["w1"], r["w2"]): r["dist"]
        for r in analysis.edit2_word_pairs(str(tmp_path)).take_all()
    }
    # hand-computed: bat~carts = 3 (excluded), frog isolated, '' (from the
    # NULL text) is >= 3 from every word; pairs ordered w1 < w2
    assert got == {
        ("bat", "cat"): 1,
        ("cart", "cat"): 1,
        ("carts", "cat"): 2,
        ("bat", "cart"): 2,
        ("cart", "carts"): 1,
    }


def test_edit2_word_pairs_max_len_cap(ray_session, tmp_path):
    long_w = "x" * 40
    _w(tmp_path, "documents", {
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array([f"{long_w} {long_w}y"], pa.string()),
        "lang": pa.array(["en"], pa.string()),
        "source": pa.array(["s"], pa.string()),
        "n_chars": pa.array([81], pa.int64()),
    })
    assert analysis.edit2_word_pairs(str(tmp_path)).take_all() == []


# ---------------------------------------------------------------------------
# inverted_index_blocks


def test_inverted_index_blocks(ray_session, tmp_path):
    _w(tmp_path, "documents", {
        "doc_id": pa.array([0, 99, 100, 205, None], pa.int64()),
        "text": pa.array(["w w q", "w", "w", "q", "w"], pa.string()),
        "lang": pa.array(["en"] * 5, pa.string()),
        "source": pa.array(["s"] * 5, pa.string()),
        "n_chars": pa.array([5, 1, 1, 1, 1], pa.int64()),
    })
    rows = {
        (r["word"], r["block"]): (r["df"], r["postings"])
        for r in analysis.inverted_index_blocks(str(tmp_path)).take_all()
    }
    # NULL doc_id row excluded entirely; duplicates within a doc collapse
    assert rows == {
        ("w", 0): (2, "0,99"),
        ("w", 1): (1, "100"),
        ("q", 0): (1, "0"),
        ("q", 2): (1, "205"),
    }


# ---------------------------------------------------------------------------
# event_volume_trend


def _events(d, rows):
    ts, typ = zip(*rows) if rows else ((), ())
    _w(d, "events", {
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array(list(ts), TS),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array(list(typ), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })


def test_event_volume_trend_edges(ray_session, tmp_path):
    d0 = datetime.datetime(2024, 1, 1)

    def day(n, h=0):
        return d0 + datetime.timedelta(days=n, hours=h)

    _events(tmp_path, [
        # 'up': counts 1,2,3 on days 0,1,2 -> slope exactly 1
        (day(0), "up"), (day(1), "up"), (day(1, 1), "up"),
        (day(2), "up"), (day(2, 1), "up"), (day(2, 2), "up"),
        # 'one': a single day -> zero variance -> NULL slope, n_days 1
        (day(5), "one"), (day(5, 3), "one"),
        # 'ghost': only NULL timestamps -> n_days 0, NULL slope
        (None, "ghost"),
        # NULL type keeps its own group
        (day(0), None), (day(1), None), (day(1, 2), None),
    ])
    rows = {
        r["event_type"]: (r["n_days"], r["slope"])
        for r in analysis.event_volume_trend(str(tmp_path)).take_all()
    }
    assert rows["up"] == (3, 1.0)
    assert rows["one"] == (1, None)
    assert rows["ghost"] == (0, None)
    assert rows[None] == (2, 1.0)  # counts 1,2 on days 0,1


# ---------------------------------------------------------------------------
# top_bigram_per_lang


def test_top_bigram_per_lang_ties_and_nulls(ray_session, tmp_path):
    _w(tmp_path, "documents", {
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        # en: 'b c' x2 beats 'a b' x1; tie 'z z' vs 'a a' (1 each) in de
        # resolves bigram-ASC -> 'a a'; NULL lang has its own winner; a
        # single-word doc contributes no bigram (fr absent from output)
        "text": pa.array(["a b c b c", "z z a a", "q q", "solo"], pa.string()),
        "lang": pa.array(["en", "de", None, "fr"], pa.string()),
        "source": pa.array(["s"] * 4, pa.string()),
        "n_chars": pa.array([9, 7, 3, 4], pa.int64()),
    })
    rows = {
        r["lang"]: (r["bigram"], r["cnt"])
        for r in analysis.top_bigram_per_lang(str(tmp_path)).take_all()
    }
    assert rows == {
        "en": ("b c", 2),
        "de": ("a a", 1),
        None: ("q q", 1),
    }


# ---------------------------------------------------------------------------
# events_collapse_consecutive


def test_events_collapse_consecutive_runs_and_nulls(ray_session, tmp_path):
    d0 = datetime.datetime(2024, 1, 1)

    def t(m):
        return d0 + datetime.timedelta(minutes=m)

    _events(tmp_path, [
        # user 1: A A A B B A -> A B A (runs collapse, reappearance kept)
        (t(0), "A"), (t(1), "A"), (t(2), "A"),
        (t(3), "B"), (t(4), "B"), (t(5), "A"),
        # NULL-type run collapses too (IS DISTINCT FROM semantics)
        (t(6), None), (t(7), None), (t(8), "A"),
    ])
    df = analysis.events_collapse_consecutive(str(tmp_path)).to_pandas()
    df = df.sort_values("event_id")
    assert list(df["event_type"].fillna("~")) == ["A", "B", "A", "~", "A"]


def test_events_collapse_consecutive_null_ts_sorts_last(ray_session, tmp_path):
    d0 = datetime.datetime(2024, 1, 1)
    # NULL-ts row sorts last: run is B(ts0) B(NULL) -> second drops
    _events(tmp_path, [(d0, "B"), (None, "B")])
    df = analysis.events_collapse_consecutive(str(tmp_path)).to_pandas()
    assert len(df) == 1 and df.iloc[0]["event_type"] == "B"


def test_events_collapse_consecutive_null_user_partition(ray_session, tmp_path):
    d0 = datetime.datetime(2024, 1, 1)
    _w(tmp_path, "events", {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([d0, d0 + datetime.timedelta(minutes=1),
                        d0 + datetime.timedelta(minutes=2)], TS),
        "user_id": pa.array([None, None, 7], pa.int64()),
        "event_type": pa.array(["A", "A", "A"], pa.string()),
        "value": pa.array([1.0] * 3, pa.float64()),
        "props": pa.array(["{}"] * 3, pa.string()),
    })
    df = analysis.events_collapse_consecutive(str(tmp_path)).to_pandas()
    # NULL users form ONE partition (SQL window semantics): their A-run
    # collapses to one row; user 7 keeps its own row
    assert len(df) == 2


# ---------------------------------------------------------------------------
# top_lengths_dense_per_source


def test_top_lengths_dense_ties_and_null_tier(ray_session, tmp_path):
    _w(tmp_path, "documents", {
        "doc_id": pa.array([0, 1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array(["x"] * 7, pa.string()),
        "lang": pa.array(["en"] * 7, pa.string()),
        # s1: lengths 30,30,20,10,5 -> ranks 1,1,2,3 (5 excluded)
        # s2: lengths 9, NULL -> NULL is rank 2 (fewer than 3 real tiers)
        "source": pa.array(["s1", "s1", "s1", "s1", "s1", "s2", "s2"], pa.string()),
        "n_chars": pa.array([30, 30, 20, 10, 5, 9, None], pa.int64()),
    })
    df = analysis.top_lengths_dense_per_source(str(tmp_path)).to_pandas()
    got = {
        (r.doc_id): (r.source, r.n_chars if r.n_chars == r.n_chars else None, r.length_rank)
        for r in df.itertuples(index=False)
    }
    assert got == {
        0: ("s1", 30, 1), 1: ("s1", 30, 1), 2: ("s1", 20, 2), 3: ("s1", 10, 3),
        5: ("s2", 9, 1), 6: ("s2", None, 2),
    }


def test_top_lengths_dense_empty(ray_session, tmp_path):
    _w(tmp_path, "documents", {
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64()),
    })
    assert analysis.top_lengths_dense_per_source(str(tmp_path)).take_all() == []


# ---------------------------------------------------------------------------
# score_percent_rank / lang_stats_incremental / segment_revenue_bloom


def test_score_percent_rank_single_row_partition_and_ties(ray_session, tmp_path):
    _w(tmp_path, "documents", {
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(["x"] * 5, pa.string()),
        "lang": pa.array(["en"] * 5, pa.string()),
        # s1: 10,10,20 -> pct 0,0,1; s2 single row -> 0; NULL length in s1
        # sorts LAST
        "source": pa.array(["s1", "s1", "s1", "s2", "s1"], pa.string()),
        "n_chars": pa.array([10, 10, 20, 7, None], pa.int64()),
    })
    df = analysis.score_percent_rank(str(tmp_path)).to_pandas()
    got = {r.doc_id: round(r.pct_rank, 6) for r in df.itertuples(index=False)}
    # s1 has 4 rows: ranks 10,10 -> 1; 20 -> 3; NULL -> 4; pct = (r-1)/3
    assert got == {0: 0.0, 1: 0.0, 2: round(2 / 3, 6), 3: 0.0, 4: 1.0}


def test_segment_revenue_bloom_actually_prunes(ray_session, tmp_path):
    """The bloom must cut non-segment orders map-side: with disjoint key
    ranges and a real filter, the surviving partial rows are far fewer than
    the orders table (checked through the kernel's own bloom primitives)."""
    import numpy as np
    from language_identification_ray.functions import sketches as sk

    keys = np.arange(1000, dtype=np.int64)
    seg = keys[:50]
    bits = sk.bloom_empty(1 << 17)
    sk.bloom_add_hashes(bits, seg.astype(np.uint32))
    maybe = sk.bloom_contains_hashes(bits, keys.astype(np.uint32))
    assert maybe[:50].all()                       # no false negatives
    assert maybe[50:].sum() < 50                  # prunes the bulk


def test_segment_revenue_bloom_null_semantics(ray_session, tmp_path):
    _w(tmp_path, "customer", {
        "c_custkey": pa.array([1, 2, None], pa.int64()),
        "c_mktsegment": pa.array(["BUILDING", "AUTO", "BUILDING"], pa.string()),
    })
    _w(tmp_path, "orders", {
        # order 10: cust 1 (in segment, priced); 11: cust 1 NULL price
        # (counts, adds nothing); 12: cust 2 (out); 13: NULL cust (drops)
        "o_orderkey": pa.array([10, 11, 12, 13], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, None], pa.int64()),
        "o_totalprice": pa.array([100.25, None, 7.0, 5.0], pa.float64()),
    })
    rows = relational.segment_revenue_bloom(str(tmp_path)).take_all()
    assert rows == [{"n_orders": 2, "revenue_cents": 10025}]


def test_segment_revenue_bloom_all_null_prices(ray_session, tmp_path):
    _w(tmp_path, "customer", {
        "c_custkey": pa.array([1], pa.int64()),
        "c_mktsegment": pa.array(["BUILDING"], pa.string()),
    })
    _w(tmp_path, "orders", {
        "o_orderkey": pa.array([10], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
        "o_totalprice": pa.array([None], pa.float64()),
    })
    rows = relational.segment_revenue_bloom(str(tmp_path)).take_all()
    assert rows == [{"n_orders": 1, "revenue_cents": None}]


def test_lang_stats_incremental_matches_one_shot(ray_session, sf_dir):
    a = analysis.lang_stats(sf_dir).to_pandas().sort_values("lang").reset_index(drop=True)
    b = (
        analysis.lang_stats_incremental(sf_dir)
        .to_pandas().sort_values("lang").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False, atol=1e-9
    )


# ---------------------------------------------------------------------------
# monthly_revenue_growth


def test_monthly_revenue_growth_null_month_and_lag(ray_session, tmp_path):
    _w(tmp_path, "orders", {
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_orderdate": pa.array(
            [datetime.datetime(1996, 1, 5), datetime.datetime(1996, 1, 20),
             datetime.datetime(1996, 2, 1),   # all-NULL-price month
             datetime.datetime(1996, 3, 9), None], pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 20.0, None, 40.0, 99.0], pa.float64()),
    })
    rows = {
        r["month"]: (r["cents"], r["prev_cents"], r["delta_cents"])
        for r in relational.monthly_revenue_growth(str(tmp_path)).take_all()
    }
    assert rows == {
        "1996-01": (3000, None, None),       # first month: NULL lag
        "1996-02": (None, 3000, None),       # all-NULL prices: NULL sum
        "1996-03": (4000, None, None),       # lag of a NULL month is NULL
    }


def test_monthly_revenue_growth_empty(ray_session, tmp_path):
    _w(tmp_path, "orders", {
        "o_orderkey": pa.array([], pa.int64()),
        "o_orderdate": pa.array([], pa.timestamp("us")),
        "o_totalprice": pa.array([], pa.float64()),
    })
    assert relational.monthly_revenue_growth(str(tmp_path)).take_all() == []


# ---------------------------------------------------------------------------
# late-session kernels: hand value pins


def test_events_weekday_hour_heatmap_epoch_arith(ray_session, tmp_path):
    # 2024-01-01 is a Monday (isodow 1); NULL ts -> (NULL, NULL) group
    _events(tmp_path, [
        (datetime.datetime(2024, 1, 1, 0, 30), "a"),   # Mon, hour 0
        (datetime.datetime(2024, 1, 1, 23, 59), "a"),  # Mon, hour 23
        (datetime.datetime(2024, 1, 7, 12, 0), "a"),   # Sun (isodow 7)
        (None, "a"),
    ])
    rows = {
        (r["dow"], r["hour"]): r["cnt"]
        for r in analysis.events_weekday_hour_heatmap(str(tmp_path)).take_all()
    }
    assert rows == {(1, 0): 1, (1, 23): 1, (7, 12): 1, (None, None): 1}


def test_user_event_type_pivot_other_and_null(ray_session, tmp_path):
    _w(tmp_path, "events", {
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([datetime.datetime(2024, 1, 1)] * 5, TS),
        "user_id": pa.array([7, 7, 7, None, 7], pa.int64()),
        "event_type": pa.array(["view", "click", "weird", "purchase", None], pa.string()),
        "value": pa.array([1.0] * 5, pa.float64()),
        "props": pa.array(["{}"] * 5, pa.string()),
    })
    rows = {
        r["user_id"]: (r["view_cnt"], r["click_cnt"], r["purchase_cnt"], r["total_cnt"])
        for r in analysis.user_event_type_pivot(str(tmp_path)).take_all()
    }
    # 'weird' and NULL types count only in total; NULL user is its own row
    assert rows == {7: (1, 1, 0, 4), None: (0, 0, 1, 1)}


def test_chars_tokens_corr_perfect_and_degenerate(ray_session, tmp_path):
    # n_chars == 10 * tokens -> corr exactly 1.0
    _w(tmp_path, "documents", {
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a", "a b", "a b c"], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([10, 20, 30], pa.int64()),
    })
    rows = analysis.chars_tokens_corr(str(tmp_path)).take_all()
    assert rows == [{"n_rows": 3, "corr": 1.0}]
    # constant n_chars -> zero variance -> NULL corr
    _w(tmp_path, "documents", {
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a", "a b"], pa.string()),
        "lang": pa.array(["en"] * 2, pa.string()),
        "source": pa.array(["s"] * 2, pa.string()),
        "n_chars": pa.array([5, 5], pa.int64()),
    })
    rows = analysis.chars_tokens_corr(str(tmp_path)).take_all()
    assert rows == [{"n_rows": 2, "corr": None}]


def test_value_mad_outliers_zero_mad_and_nulls(ray_session, tmp_path):
    _w(tmp_path, "events", {
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": pa.array([datetime.datetime(2024, 1, 1)] * 6, TS),
        "user_id": pa.array([1] * 6, pa.int64()),
        # type 'a': values 5,5,5,500 -> med 5, mad 0 -> only 500 flags
        # (|500-5| > 6*0); NULL value never flags; type with one value: mad 0
        "event_type": pa.array(["a", "a", "a", "a", "a", "b"], pa.string()),
        "value": pa.array([5.0, 5.0, 5.0, 500.0, None, 9.0], pa.float64()),
        "props": pa.array(["{}"] * 6, pa.string()),
    })
    rows = {r["event_id"]: (r["med"], r["mad"]) for r in
            analysis.value_mad_outliers(str(tmp_path)).take_all()}
    assert rows == {4: (5.0, 0.0)}


def test_part_cube_stats_levels(ray_session, tmp_path):
    _w(tmp_path, "part", {
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_name": pa.array(["x", "y", "z"], pa.string()),
        "p_brand": pa.array(["B1", "B1", "B2"], pa.string()),
        "p_type": pa.array(["t"] * 3, pa.string()),
        "p_size": pa.array([5, 15, None], pa.int32()),
        "p_retailprice": pa.array([1.0, 2.0, None], pa.float64()),
    })
    rows = {
        (r["p_brand"], r["size_band"], r["g_brand"], r["g_band"]):
            (r["n_parts"], r["retail_cents"])
        for r in analysis.part_cube_stats(str(tmp_path)).take_all()
    }
    # finest: (B1,0) (B1,1) (B2,NULL size -> NULL band, all-NULL price)
    assert rows[("B1", 0, 0, 0)] == (1, 100)
    assert rows[("B1", 1, 0, 0)] == (1, 200)
    assert rows[("B2", None, 0, 0)] == (1, None)
    # brand level
    assert rows[("B1", None, 0, 1)] == (2, 300)
    assert rows[("B2", None, 0, 1)] == (1, None)
    # band level (g_brand=1)
    assert rows[(None, 0, 1, 0)] == (1, 100)
    assert rows[(None, 1, 1, 0)] == (1, 200)
    assert rows[(None, None, 1, 0)] == (1, None)
    # grand total
    assert rows[(None, None, 1, 1)] == (3, 300)
    assert len(rows) == 3 + 2 + 3 + 1


def test_part_cube_stats_empty(ray_session, tmp_path):
    # SQL CUBE over an empty table still emits the () grouping-set row.
    _w(tmp_path, "part", {
        "p_partkey": pa.array([], pa.int64()),
        "p_name": pa.array([], pa.string()),
        "p_brand": pa.array([], pa.string()),
        "p_type": pa.array([], pa.string()),
        "p_size": pa.array([], pa.int32()),
        "p_retailprice": pa.array([], pa.float64()),
    })
    rows = analysis.part_cube_stats(str(tmp_path)).take_all()
    assert [
        (r["p_brand"], r["size_band"], r["g_brand"], r["g_band"],
         r["n_parts"], r["retail_cents"])
        for r in rows
    ] == [(None, None, 1, 1, 0, None)]


def test_langs_in_every_source_division(ray_session, tmp_path):
    _w(tmp_path, "documents", {
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["x"] * 6, pa.string()),
        # en in s1+s2 (divides); de only s1; NULL lang in s1+s2 (divides);
        # a NULL-source row never counts toward the divisor
        "lang": pa.array(["en", "en", "de", None, None, "fr"], pa.string()),
        "source": pa.array(["s1", "s2", "s1", "s1", "s2", None], pa.string()),
        "n_chars": pa.array([1] * 6, pa.int64()),
    })
    rows = {r["lang"]: r["n_sources"] for r in
            analysis.langs_in_every_source(str(tmp_path)).take_all()}
    assert rows == {"en": 2, None: 2}


def test_daily_top_spenders_ties_and_nulls(ray_session, tmp_path):
    d0 = datetime.datetime(2024, 1, 1)
    _w(tmp_path, "events", {
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "ts": pa.array([d0, d0, d0, d0, d0, None, d0], TS),
        "user_id": pa.array([1, 2, 3, 4, 2, 9, None], pa.int64()),
        # day totals: u2=5.0 (two events), u1=2.0, u3=2.0 (tie -> user asc),
        # u4=0.5 (cut at k=3); NULL-ts day has u9; NULL user has NULL value
        # -> NULL sum, ranks last but still inside k on its day
        "event_type": pa.array(["a"] * 7, pa.string()),
        "value": pa.array([2.0, 3.0, 2.0, 0.5, 2.0, 1.0, None], pa.float64()),
        "props": pa.array(["{}"] * 7, pa.string()),
    })
    rows = [
        (r["day"] is None, r["user_id"], r["cents"], r["rank"])
        for r in sorted(
            analysis.daily_top_spenders(str(tmp_path)).take_all(),
            key=lambda r: (r["day"] is None, r["rank"]),
        )
    ]
    assert rows == [
        (False, 2, 500, 1),
        (False, 1, 200, 2),
        (False, 3, 200, 3),
        (True, 9, 100, 1),
    ]


# ---------------------------------------------------------------------------
# min_cost_suppliers (Q2 correlated-min shape) / dominant_share_suppliers
# (Q20 nested-semi-join shape)


def test_min_cost_suppliers_ties_and_nulls(ray_session, tmp_path):
    _w(tmp_path, "supplier", {
        "s_suppkey": pa.array([10, 11, 12], pa.int64()),
        "s_name": pa.array(["S10", "S11", "S12"], pa.string()),
        "s_nationkey": pa.array([0, 0, 0], pa.int32()),
        "s_acctbal": pa.array([0.0, 0.0, 0.0], pa.float64()),
    })
    _w(tmp_path, "lineitem", {
        # part 1: suppliers 10 and 11 tie at the min (5.00), 12 higher;
        # part 2: single supplier 10; NULL partkey / suppkey / price rows
        # drop; supplier 99 is dangling (no supplier row -> inner join drop)
        "l_partkey": pa.array([1, 1, 1, 1, 2, None, 3, 3, 4], pa.int64()),
        "l_suppkey": pa.array([10, 11, 12, 10, 10, 10, None, 99, 10], pa.int64()),
        "l_extendedprice": pa.array(
            [5.0, 5.0, 7.0, 9.0, 3.0, 1.0, 1.0, 2.0, None], pa.float64()),
        "l_quantity": pa.array([1.0] * 9, pa.float64()),
    })
    rows = [
        (r["partkey"], r["suppkey"], r["supplier_name"], r["min_price"])
        for r in relational.min_cost_suppliers(str(tmp_path)).take_all()
    ]
    # sort: min_price DESC, partkey, suppkey
    assert rows == [
        (1, 10, "S10", 5.0),
        (1, 11, "S11", 5.0),
        (2, 10, "S10", 3.0),
    ]


def test_dominant_share_suppliers_boundary(ray_session, tmp_path):
    _w(tmp_path, "supplier", {
        "s_suppkey": pa.array([10, 11], pa.int64()),
        "s_name": pa.array(["S10", "S11"], pa.string()),
        "s_nationkey": pa.array([0, 0], pa.int32()),
        "s_acctbal": pa.array([0.0, 0.0], pa.float64()),
    })
    _w(tmp_path, "lineitem", {
        # part 1 total=8: supp 10 qty=1 (8*1 == 8, NOT > -> excluded),
        #                 supp 11 qty=7 (dominates)
        # part 2 total=15: supp 10 qty=2 (8*2=16 > 15 -> dominates),
        #                  supp 11 qty=13 (dominates)
        "l_partkey": pa.array([1, 1, 2, 2, 2], pa.int64()),
        "l_suppkey": pa.array([10, 11, 10, 11, 11], pa.int64()),
        "l_extendedprice": pa.array([1.0] * 5, pa.float64()),
        "l_quantity": pa.array([1.0, 7.0, 2.0, 6.0, 7.0], pa.float64()),
    })
    rows = [
        (r["suppkey"], r["supplier_name"], r["n_dominated_parts"])
        for r in relational.dominant_share_suppliers(str(tmp_path)).take_all()
    ]
    # sort: n_dominated_parts DESC, suppkey ASC
    assert rows == [(11, "S11", 2), (10, "S10", 1)]


# ---------------------------------------------------------------------------
# events_hopping_window_watermark (bounded out-of-orderness)


def test_watermark_drops_late_arrivals(ray_session, tmp_path):
    """Arrival order = event_id; watermark = running max(ts); an event
    older than watermark - lateness drops, a within-allowance straggler
    survives, NULL id / NULL ts rows are excluded."""
    base = datetime.datetime(1996, 6, 1, 12, 0, 0)

    def m(minutes):
        return base + datetime.timedelta(minutes=minutes)

    _w(tmp_path, "events", {
        # arrival:   1      2      3        4        5      6     null-id
        "event_id": pa.array([1, 2, 3, 4, 5, 6, None], pa.int64()),
        "ts": pa.array(
            [m(0),           # wm after: 0
             m(120),         # jumps ahead; wm: 120
             m(100),         # 20 min late < 30 allowance -> KEPT
             m(60),          # 60 min late -> DROPPED
             None,           # NULL ts -> excluded
             m(121),         # in order -> kept
             m(300)],        # NULL event_id -> excluded
            TS),
        "user_id": pa.array([1] * 7, pa.int64()),
        "event_type": pa.array(["a"] * 7, pa.string()),
        "value": pa.array([1.0] * 7, pa.float64()),
        "props": pa.array([""] * 7, pa.string()),
    })
    out = analysis.events_hopping_window_watermark(
        str(tmp_path), lateness_min=30).take_all()
    total = sum(r["n_events"] for r in out)
    # kept events: ids 1 (12:00), 2 (14:00), 3 (13:40), 6 (14:01) -> 4
    # hop windows each
    assert total == 4 * 4
    starts = {r["window_start"] for r in out}
    # the dropped 13:00 event's EXCLUSIVE windows (12:30, 12:15 — its
    # 13:00/12:45 windows are also covered by the kept 13:40 event) are
    # absent; the shared ones are present
    assert m(30) not in starts and m(15) not in starts
    assert m(60) in starts and m(45) in starts
    # and the plain (no-watermark) window DOES contain the late event's
    # exclusive windows — the two kernels genuinely differ on this input
    plain_starts = {r["window_start"]
                    for r in analysis.events_hopping_window(str(tmp_path)).take_all()}
    assert m(30) in plain_starts and m(15) in plain_starts


# ---------------------------------------------------------------------------
# bpe_train (iterative merge-table trainer)


def test_bpe_train_hand_checked_merges(ray_session, tmp_path):
    """Classic Sennrich-style fixture: 'aaab' x5 and 'aab' x3.
    Char pairs (overlap counted): (a,a): 5*2 + 3 = 13; (a,b): 5+3 = 8.
    merge0 = a+a -> 'aa' (13).  After: aaab -> [aa, a, b]; aab -> [aa, b].
    Then (aa,b): 3, (aa,a): 5, (a,b): 5 -> tie 5 breaks by left asc:
    ('a','b') < ('aa','a'), so merge1 = a+b 'ab'(5); then (aa,ab):5,
    (aa,b):3 -> merge2 = aa+ab 'aaab'(5); then (aa,b):3 -> merge3."""
    _w(tmp_path, "documents", {
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["aaab aaab aaab aaab aaab", "aab aab aab"], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
        "source": pa.array(["s", "s"], pa.string()),
        "n_chars": pa.array([24, 11], pa.int64()),
    })
    t = analysis.bpe_train(str(tmp_path), n_merges=4)
    got = list(zip(t["rank"].to_pylist(), t["left"].to_pylist(),
                   t["right"].to_pylist(), t["token"].to_pylist(),
                   t["cnt"].to_pylist()))
    assert got == [
        (0, "a", "a", "aa", 13),
        (1, "a", "b", "ab", 5),
        (2, "aa", "ab", "aaab", 5),
        (3, "aa", "b", "aab", 3),
    ]


def test_bpe_train_first_merge_matches_pair_counts(ray_session, sf_dir):
    top = analysis.bpe_pair_counts(sf_dir, k=1).take_all()[0]
    t = analysis.bpe_train(sf_dir, n_merges=1)
    assert t["token"][0].as_py() == top["pair"]
    assert t["cnt"][0].as_py() == top["cnt"]


def test_bpe_token_counts_hand_checked(ray_session, tmp_path):
    """After merges [aa(13), ab(5), aaab(5), aab(3)] (see the bpe_train
    fixture), encoding 'aaab' collapses best-rank-first to one token
    (aa|ab -> aaab) and 'aab' to one token (aa|b -> aab), so the en doc
    (5 words) totals 5 tokens and the de doc (3 words) 3; an empty doc
    with a NULL lang contributes (NULL, 0 tokens, 1 doc)."""
    _w(tmp_path, "documents", {
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["aaab aaab aaab aaab aaab", "aab aab aab", ""], pa.string()),
        "lang": pa.array(["en", "de", None], pa.string()),
        "source": pa.array(["s", "s", "s"], pa.string()),
        "n_chars": pa.array([24, 11, 0], pa.int64()),
    })
    rows = {r["lang"]: (r["n_tokens"], r["n_docs"])
            for r in analysis.bpe_token_counts(str(tmp_path), n_merges=4).take_all()}
    assert rows == {"en": (5, 1), "de": (3, 1), None: (0, 1)}


def test_watermark_survives_statless_footer(ray_session, tmp_path):
    """A parquet written without column statistics (or with ids far past
    the bucket count under the degenerate width fallback) must not index
    out of the prefix arrays — buckets clamp, the scan stays monotone."""
    base = datetime.datetime(1996, 6, 1, 12, 0, 0)
    ids = [5000, 6000, 7000]  # >> n_buckets under width=1 fallback
    tbl = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array([base + datetime.timedelta(minutes=m)
                        for m in (0, 120, 60)], TS),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_type": pa.array(["a"] * 3, pa.string()),
        "value": pa.array([1.0] * 3, pa.float64()),
        "props": pa.array([""] * 3, pa.string()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet", write_statistics=False)
    out = analysis.events_hopping_window_watermark(
        str(tmp_path), lateness_min=30).take_all()
    # arrival order 5000,6000,7000: ts 12:00 then 14:00 then 13:00 (60 min
    # late -> dropped); kept = 2 events x 4 windows
    assert sum(r["n_events"] for r in out) == 8
