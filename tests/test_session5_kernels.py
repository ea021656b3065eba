"""Round-4 session-5 kernels: hand-built value pins plus the engine-wide
never-raise hardening contract (empty / one-row / all-NULL / mixed-NULL
shapes) for the twelve new operators.  Oracle parity at sf runs in
test_queries_oracle.py; these tests pin small-case semantics the driver
fixtures can't reach (NULL money columns, empty windows, dangling keys)."""

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from language_identification_ray.pipelines import analysis, relational


def _w(d, name, cols):
    pq.write_table(pa.table(cols), d / f"{name}.parquet")


def _docs_table(d, rows):
    """rows: (doc_id, text, lang, source, n_chars)"""
    _w(
        d,
        "documents",
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        },
    )


def _emb_table(d, rows):
    _w(
        d,
        "embeddings",
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        },
    )


def _tpch(d, empty=False, nulls=False):
    t96 = datetime.datetime(1996, 2, 1)
    if empty:
        _w(d, "lineitem", {
            "l_suppkey": pa.array([], pa.int64()),
            "l_partkey": pa.array([], pa.int64()),
            "l_quantity": pa.array([], pa.float64()),
            "l_extendedprice": pa.array([], pa.float64()),
            "l_discount": pa.array([], pa.float64()),
            "l_shipdate": pa.array([], pa.timestamp("us"))})
        _w(d, "orders", {
            "o_custkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us"))})
        _w(d, "customer", {
            "c_custkey": pa.array([], pa.int64()),
            "c_nationkey": pa.array([], pa.int64()),
            "c_acctbal": pa.array([], pa.float64())})
        _w(d, "supplier", {
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string())})
        _w(d, "part", {
            "p_partkey": pa.array([], pa.int64()),
            "p_brand": pa.array([], pa.string()),
            "p_size": pa.array([], pa.int64())})
        return str(d)
    # supplier 1 earns 2x supplier 2 in-window; NULL price row must be
    # excluded from supplier 2's total exactly like SQL sum()
    _w(d, "lineitem", {
        "l_suppkey": pa.array([1, 1, 2, 2, 2], pa.int64()),
        "l_partkey": pa.array([10, 10, 10, 11, 10], pa.int64()),
        "l_quantity": pa.array([1.0, 9.0, 5.0, 3.0, 2.0], pa.float64()),
        "l_extendedprice": pa.array(
            [100.0, 100.0, 100.0, None if nulls else 50.0, 1.0], pa.float64()
        ),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0, 0.0], pa.float64()),
        "l_shipdate": pa.array([t96] * 5, pa.timestamp("us"))})
    _w(d, "orders", {
        "o_custkey": pa.array([7, None], pa.int64()),
        "o_orderdate": pa.array(
            [datetime.datetime(1999, 1, 1), t96], pa.timestamp("us"))})
    _w(d, "customer", {
        "c_custkey": pa.array([7, 8, 9], pa.int64()),
        "c_nationkey": pa.array([0, 0, 1], pa.int64()),
        "c_acctbal": pa.array(
            [100.0, 500.0, None if nulls else 400.0], pa.float64())})
    _w(d, "supplier", {
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["S1", "S2"], pa.string())})
    _w(d, "part", {
        "p_partkey": pa.array([10, 11], pa.int64()),
        "p_brand": pa.array(["Brand#23", "Brand#23"], pa.string()),
        "p_size": pa.array([5, 5], pa.int64())})
    return str(d)


def test_top_supplier_revenue_mini(ray_session, tmp_path):
    d = tmp_path / "q15"
    d.mkdir()
    _tpch(d)
    out = relational.top_supplier_revenue(str(d)).to_pandas()
    assert out.shape[0] == 1
    assert out["s_suppkey"].iloc[0] == 1 and out["s_name"].iloc[0] == "S1"
    assert out["total_revenue_cents"].iloc[0] == 20000


def test_top_supplier_revenue_null_price_excluded(ray_session, tmp_path):
    d = tmp_path / "q15n"
    d.mkdir()
    _tpch(d, nulls=True)
    out = relational.top_supplier_revenue(str(d)).to_pandas()
    # supplier 2's NULL row contributes nothing (SQL sum skips NULLs):
    # s2 = 100 + 1 = 101 < s1 = 200
    assert out["s_suppkey"].tolist() == [1]


def test_top_supplier_revenue_empty_window(ray_session, tmp_path):
    d = tmp_path / "q15e"
    d.mkdir()
    _tpch(d, empty=True)
    out = relational.top_supplier_revenue(str(d))
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert out.shape[0] == 0
    assert list(out.columns) == ["s_suppkey", "s_name", "total_revenue_cents"]


def test_small_quantity_revenue_mini(ray_session, tmp_path):
    d = tmp_path / "q17"
    d.mkdir()
    _tpch(d)
    out = relational.small_quantity_revenue(str(d))
    # part 10 qtys [1, 9, 5, 2]: avg 4.25, thr 0.85 -> none below except qty 1?
    # 1 < 0.85 is False; part 11 qty [3]: thr 0.6 -> none.  Recompute:
    # thr(10) = 0.2 * 17/4 = 0.85 -> no qty below.  So 0 rows.
    assert out["n_small"].iloc[0] == 0 and out["revenue_cents"].iloc[0] == 0


def test_small_quantity_revenue_catches_low_qty(ray_session, tmp_path):
    d = tmp_path / "q17b"
    d.mkdir()
    t96 = datetime.datetime(1996, 2, 1)
    _tpch(d)
    # overwrite lineitem: one part, avg qty 10, one 1-qty row qualifies
    _w(d, "lineitem", {
        "l_suppkey": pa.array([1, 1, 1], pa.int64()),
        "l_partkey": pa.array([10, 10, 10], pa.int64()),
        "l_quantity": pa.array([19.0, 10.0, 1.0], pa.float64()),
        "l_extendedprice": pa.array([5.0, 5.0, 7.5], pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
        "l_shipdate": pa.array([t96] * 3, pa.timestamp("us"))})
    out = relational.small_quantity_revenue(str(d))
    assert out["n_small"].iloc[0] == 1 and out["revenue_cents"].iloc[0] == 750


def test_idle_rich_customers_mini(ray_session, tmp_path):
    d = tmp_path / "q22"
    d.mkdir()
    _tpch(d)
    out = relational.idle_rich_customers(str(d)).to_pandas()
    # positive balances: 100, 500, 400 -> avg 1000/3; rich: 500 (cust 8),
    # 400 (cust 9); cust 7 has a recent order (1999) but is not rich anyway;
    # custs 8, 9 have no orders at all -> idle.  Nations: 0 -> {8}, 1 -> {9}.
    got = {r.c_nationkey: (r.n_cust, r.acctbal_cents) for r in out.itertuples()}
    assert got == {0: (1, 50000), 1: (1, 40000)}


def test_idle_rich_customers_null_balance_excluded(ray_session, tmp_path):
    d = tmp_path / "q22n"
    d.mkdir()
    _tpch(d, nulls=True)
    out = relational.idle_rich_customers(str(d)).to_pandas()
    # balances: 100, 500, NULL -> positives {100, 500}, avg 300; rich: 500
    got = {r.c_nationkey: (r.n_cust, r.acctbal_cents) for r in out.itertuples()}
    assert got == {0: (1, 50000)}


def test_idle_rich_customers_empty(ray_session, tmp_path):
    d = tmp_path / "q22e"
    d.mkdir()
    _tpch(d, empty=True)
    out = relational.idle_rich_customers(str(d)).to_pandas()
    assert out.shape[0] == 0
    assert list(out.columns) == ["c_nationkey", "n_cust", "acctbal_cents"]


def test_customer_order_full_join_mini(ray_session, tmp_path):
    d = tmp_path / "fj"
    d.mkdir()
    _tpch(d)
    out = relational.customer_order_full_join(str(d)).to_pandas()
    got = {
        (None if pd.isna(r.c_custkey) else int(r.c_custkey)): (
            int(r.n_orders), bool(r.has_customer)
        )
        for r in out.itertuples()
    }
    # cust 7 has 1 order; 8, 9 have none; NULL-custkey orders form their own
    # group (SQL GROUP BY keeps one NULL row, and the FULL OUTER carries it
    # through unmatched: has_customer = false)
    assert got == {7: (1, True), 8: (0, True), 9: (0, True), None: (1, False)}


def test_full_join_dangling_order_side(ray_session, tmp_path):
    d = tmp_path / "fjd"
    d.mkdir()
    _tpch(d)
    _w(d, "orders", {
        "o_custkey": pa.array([7, 99], pa.int64()),
        "o_orderdate": pa.array(
            [datetime.datetime(1999, 1, 1)] * 2, pa.timestamp("us"))})
    out = relational.customer_order_full_join(str(d)).to_pandas()
    got = {r.c_custkey: (r.n_orders, r.has_customer) for r in out.itertuples()}
    assert got[99] == (1, False)  # order-only key survives the FULL OUTER
    assert got[7] == (1, True) and got[8] == (0, True)


DOC_SHAPES = {
    "empty": ([], []),
    "one_row": ([(0, "a b a", "en", "A", 5)], [(0, [1.0, 0.0], 0)]),
    "all_null": (
        [(0, None, None, None, 0), (1, None, None, None, 0)],
        [(0, [0.0, 0.0], 0)],
    ),
    "mixed_null": (
        [(0, "a b", None, "A", 3), (1, "", "en", None, 0),
         (2, None, "fr", "B", 0), (3, "a a b c", "en", "A", 7)],
        [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 1)],
    ),
}

DOC_KERNELS = [
    "normalized_exact_dedup", "url_dedup", "embedding_covariance",
    "domain_pagerank", "bpe_pair_counts", "gram_novelty_by_bucket",
    "blocklist_filter", "doc_length_histogram", "crawl_delta",
    "kmeans_train", "knn_self_top1",
]


@pytest.mark.parametrize("shape", sorted(DOC_SHAPES))
def test_session5_doc_kernels_survive_adversarial_shapes(
    ray_session, tmp_path, shape
):
    import ray.data as rd

    doc_rows, emb_rows = DOC_SHAPES[shape]
    d = tmp_path / f"s5_{shape}"
    d.mkdir()
    _docs_table(d, doc_rows)
    _emb_table(d, emb_rows)
    for name in DOC_KERNELS:
        fn = getattr(analysis, name)
        r = fn(str(d))
        n = len(r) if isinstance(r, (pd.DataFrame, pa.Table)) else r.count()
        assert n >= 0, (shape, name)


def test_domain_pagerank_mass_conserved(ray_session, tmp_path):
    d = tmp_path / "prm"
    d.mkdir()
    # 50 docs -> every domain 0..39 present, all with outlinks; total rank
    # mass is conserved by the recurrence when no node dangles
    _docs_table(
        d, [(i, "w", "en", "A", 1) for i in range(50)]
    )
    out = analysis.domain_pagerank(str(d))
    assert out.shape[0] == 40
    assert abs(out["pr"].sum() - 1.0) < 1e-3
    assert (out["pr"] > 0).all()


def test_url_dedup_canonicalization_collapses_noise(ray_session, tmp_path):
    d = tmp_path / "urls"
    d.mkdir()
    # same canonical URL under different case / params / fragments
    _docs_table(d, [
        (0, "see https://Example.org/A/?utm_source=x#f1", "en", "A", 1),
        (1, "see https://example.ORG/a/?sid=9", "en", "A", 1),
        (2, "see https://example.org/a", "en", "A", 1),
        (3, "no url here", "en", "A", 1),
    ])
    out = analysis.url_dedup(str(d), synth=False).to_pandas()
    assert out.shape[0] == 1
    assert out["canon_url"].iloc[0] == "https://example.org/a"
    assert out["keep_doc_id"].iloc[0] == 0 and out["n_dups"].iloc[0] == 3


def test_normalized_dedup_erases_case_and_whitespace(ray_session, tmp_path):
    d = tmp_path / "norm"
    d.mkdir()
    _docs_table(d, [
        (0, "Hello  World", "en", "A", 1),
        (1, " hello\tworld ", "en", "A", 1),
        (2, "hello world", "en", "A", 1),
        (3, "different", "en", "A", 1),
    ])
    out = analysis.normalized_exact_dedup(str(d), synth=False).to_pandas()
    assert out.shape[0] == 2
    assert out["n_dups"].max() == 3 and out["keep_doc_id"].min() == 0


def test_embedding_covariance_matches_numpy(ray_session, tmp_path):
    d = tmp_path / "cov"
    d.mkdir()
    rng = np.random.RandomState(7)
    X = rng.randn(50, 4).astype(np.float32)
    _docs_table(d, [(0, "w", "en", "A", 1)])
    _emb_table(d, [(i, X[i].tolist(), 0) for i in range(50)])
    out = analysis.embedding_covariance(str(d)).to_pandas()
    assert out.shape[0] == 10  # upper triangle of 4x4
    Xd = X.astype(np.float64)
    ref = Xd.T @ Xd / 50 - np.outer(Xd.mean(0), Xd.mean(0))
    for r in out.itertuples():
        assert abs(r.cov - round(ref[r.i - 1, r.j - 1], 5)) < 1e-9


def test_bpe_pair_counts_hand_case(ray_session, tmp_path):
    d = tmp_path / "bpe"
    d.mkdir()
    # "abab" x2 docs + "ab": pairs ab: 2*2+1=5? "abab" pairs: ab, ba, ab -> per
    # occurrence; word freq: abab x2, ab x1 -> ab pair count 2*2 + 1 = 5,
    # ba 2*1 = 2
    _docs_table(d, [(0, "abab ab", "en", "A", 7), (1, "abab", "en", "A", 4)])
    out = analysis.bpe_pair_counts(str(d)).to_pandas()
    got = dict(zip(out["pair"], out["cnt"]))
    assert got["ab"] == 5 and got["ba"] == 2


def test_doc_length_histogram_buckets(ray_session, tmp_path):
    d = tmp_path / "hist"
    d.mkdir()
    # token counts: 1 ('' -> ['']), 2, 4, 8 -> bit lengths 1, 2, 3, 4
    _docs_table(d, [
        (0, None, "en", "A", 0),
        (1, "a b", "en", "A", 3),
        (2, "a b c d", "en", "A", 7),
        (3, "a b c d e f g h", "en", "A", 15),
    ])
    out = analysis.doc_length_histogram(str(d)).to_pandas().set_index("bucket")
    assert out.loc[1, "n_docs"] == 1 and out.loc[1, "sum_tokens"] == 1
    assert out.loc[2, "n_docs"] == 1 and out.loc[2, "sum_tokens"] == 2
    assert out.loc[3, "n_docs"] == 1 and out.loc[4, "sum_tokens"] == 8


def test_gram_novelty_attribution(ray_session, tmp_path):
    d = tmp_path / "nov"
    d.mkdir()
    # doc 0 introduces 'a b c'; doc 150 repeats it (not novel) and adds
    # 'x y z' -> bucket 0 gets 1, bucket 1 gets 1
    _docs_table(d, [
        (0, "a b c", "en", "A", 5),
        (150, "a b c x y z", "en", "A", 11),
    ])
    out = analysis.gram_novelty_by_bucket(str(d)).to_pandas().set_index("bucket")
    # doc 150 grams: 'a b c', 'b c x', 'c x y', 'x y z' -> 3 new in bucket 1
    assert out.loc[0, "n_new"] == 1 and out.loc[1, "n_new"] == 3


def test_blocklist_filter_counts(ray_session, tmp_path):
    d = tmp_path / "bl"
    d.mkdir()
    # doc_ids 0 (banned 0), 7 (banned), 1, 41 (41 % 40 = 1, kept)
    _docs_table(d, [
        (0, "w", "en", "A", 1), (7, "w", "en", "A", 1),
        (1, "w", "en", "B", 1), (41, "w", "en", "B", 1),
    ])
    out = analysis.blocklist_filter(str(d)).to_pandas().set_index("source")
    assert out.loc["A", "n_dropped"] == 2 and out.loc["A", "n_kept"] == 0
    assert out.loc["B", "n_kept"] == 2 and out.loc["B", "n_dropped"] == 0


def test_crawl_delta_hand_case(ray_session, tmp_path):
    d = tmp_path / "delta"
    d.mkdir()
    # key = md5 of 40-char prefix; doc 0 (A) and doc 1 (B) share text ->
    # common; doc 2 (A) unique -> removed; doc 3 (B) unique -> added
    _docs_table(d, [
        (0, "same text", "en", "A", 9),
        (1, "same text", "en", "A", 9),
        (2, "only in crawl a", "en", "A", 15),
        (3, "only in crawl b", "en", "A", 15),
    ])
    out = analysis.crawl_delta(str(d)).to_pandas().set_index("status")
    assert out.loc["common", "n_keys"] == 1
    assert out.loc["removed", "n_keys"] == 1
    assert out.loc["added", "n_keys"] == 1


def test_events_dedup_idempotent_window(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "edd"
    d.mkdir()
    t = datetime.datetime(2026, 1, 5, 10, 15)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([5, 3, 9, 11], pa.int64()),
                "ts": pa.array(
                    [t, t + datetime.timedelta(minutes=20), None,
                     t + datetime.timedelta(hours=2)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1, 1, 1, 1], pa.int64()),
                "event_type": pa.array(["click", "click", "click", "click"]),
            }
        ),
        d / "events.parquet",
    )
    out = analysis.events_dedup_idempotent(str(d)).to_pandas()
    # events 5 and 3 share (user, type, 10:00) -> keep 3, n=2; NULL ts its
    # own group; the +2h event alone
    by_keep = out.set_index("keep_event_id")
    assert by_keep.loc[3, "n_dups"] == 2
    assert by_keep.loc[9, "n_dups"] == 1 and pd.isna(by_keep.loc[9, "window_start"])
    assert by_keep.loc[11, "n_dups"] == 1


# ---------------------------------------------------------------------------
# property tests: the dedup normalizers are INVARIANT under exactly the noise
# they claim to erase


import hypothesis.strategies as st
from hypothesis import given, settings


def _norm_key(texts):
    """The normalized_exact_dedup key chain, inline (synth=False)."""
    import hashlib

    import pyarrow.compute as pc

    t = pa.array(texts, pa.string())
    norm = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(t), r"\s+", " "), " "
    )
    return [hashlib.md5(s.encode()).hexdigest() for s in norm.to_pylist()]


@settings(max_examples=50, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=6), min_size=1, max_size=8
    ),
    seps=st.lists(st.sampled_from([" ", "  ", "\t", " \t ", "\n"]), min_size=8, max_size=8),
    caps=st.lists(st.booleans(), min_size=8, max_size=8),
    pad=st.sampled_from(["", " ", "\t ", "  \n"]),
)
def test_normalized_key_invariant_under_case_and_whitespace(words, seps, caps, pad):
    base = " ".join(words)
    noisy = pad + seps[0].join(
        w.upper() if c else w for w, c in zip(words, caps)
    ) + pad
    k_base, k_noisy = _norm_key([base, noisy])
    assert k_base == k_noisy


@settings(max_examples=50, deadline=None)
@given(
    host=st.text(alphabet="abcXYZ", min_size=3, max_size=8),
    path=st.text(alphabet="abc059", min_size=0, max_size=6),
    frag=st.text(alphabet="abc1", min_size=0, max_size=4),
    q=st.sampled_from(["", "?utm_source=x", "?sid=42&utm_medium=m", "?a=1&b=2"]),
    slashes=st.integers(min_value=0, max_value=3),
)
def test_url_canon_invariant_under_tracking_noise(host, path, frag, q, slashes):
    import pyarrow.compute as pc

    def canon(url):
        a = pa.array([url], pa.string())
        c = pc.utf8_lower(a)
        c = pc.replace_substring_regex(c, r"#.*$", "")
        c = pc.replace_substring_regex(c, r"\?.*$", "")
        c = pc.replace_substring_regex(c, r"/+$", "")
        return c.to_pylist()[0]

    clean = f"https://{host}.org/{path}".lower().rstrip("/")
    noisy = f"https://{host}.org/{path}" + "/" * slashes + q + (
        f"#{frag}" if frag else ""
    )
    assert canon(noisy) == clean
