"""Dedup operator tests: crafted near-duplicates must be found; unrelated
text must not pair up."""

import numpy as np
import pytest

import ray.data as rd

from language_identification_ray.stages.dedup import (
    MinHasher,
    SimHasher,
    embedding_dup_pairs,
    hamming64,
    jaccard,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
    stable_hash64,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from "
    "the warm windowsill and the birds sing in the garden every morning"
)
NEAR = BASE.replace("lazy", "sleepy")  # one-word edit → high jaccard
FAR = "completely different content about databases indexes and query planners running on clusters"


def test_stable_hash_is_stable():
    assert stable_hash64("abc") == stable_hash64("abc")
    assert stable_hash64("abc") != stable_hash64("abd")


def test_shingles_and_jaccard():
    a, b = word_shingles(BASE), word_shingles(NEAR)
    assert 0.7 < jaccard(a, b) < 1.0
    assert jaccard(word_shingles(BASE), word_shingles(FAR)) < 0.05
    assert jaccard(set(), set()) == 1.0


def test_minhash_estimates_jaccard():
    mh = MinHasher(128)
    a, b = word_shingles(BASE), word_shingles(NEAR)
    est = mh.est_jaccard(mh.signature(a), mh.signature(b))
    assert abs(est - jaccard(a, b)) < 0.15


def test_minhash_deterministic():
    a = MinHasher(64).signature(word_shingles(BASE))
    b = MinHasher(64).signature(word_shingles(BASE))
    assert (a == b).all()


@pytest.fixture(scope="module")
def dup_ds(ray_session):
    rows = [
        {"doc_id": 0, "lang": "en", "text": BASE},
        {"doc_id": 1, "lang": "en", "text": NEAR},
        {"doc_id": 2, "lang": "en", "text": FAR},
        {"doc_id": 3, "lang": "en", "text": BASE},  # exact dup of 0
        {"doc_id": 4, "lang": "de", "text": BASE},  # same text, other block
    ]
    return rd.from_items(rows)


def test_minhash_lsh_pairs_finds_dups(dup_ds):
    pairs = minhash_lsh_pairs(dup_ds, threshold=0.7).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 3) in found  # exact dup
    assert (0, 1) in found  # near dup
    assert (0, 2) not in found and (1, 2) not in found  # unrelated


def test_simhash_pairs_finds_dups(dup_ds):
    pairs = simhash_pairs(dup_ds, max_hamming=3).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 3) in found
    assert (0, 2) not in found


def test_simhash_properties():
    sh = SimHasher()
    assert sh.simhash(BASE) == sh.simhash(BASE)
    assert hamming64(sh.simhash(BASE), sh.simhash(NEAR)) <= 6
    assert hamming64(sh.simhash(BASE), sh.simhash(FAR)) > 10
    assert sh.simhash("") == 0


def test_jaccard_pairs_blocked(dup_ds):
    pairs = jaccard_pairs(dup_ds, threshold=0.9).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 3) in found
    # doc 4 is in block 'de' → never paired with block 'en' twins
    assert not any(4 in p for p in found)


def test_embedding_dup_pairs(ray_session):
    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    rows = [
        {"vec_id": 0, "label": 0, "embedding": base.tolist()},
        {"vec_id": 1, "label": 0, "embedding": (base + rng.standard_normal(16) * 0.01).tolist()},
        {"vec_id": 2, "label": 0, "embedding": rng.standard_normal(16).tolist()},
        {"vec_id": 3, "label": 1, "embedding": base.tolist()},  # other block
    ]
    pairs = embedding_dup_pairs(rd.from_items(rows), threshold=0.95).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["vec_a"], pairs["vec_b"])}
    assert found == {(0, 1)}


def _clustered_embeddings(seed=7, n_clusters=6, per_cluster=30, noise=80, dim=16):
    """Tight clusters + noise: the regime IVF cell blocking exists for."""
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    parts = [centers[c] + 0.02 * rng.normal(size=(per_cluster, dim)) for c in range(n_clusters)]
    parts.append(rng.normal(size=(noise, dim)))
    X = np.vstack(parts)
    n = len(X)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in X], pa.list_(pa.float32())
            ),
            "label": pa.array(rng.integers(0, 3, n), pa.int32()),
        }
    )
    return tbl, X.astype(np.float64)


def _brute_pairs(X, t, labels=None):
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    Xn = X / norms[:, None]
    S = np.round(Xn @ Xn.T, 5)
    iu, ju = np.triu_indices(len(X), 1)
    m = S[iu, ju] >= t
    if labels is not None:
        m &= labels[iu] == labels[ju]
    return sorted(zip(iu[m].tolist(), ju[m].tolist(), S[iu, ju][m].tolist()))


def _canon_pairs(df):
    return sorted(
        (int(a), int(b), float(s))
        for a, b, s in zip(df["vec_a"], df["vec_b"], df["cos_sim"])
    )


def test_embedding_dup_pairs_ivf_lossless_equals_label_mode(ray_session):
    """Cover-radius multi-probe is LOSSLESS: within-label ivf blocking must
    emit exactly the label-mode pair set (VERDICT r3 #1 — cluster-first
    blocking must not change semantics where the radius guarantee holds)."""
    tbl, X = _clustered_embeddings()
    ds = rd.from_arrow(tbl)
    lab = tbl["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    for t in (0.9, 0.95):
        base = _canon_pairs(embedding_dup_pairs(ds, threshold=t).to_pandas())
        ivf = _canon_pairs(
            embedding_dup_pairs(
                ds, threshold=t, block="ivf", n_cells=8, probes=None, n_tiles=2
            ).to_pandas()
        )
        assert ivf == base
        assert base == _brute_pairs(X, t, labels=lab)
        assert len(base) > 0  # the fixture must actually exercise pairing


def test_embedding_dup_pairs_ivf_global_lossless(ray_session):
    """block_column=None + lossless probing = corpus-global near-dup pairs,
    exactly equal to the O(n²) brute force."""
    tbl, X = _clustered_embeddings()
    ds = rd.from_arrow(tbl.select(["vec_id", "embedding"]))
    got = _canon_pairs(
        embedding_dup_pairs(
            ds, block_column=None, threshold=0.9, block="ivf",
            n_cells=8, probes=None, n_tiles=2,
        ).to_pandas()
    )
    assert got == _brute_pairs(X, 0.9)


def _lloyd_cosine(X, k=8, iters=8):
    """Tiny deterministic Lloyd in cosine space (test-side trainer for the
    ``centroids`` production param)."""
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    Xn = X / norms[:, None]
    C = Xn[:: max(1, len(Xn) // k)][:k].copy()
    for _ in range(iters):
        a = np.argmax(Xn @ C.T, axis=1)
        for c in range(len(C)):
            m = a == c
            if m.any():
                C[c] = Xn[m].mean(axis=0)
    return C


def test_embedding_dup_pairs_ivf_prunes_and_multiprobe_is_exactly_once(ray_session):
    """With TRAINED centroids (cells ≈ clusters), the lossless probe sets
    must actually PRUNE on clustered data at a high threshold (guards
    against 'degenerate = trivially correct'), and multi-probe emission
    must be exactly-once (min-common-cell rule)."""
    from language_identification_ray.stages.dedup import _ivf_cell_expand

    tbl, X = _clustered_embeddings()
    ds = rd.from_arrow(tbl.select(["vec_id", "embedding"]))
    C = _lloyd_cosine(X, k=8)
    expanded = _ivf_cell_expand(
        ds, "vec_id", "embedding", None, 0.95, 8, None, C
    ).to_pandas()
    n = tbl.num_rows
    # replication factor strictly below the degenerate all-cells blowup
    assert len(expanded) < 8 * n * 0.8
    assert len(expanded) >= n
    # lossless output through trained cells still equals brute force
    got = _canon_pairs(
        embedding_dup_pairs(
            ds, block_column=None, threshold=0.95, block="ivf",
            n_cells=8, probes=None, n_tiles=2, centroids=C,
        ).to_pandas()
    )
    assert got == _brute_pairs(X, 0.95)
    # multi-probe (probes=3): same pair never emitted twice
    df = embedding_dup_pairs(
        ds, block_column=None, threshold=0.9, block="ivf",
        n_cells=8, probes=3, n_tiles=2,
    ).to_pandas()
    keys = list(zip(df["vec_a"], df["vec_b"]))
    assert len(keys) == len(set(keys))
    # and probes=3 is a superset of probes=1, subset of brute force
    d1 = embedding_dup_pairs(
        ds, block_column=None, threshold=0.9, block="ivf",
        n_cells=8, probes=1, n_tiles=2,
    ).to_pandas()
    assert set(zip(d1["vec_a"], d1["vec_b"])) <= set(keys)
    assert set(keys) <= {(a, b) for a, b, _ in _brute_pairs(X, 0.9)}


def test_embedding_dup_pairs_ivf_trained_centroids_recall(ray_session):
    """The production path: Lloyd-trained centroids shipped via the
    ``centroids`` param.  probes=1 recall on clustered data must be high —
    this is SemDeDup's actual operating point (cells ≈ clusters)."""
    tbl, X = _clustered_embeddings()
    ds = rd.from_arrow(tbl.select(["vec_id", "embedding"]))
    C = _lloyd_cosine(X, k=8)
    got = embedding_dup_pairs(
        ds, block_column=None, threshold=0.9, block="ivf",
        n_cells=8, probes=1, n_tiles=2, centroids=C,
    ).to_pandas()
    brute = _brute_pairs(X, 0.9)
    found = set(zip(got["vec_a"], got["vec_b"]))
    truth = {(a, b) for a, b, _ in brute}
    assert found <= truth  # never a false pair
    assert len(found) / len(truth) >= 0.95


def test_embedding_dup_pairs_ivf_adversarial_shapes(ray_session):
    """Zero vectors, NULL labels, and empty inputs must not raise."""
    import pyarrow as pa

    rows = [
        {"vec_id": 0, "label": 0, "embedding": [0.0] * 8},
        {"vec_id": 1, "label": None, "embedding": [1.0] + [0.0] * 7},
        {"vec_id": 2, "label": 0, "embedding": [1.0] + [0.0] * 7},
        {"vec_id": 3, "label": 0, "embedding": [1.0, 1e-8] + [0.0] * 6},
    ]
    out = embedding_dup_pairs(
        rd.from_items(rows), threshold=0.9, block="ivf", n_cells=4,
        probes=None, n_tiles=2,
    ).to_pandas()
    # NULL label never pairs; zero vector never pairs; 2-3 do
    assert _canon_pairs(out) == [(2, 3, 1.0)]
    empty = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "label": pa.array([], pa.int32()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
    )
    assert (
        embedding_dup_pairs(
            empty, threshold=0.9, block="ivf", n_cells=4, probes=1
        ).to_pandas().shape[0]
        == 0
    )


def test_embedding_dup_pairs_auto_gate_plans_agree(ray_session):
    """block="auto" must produce the identical pair set whichever physical
    plan the size gate picks: over-gate + high threshold routes through
    lossless IVF, over-gate + low threshold widens the tile fan, under-gate
    stays on the plain label plan."""
    tbl, X = _clustered_embeddings()
    ds = rd.from_arrow(tbl)
    lab = tbl["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    # high threshold: gate trips -> lossless IVF plan
    want_hi = _brute_pairs(X, 0.9, labels=lab)
    got_ivf = _canon_pairs(
        embedding_dup_pairs(ds, threshold=0.9, auto_gate=10).to_pandas()
    )
    assert got_ivf == want_hi
    # low threshold: gate trips -> label plan with widened tile fan
    want_lo = _brute_pairs(X, 0.4, labels=lab)
    got_tiles = _canon_pairs(
        embedding_dup_pairs(ds, threshold=0.4, auto_gate=10).to_pandas()
    )
    assert got_tiles == want_lo
    # under-gate: plain label plan, same answer
    got_label = _canon_pairs(
        embedding_dup_pairs(ds, threshold=0.9, auto_gate=10**6).to_pandas()
    )
    assert got_label == want_hi


def test_embedding_dup_pairs_auto_global(ray_session):
    """auto + block_column=None: the single global block follows the same
    threshold rule and still matches brute force at both regimes."""
    tbl, X = _clustered_embeddings(noise=30, per_cluster=15)
    ds = rd.from_arrow(tbl.select(["vec_id", "embedding"]))
    for t in (0.4, 0.9):
        got = _canon_pairs(
            embedding_dup_pairs(
                ds, block_column=None, threshold=t, n_cells=8
            ).to_pandas()
        )
        assert got == _brute_pairs(X, t)
