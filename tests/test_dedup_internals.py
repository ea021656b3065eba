"""Property tests for the LSH exact-verify internals against brute-force
references: pair ownership (class-collapsed), int32 triangle indices,
LUT popcount, and posting-list intersection counts."""

import numpy as np
import pytest

from language_identification_ray.stages.dedup import (
    _exact_inter_counts,
    _popcount64,
    _triu32,
    _unowned_pairs,
)


def _brute_unowned(prior, m, b_run):
    """Reference: O(m² b) per-pair mask, the pre-optimization semantics."""
    pi, pj = np.triu_indices(m, k=1)
    if prior is None or b_run == 0:
        return pi.astype(np.int64), pj.astype(np.int64)
    owned = np.zeros(len(pi), dtype=bool)
    for k in range(b_run):
        owned |= prior[pi, k] == prior[pj, k]
    return pi[~owned].astype(np.int64), pj[~owned].astype(np.int64)


def _pairs_set(pi, pj):
    return set(zip(np.minimum(pi, pj).tolist(), np.maximum(pi, pj).tolist()))


@pytest.mark.parametrize("m,b_run,n_vals", [
    (1, 0, 1), (2, 0, 1), (5, 3, 1),      # all-identical priors: all owned
    (8, 2, 8), (16, 4, 3), (64, 7, 2),    # few classes
    (32, 1, 32), (40, 5, 40),             # all-distinct priors
    (6, 16, 4),                           # more bands than rows
])
def test_unowned_pairs_matches_bruteforce(m, b_run, n_vals):
    rng = np.random.default_rng(m * 1000 + b_run * 10 + n_vals)
    prior = (
        rng.integers(0, n_vals, size=(m, b_run)).astype(np.uint64) * np.uint64(0x9E3779B9)
        if b_run
        else None
    )
    got = _pairs_set(*_unowned_pairs(prior, m, b_run))
    want = _pairs_set(*_brute_unowned(prior, m, b_run))
    assert got == want


def test_unowned_pairs_orders_i_less_than_j():
    rng = np.random.default_rng(7)
    prior = rng.integers(0, 3, size=(20, 4)).astype(np.uint64)
    pi, pj = _unowned_pairs(prior, 20, 4)
    assert (pi < pj).all()


@pytest.mark.parametrize("n", [0, 1, 2, 3, 17, 100])
def test_triu32_matches_numpy(n):
    pi, pj = _triu32(n)
    ri, rj = np.triu_indices(n, k=1)
    assert np.array_equal(pi, ri) and np.array_equal(pj, rj)
    assert pi.dtype == np.int32 and pj.dtype == np.int32


def test_popcount64_reference():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2**63, size=1000, dtype=np.uint64)
    x[:4] = [0, 1, 2**63, 2**64 - 1 - 2**63]
    want = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
    assert np.array_equal(_popcount64(x), want)
    # 2-D input keeps its shape (the simhash Hamming matrix path)
    m = x[:16].reshape(4, 4)
    assert _popcount64(m).shape == (4, 4)
    assert np.array_equal(_popcount64(m).ravel(), want[:16])


@pytest.mark.parametrize("nsub,vocab,seed", [(5, 3, 0), (30, 4, 1), (50, 200, 2), (300, 8, 3)])
def test_exact_inter_counts_matches_sets(nsub, vocab, seed):
    """Random posting lists; both the hot bit-lane path (tiny vocab) and the
    rare segmented path (wide vocab) must agree with Python set math."""
    rng = np.random.default_rng(seed)
    sets = [set(rng.integers(0, vocab, size=rng.integers(1, vocab + 1)).tolist())
            for _ in range(nsub)]
    rows = np.concatenate([np.full(len(s), i, np.int32) for i, s in enumerate(sets)])
    inv = np.concatenate([sorted(s) for s in sets]).astype(np.int64)
    # rows must be sorted within (word) segments after the internal lexsort —
    # the function sorts itself, any order is fine on input
    pi, pj = np.triu_indices(nsub, k=1)
    got = _exact_inter_counts(inv, rows, nsub, pi.astype(np.int64), pj.astype(np.int64))
    want = np.array([len(sets[a] & sets[b]) for a, b in zip(pi, pj)], dtype=np.int64)
    assert np.array_equal(got, want)


def test_validate_shard_params_rejects_bad_values():
    import pytest as _pytest

    from language_identification_ray.stages.dedup import _validate_shard_params

    _validate_shard_params(256, 4096, 64, 16)  # the defaults pass
    with _pytest.raises(ValueError, match="power of two"):
        _validate_shard_params(300, 4096)
    with _pytest.raises(ValueError, match="46340"):
        _validate_shard_params(256, 70000)
    with _pytest.raises(ValueError, match="divide"):
        _validate_shard_params(256, 4096, 64, 24)
    with _pytest.raises(ValueError, match="bands"):
        _validate_shard_params(256, 4096, 64, 128)


def test_simhash_pairs_drops_tokenless_docs(ray_session, tmp_path):
    """Empty/whitespace docs all simhash to 0; they must not pair with each
    other (hamming 0) nor flood the chunk buckets."""
    import pyarrow.parquet as _pq
    import ray.data as _rd

    from language_identification_ray.stages.dedup import simhash_pairs

    import pyarrow as pa

    texts = ["", "   ", "", "real text with several words here", "real text with several words here"]
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(5), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        tmp_path / "docs.parquet",
    )
    out = simhash_pairs(_rd.read_parquet(str(tmp_path / "docs.parquet"))).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (3, 4) in pairs  # the real dup survives
    for a, b in pairs:  # no pair involves a token-less doc
        assert a not in (0, 1, 2) and b not in (0, 1, 2)
