"""Unit tests for the BPE-ish token count, winnowing fingerprints, char
shingles, and embedding quantize/centroid internals."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from language_identification_ray.pipelines.analysis import (
    BPE_PRETOKEN_RE,
    _segment_aranges,
    _winnow_batch,
)
from language_identification_ray.stages.dedup import _char_shingle_hashes


def _winnow_ref(text: str, k: int = 5, w: int = 4) -> set:
    """Straight-line reference winnowing (per the SQL oracle semantics)."""
    if not text:
        return set()
    cps = [ord(c) for c in text]
    n_g = max(len(cps) - k + 1, 1)
    hs = []
    for i in range(n_g):
        h = 0
        for x in cps[i : i + k]:
            h = (h * 31 + x) % (1 << 32)
        hs.append(h)
    n_w = max(len(hs) - w + 1, 1)
    return {min(hs[i : i + w]) for i in range(n_w)}


class TestWinnow:
    def test_matches_reference_on_mixed_batch(self):
        texts = [
            "the quick brown fox jumps over the lazy dog",
            "",                      # dropped entirely
            "ab",                    # shorter than k: whole-text hash
            "abcd",                  # exactly k-1
            "abcde",                 # exactly k: one k-gram
            "abcdefgh",              # a few k-grams, fewer than w windows
            "x" * 200,               # repetitive: collapses to one fingerprint
            "héllo wörld — ünïcödé",
        ]
        ids = np.arange(len(texts), dtype=np.int64)
        out_ids, fps = _winnow_batch(texts, ids, 5, 4)
        got = {}
        for d, f in zip(out_ids, fps):
            got.setdefault(int(d), set()).add(int(f))
        for d, t in enumerate(texts):
            assert got.get(d, set()) == _winnow_ref(t), f"doc {d}: {t!r}"

    def test_near_dup_share_fingerprints(self):
        a = "the quick brown fox jumps over the lazy dog again and again"
        b = a.replace("lazy", "hazy")
        ids = np.array([1, 2], dtype=np.int64)
        out_ids, fps = _winnow_batch([a, b], ids, 5, 4)
        fa = {int(f) for d, f in zip(out_ids, fps) if d == 1}
        fb = {int(f) for d, f in zip(out_ids, fps) if d == 2}
        inter = len(fa & fb) / len(fa | fb)
        assert inter > 0.5  # one-char edit keeps most fingerprints

    def test_all_empty_batch(self):
        out_ids, fps = _winnow_batch(["", None], np.array([1, 2]), 5, 4)
        assert len(out_ids) == 0 and len(fps) == 0


def test_segment_aranges():
    starts = np.array([0, 10, 20])
    counts = np.array([3, 0, 2])
    np.testing.assert_array_equal(
        _segment_aranges(starts, counts), [0, 1, 2, 20, 21]
    )
    assert len(_segment_aranges(np.array([5]), np.array([0]))) == 0


class TestCharShingles:
    def test_set_sizes_match_sql_semantics(self):
        texts = ["abcdef", "ab", "", "aaaa", None]
        H, ptr = _char_shingle_hashes(texts, k=3)
        sizes = np.diff(ptr)
        # abcdef -> 4 distinct 3-grams; ab -> whole text; '' -> none;
        # aaaa -> {'aaa'} (distinct); None -> none
        np.testing.assert_array_equal(sizes, [4, 1, 0, 1, 0])

    def test_identical_texts_identical_hashes(self):
        H, ptr = _char_shingle_hashes(["hello world", "hello world"], k=3)
        a = H[ptr[0] : ptr[1]]
        b = H[ptr[1] : ptr[2]]
        np.testing.assert_array_equal(a, b)  # sorted within doc slices


def test_bpe_pretoken_regex_examples():
    arr = pa.array(
        ["don't stop", "hello   world", "3.14 and 42", "", "…—…"]
    )
    counts = pc.count_substring_regex(arr, BPE_PRETOKEN_RE).to_pylist()
    # don|'t| stop ; hello|'   '|world ; 3|.|14| and| 42 ; '' ; one punct run
    assert counts == [3, 3, 5, 0, 1]


def test_quantize_zero_vector_guard(ray_session):
    import ray.data as rd
    from language_identification_ray.pipelines.analysis import embedding_quantize
    import tempfile, os
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2], pa.int64()),
            "embedding": pa.array([[0.0, 0.0], [3.0, -4.0]], pa.list_(pa.float32())),
            "label": pa.array([0, 0], pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))
    out = embedding_quantize(d).to_pandas().sort_values("vec_id")
    assert out.iloc[0]["scale"] == 0.0
    assert out.iloc[0]["q_sum"] == 0
    # max|x| = 4 (the negative component): -4 -> -127, 3 -> round(3*127/4) = 95
    assert out.iloc[1]["q_min"] == -127
    assert out.iloc[1]["q_max"] == 95
