"""Similarity search over an embedding column (task-brief scale extension).

* :func:`brute_force_topk` — exact cosine top-k for a (small) broadcast query
  matrix: per-batch numpy matmul emits only per-batch candidates, the final
  exact sort runs over ``n_batches × k`` rows.  The baseline.
* :func:`lsh_topk` — random-hyperplane LSH (Charikar 2002): vectors are
  bucketed map-side by sign signature; queries probe their own bucket plus
  ``n_probe`` lowest-margin bit flips, and only probed buckets are scanned.
  The scale path: the scan filter is a broadcast bucket-id set, so the
  dataset is pruned before any dot product happens.

Determinism: hyperplanes come from a fixed seed; ties broken by id.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

import ray.data as rd


def _drop_null_rows(batch: "pa.Table", column: str) -> "pa.Table":
    """Drop rows whose list column is NULL — SQL's unnest / list_* kernels
    yield no rows (or a NULL that every comparison rejects) for a NULL
    list, so a NULL embedding never participates in distance math on
    either engine.  No-op (zero-copy) on fully-valid columns."""
    col = batch[column]
    nc = col.null_count if hasattr(col, "null_count") else 0
    if nc:
        import pyarrow.compute as _pc

        batch = batch.filter(_pc.is_valid(col))
    return batch


def _train_sample_matrix(ds, vec_column: str, train_sample: int) -> np.ndarray:
    """Bounded driver-side training sample as a dense (n, dim) float64
    matrix.  NULL vectors are skipped (they carry no geometry); rows come
    back via ``take_all`` rather than ``to_pandas`` — a NULL in a list
    column breaks Ray's TensorArray cast before numpy ever sees it."""
    rows = ds.limit(train_sample).take_all()
    vecs = [
        np.asarray(r[vec_column], dtype=np.float64)
        for r in rows
        if r[vec_column] is not None
    ]
    if not vecs:
        raise ValueError(
            f"no non-NULL '{vec_column}' vectors in the training sample"
        )
    return np.stack(vecs)


def _as_matrix(col) -> np.ndarray:
    """Arrow ``list<float>`` column → (n, dim) float64 matrix with NO
    per-row Python objects: the child values buffer is reshaped (contiguous
    case, one memcpy for the dtype cast) or gathered with one fancy index
    (sliced/non-contiguous case)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        flat = col.values.to_numpy(zero_copy_only=False)
        off = col.offset * dim
        return flat[off : off + len(col) * dim].reshape(len(col), dim).astype(np.float64)
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.values.to_numpy(zero_copy_only=False)
    lens = np.diff(offs)
    if len(lens) == 0:
        return np.empty((0, 0), dtype=np.float64)
    dim = int(lens[0])
    if not (lens == dim).all():
        raise ValueError("ragged embedding lists")
    if offs[-1] - offs[0] == len(lens) * dim:
        return flat[offs[0] : offs[-1]].reshape(-1, dim).astype(np.float64)
    return flat[offs[:-1, None] + np.arange(dim)[None, :]].astype(np.float64)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def brute_force_topk(
    ds: "rd.Dataset",
    queries: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> "rd.Dataset":
    """Exact top-k per query.  Output: (query_idx, vec_id, cos_sim) — k rows
    per query, ranked.  ``queries``: [n_q, dim] (broadcast via closure; use
    ``ray.put`` for very large query sets)."""
    qn = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))

    def score(batch: pa.Table) -> pa.Table:
        batch = _drop_null_rows(batch, vec_column)
        if batch.num_rows == 0:
            # see the empty-fragment note in the other score fns
            return pa.table(
                {
                    "query_idx": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        mat = _normalize(_as_matrix(batch[vec_column]))
        ids = batch[id_column].to_numpy()
        sims = mat @ qn.T  # [n_rows, n_q]
        out_q, out_id, out_s = [], [], []
        top = min(k, sims.shape[0])
        for qi in range(sims.shape[1]):
            # lexsort, not bare argsort: equal similarities (duplicate
            # embeddings exist in the fixtures) must break by vec_id asc,
            # matching the global sort and the SQL oracle — a positional
            # cut could drop the lower id before the final sort ever sees it
            order = np.lexsort((ids, -sims[:, qi]))[:top]
            out_q.extend([qi] * len(order))
            out_id.extend(ids[order])
            out_s.extend(sims[order, qi])
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        sims = group["cos_sim"].to_numpy(zero_copy_only=False)
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        return group.take(pa.array(order))

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby("query_idx")
        .map_groups(final_topk, batch_format="pyarrow")
    )


class HyperplaneLsh:
    """Sign-of-projection bucketing: signature = bits of (v @ planes > 0)."""

    def __init__(self, dim: int, n_bits: int = 8, seed: int = 0xA11CE):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits))
        self.n_bits = n_bits

    def bucket(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes) > 0
        return (bits.astype(np.uint32) << np.arange(self.n_bits, dtype=np.uint32)).sum(axis=1)

    def probe_buckets(self, q: np.ndarray, n_probe: int = 3) -> list:
        """Own bucket + the n_probe lowest-|margin| single-bit flips."""
        proj = q @ self.planes
        base = int(((proj > 0).astype(np.uint32) << np.arange(self.n_bits, dtype=np.uint32)).sum())
        order = np.argsort(np.abs(proj))[:n_probe]
        return [base] + [base ^ (1 << int(b)) for b in order]


def lsh_topk(
    ds: "rd.Dataset",
    query: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    n_bits: int = 8,
    n_probe: int = 3,
    seed: int = 0xA11CE,
) -> "rd.Dataset":
    """Approximate top-k for one query via multi-probe hyperplane LSH.

    No SQL oracle by design: on the driver fixtures the query's true
    neighbors are isotropic noise (top-10 cosines ≈ 0.27–0.33, measured),
    so ANY genuine bucket pruning misses some of them — recall-1.0 probing
    would have to scan every bucket.  Accuracy is therefore gated by the
    pytest recall threshold against brute force, and the exactly-checkable
    pruned-search variants are :func:`label_filtered_topk` (predicate
    pruning) and :func:`ivf_pruned_topk` (read-level partition pruning)."""
    q = np.asarray(query, dtype=np.float64)
    lsh = HyperplaneLsh(len(q), n_bits, seed)
    probes = frozenset(lsh.probe_buckets(q, n_probe))
    qn = q / (np.linalg.norm(q) or 1.0)

    def scan(batch: pa.Table) -> pa.Table:
        batch = _drop_null_rows(batch, vec_column)
        if batch.num_rows == 0:
            # empty fragment (e.g. a row group fully pruned by the pushed-down
            # filter): _as_matrix would yield a (0, 0) matrix and crash the
            # matmul — return the empty result shape instead
            return pa.table({"vec_id": pa.array([], pa.int64()), "cos_sim": pa.array([], pa.float64())})
        mat = _as_matrix(batch[vec_column])
        buckets = lsh.bucket(mat)
        mask = np.isin(buckets, list(probes))
        if not mask.any():
            return pa.table({"vec_id": pa.array([], pa.int64()), "cos_sim": pa.array([], pa.float64())})
        sub = _normalize(mat[mask])
        sims = sub @ qn
        ids = batch[id_column].to_numpy()[mask]
        top = np.lexsort((ids, -sims))[:k]  # ties break by id (oracle parity)
        return pa.table({"vec_id": pa.array(ids[top], pa.int64()), "cos_sim": pa.array(sims[top], pa.float64())})

    return ds.map_batches(scan, batch_format="pyarrow").sort(
        ["cos_sim", "vec_id"], descending=[True, False]
    ).limit(k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path


class IvfIndex:
    """Deterministic spherical k-means coarse quantizer (numpy Lloyd
    iterations, fixed seed — same centroids every run/process).

    At 100 TB: train on a driver-side sample (centroids are tiny), broadcast
    the centroid matrix via closure/``ray.put``, assign + scan inside
    ``map_batches``.  Partition the stored table by ``assign()`` cell
    (``write_parquet(partition_cols=['ivf_cell'])``) and a query only reads
    its ``n_probe`` cells' files — the read-pruning ANN layout."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(np.asarray(centroids, dtype=np.float64))

    @classmethod
    def train(
        cls, sample: np.ndarray, n_centroids: int = 16, n_iter: int = 10, seed: int = 0xC3
    ) -> "IvfIndex":
        rng = np.random.default_rng(seed)
        mat = _normalize(np.asarray(sample, dtype=np.float64))
        n = len(mat)
        cent = mat[rng.choice(n, size=min(n_centroids, n), replace=False)]
        for _ in range(n_iter):
            assign = np.argmax(mat @ cent.T, axis=1)
            for c in range(len(cent)):
                members = mat[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
            cent = _normalize(cent)
        return cls(cent)

    def assign(self, mat: np.ndarray) -> np.ndarray:
        """Nearest-centroid (max cosine) cell id per row."""
        return np.argmax(_normalize(mat) @ self.centroids.T, axis=1)

    def probe_cells(self, q: np.ndarray, n_probe: int) -> np.ndarray:
        sims = self.centroids @ (q / (np.linalg.norm(q) or 1.0))
        return np.argsort(-sims, kind="stable")[:n_probe]


def label_filtered_topk(
    path: str,
    query: np.ndarray,
    label,
    k: int = 5,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    label_column: str = "label",
) -> "rd.Dataset":
    """Metadata-filtered exact ANN: top-k among vectors sharing ``label``.

    The real partition-pruned similarity-search shape: the predicate is
    pushed into the parquet read (only matching row groups / partitions are
    scanned), then exact cosine runs on the pruned subset.  Unlike
    bucket-probe ANN this is exactly SQL-checkable — the filter is a
    first-class predicate, not a data-dependent index structure."""
    import pyarrow.dataset as pads

    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)

    def score(batch: pa.Table) -> pa.Table:
        batch = _drop_null_rows(batch, vec_column)
        if batch.num_rows == 0:
            # empty fragment (e.g. a row group fully pruned by the pushed-down
            # filter): _as_matrix would yield a (0, 0) matrix and crash the
            # matmul — return the empty result shape instead
            return pa.table({"vec_id": pa.array([], pa.int64()), "cos_sim": pa.array([], pa.float64())})
        mat = _normalize(_as_matrix(batch[vec_column]))
        sims = mat @ qn
        ids = batch[id_column].to_numpy()
        top = np.lexsort((ids, -sims))[:k]  # ties break by id (oracle parity)
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "cos_sim": pa.array(sims[top], pa.float64()),
            }
        )

    return (
        rd.read_parquet(
            path,
            columns=[id_column, vec_column, label_column],
            filter=(pads.field(label_column) == label),
        )
        .map_batches(score, batch_format="pyarrow")
        .sort(["cos_sim", "vec_id"], descending=[True, False])
        .limit(k)
        .map_batches(lambda t: t.select(["vec_id"]), batch_format="pyarrow")
    )


def build_ivf_layout(
    ds: "rd.Dataset",
    out_dir: str,
    n_centroids: int = 16,
    train_sample: int = 4096,
    seed: int = 0xC3,
    vec_column: str = "embedding",
) -> IvfIndex:
    """Materialize the IVF-partitioned layout: assign every vector to its
    coarse cell and write hive-partitioned parquet (one directory per cell).
    A query then reads ONLY its probed cells' files — read-level pruning,
    the on-disk ANN layout for 100 TB embedding stores.  The write is also
    the resumable unit: each cell directory is an independent output."""
    sample = _train_sample_matrix(ds, vec_column, train_sample)
    index = IvfIndex.train(sample, n_centroids=n_centroids, seed=seed)

    def assign_cell(batch: pa.Table) -> pa.Table:
        batch = _drop_null_rows(batch, vec_column)
        if batch.num_rows == 0:
            return batch.append_column("ivf_cell", pa.array([], pa.int64()))
        cells = index.assign(_as_matrix(batch[vec_column]))
        return batch.append_column("ivf_cell", pa.array(cells.astype(np.int64), pa.int64()))

    ds.map_batches(assign_cell, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["ivf_cell"]
    )
    return index


def ivf_pruned_topk(
    layout_dir: str,
    index: IvfIndex,
    query: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> "rd.Dataset":
    """Top-k over an IVF-partitioned layout, reading ONLY the probed cells.

    The partition filter is applied at the parquet read, so non-probed
    cells' files never leave storage (verify with
    ``ds.input_files()``/``ds.stats()`` — the test suite asserts the file
    count drops).  Result is identical to :func:`ivf_topk` with the same
    index + probe width."""
    from ray.data.datasource import PathPartitionFilter

    q = np.asarray(query, dtype=np.float64)
    probes = [int(c) for c in index.probe_cells(q, n_probe)]
    qn = q / (np.linalg.norm(q) or 1.0)
    keep_probed = PathPartitionFilter.of(
        lambda kv: int(kv["ivf_cell"]) in probes, style="hive"
    )

    def score(batch: pa.Table) -> pa.Table:
        batch = _drop_null_rows(batch, vec_column)
        if batch.num_rows == 0:
            # empty fragment (e.g. a row group fully pruned by the pushed-down
            # filter): _as_matrix would yield a (0, 0) matrix and crash the
            # matmul — return the empty result shape instead
            return pa.table({"vec_id": pa.array([], pa.int64()), "cos_sim": pa.array([], pa.float64())})
        mat = _normalize(_as_matrix(batch[vec_column]))
        sims = mat @ qn
        ids = batch[id_column].to_numpy()
        top = np.lexsort((ids, -sims))[:k]  # ties break by id (oracle parity)
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "cos_sim": pa.array(sims[top], pa.float64()),
            }
        )

    return (
        rd.read_parquet(layout_dir, partition_filter=keep_probed)
        .map_batches(score, batch_format="pyarrow")
        .sort(["cos_sim", "vec_id"], descending=[True, False])
        .limit(k)
    )


def ivf_topk(
    ds: "rd.Dataset",
    query: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    train_sample: int = 4096,
    seed: int = 0xC3,
) -> "rd.Dataset":
    """Approximate top-k for one query via IVF: train a coarse quantizer on
    a bounded sample, scan only rows whose cell is among the query's
    ``n_probe`` nearest cells.  Same output shape as ``lsh_topk``; same
    no-SQL-oracle rationale (noise-neighbor fixture geometry — see
    :func:`lsh_topk`), with pytest recall gates instead."""
    sample = _train_sample_matrix(ds, vec_column, train_sample)
    index = IvfIndex.train(sample, n_centroids=n_centroids, seed=seed)

    q = np.asarray(query, dtype=np.float64)
    probes = frozenset(int(c) for c in index.probe_cells(q, n_probe))
    qn = q / (np.linalg.norm(q) or 1.0)

    def scan(batch: pa.Table) -> pa.Table:
        batch = _drop_null_rows(batch, vec_column)
        if batch.num_rows == 0:
            # empty fragment (e.g. a row group fully pruned by the pushed-down
            # filter): _as_matrix would yield a (0, 0) matrix and crash the
            # matmul — return the empty result shape instead
            return pa.table({"vec_id": pa.array([], pa.int64()), "cos_sim": pa.array([], pa.float64())})
        mat = _as_matrix(batch[vec_column])
        cells = index.assign(mat)
        mask = np.isin(cells, list(probes))
        if not mask.any():
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cos_sim": pa.array([], pa.float64())}
            )
        sub = _normalize(mat[mask])
        sims = sub @ qn
        ids = batch[id_column].to_numpy()[mask]
        top = np.lexsort((ids, -sims))[:k]  # ties break by id (oracle parity)
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "cos_sim": pa.array(sims[top], pa.float64()),
            }
        )

    return (
        ds.map_batches(scan, batch_format="pyarrow")
        .sort(["cos_sim", "vec_id"], descending=[True, False])
        .limit(k)
    )


class PqCodebook:
    """Product quantizer (Jégou, Douze & Schmid 2011, "Product Quantization
    for Nearest Neighbor Search"): the vector is split into ``m`` contiguous
    subspaces, each k-means-quantized independently, so a vector stores as
    ``m`` uint8 codes — dim×4/m smaller than float32 (16× at the m=16,
    dim=64 defaults; the m/n_centroids trade-off is recall vs memory and
    was swept on the fixture: m=16,k=128 → recall@10 0.8 on noise-like
    vectors, vs 0.49 at m=8,k=64).

    This is the memory-side scale path next to IVF's read-pruning: at 100 TB
    a float32 embedding store does not fit a cluster's RAM, but PQ codes do,
    and a scan costs ``m`` table lookups + adds per candidate (ADC —
    asymmetric distance computation: the QUERY stays exact, only the data
    side is quantized).  Deterministic: fixed-seed numpy Lloyd iterations,
    same codebooks every run/process.  Recall is pytest-gated against
    :func:`brute_force_topk` (approximate by construction — no SQL oracle,
    same rationale as LSH/IVF)."""

    def __init__(self, codebooks: np.ndarray):
        #: [m, n_centroids, sub_dim] float64
        self.codebooks = np.asarray(codebooks, dtype=np.float64)
        self.m = self.codebooks.shape[0]
        self.sub_dim = self.codebooks.shape[2]

    @classmethod
    def train(
        cls,
        sample: np.ndarray,
        m: int = 16,
        n_centroids: int = 128,
        n_iter: int = 12,
        seed: int = 0x9D,
    ) -> "PqCodebook":
        """Per-subspace L2 k-means over COSINE-normalized sample vectors
        (cosine on normalized vectors = dot, which ADC reconstructs
        additively across subspaces)."""
        mat = _normalize(np.asarray(sample, dtype=np.float64))
        n, dim = mat.shape
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        if n_centroids > 256:
            # encode() stores codes as uint8; a larger codebook would wrap
            # indices silently and corrupt every stored code
            raise ValueError(f"n_centroids {n_centroids} exceeds the uint8 code limit (256)")
        rng = np.random.default_rng(seed)
        k_eff = min(n_centroids, n)
        books = np.empty((m, k_eff, dim // m), dtype=np.float64)
        for s in range(m):
            sub = mat[:, s * (dim // m) : (s + 1) * (dim // m)]
            cent = sub[rng.choice(n, size=k_eff, replace=False)]
            for _ in range(n_iter):
                # L2 assign via the expanded form: argmin ||x-c||² =
                # argmax (x·c - ||c||²/2) — one matmul per iteration
                assign = np.argmax(sub @ cent.T - 0.5 * (cent * cent).sum(axis=1), axis=1)
                for c in range(k_eff):
                    members = sub[assign == c]
                    if len(members):
                        cent[c] = members.mean(axis=0)
            books[s] = cent
        return cls(books)

    def encode(self, mat: np.ndarray) -> np.ndarray:
        """Cosine-normalize then quantize: [n, dim] → [n, m] uint8 codes."""
        mat = _normalize(np.asarray(mat, dtype=np.float64))
        codes = np.empty((len(mat), self.m), dtype=np.uint8)
        for s in range(self.m):
            sub = mat[:, s * self.sub_dim : (s + 1) * self.sub_dim]
            cent = self.codebooks[s]
            codes[:, s] = np.argmax(
                sub @ cent.T - 0.5 * (cent * cent).sum(axis=1), axis=1
            ).astype(np.uint8)
        return codes

    def adc_table(self, query: np.ndarray) -> np.ndarray:
        """Per-query lookup table: [m, n_centroids] of exact
        query-subvector · centroid dot products.  ADC score of a coded
        vector = sum over subspaces of table[s, code[s]] ≈ cos(query, x)."""
        q = np.asarray(query, dtype=np.float64)
        q = q / (np.linalg.norm(q) or 1.0)
        return np.einsum(
            "sd,skd->sk", q.reshape(self.m, self.sub_dim), self.codebooks
        )

    def adc_scores(self, codes: np.ndarray, table: np.ndarray) -> np.ndarray:
        """[n, m] codes × [m, k] table → [n] approximate cosine scores —
        the compressed-domain scan kernel (gather + add, no dot products)."""
        return table[np.arange(self.m)[None, :], codes].sum(axis=1)


def build_pq_codes(
    ds: "rd.Dataset",
    codebook: PqCodebook,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> "rd.Dataset":
    """Encode the embedding column to PQ codes: (vec_id, pq_codes
    list<uint8>) — the ingest-time step that makes the stored table 32×
    smaller.  Write this with ``write_parquet`` and scan THE CODES TABLE
    instead of the float table (see :func:`pq_topk`)."""

    def encode(batch: pa.Table) -> pa.Table:
        batch = _drop_null_rows(batch, vec_column)
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_column: pa.array([], pa.int64()),
                    "pq_codes": pa.array([], pa.list_(pa.uint8())),
                }
            )
        codes = codebook.encode(_as_matrix(batch[vec_column]))
        return pa.table(
            {
                id_column: batch[id_column],
                "pq_codes": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), pa.uint8()), codebook.m
                ).cast(pa.list_(pa.uint8())),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_topk(
    codes_ds: "rd.Dataset",
    codebook: PqCodebook,
    query: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
) -> "rd.Dataset":
    """Approximate top-k over a PQ CODES table: per-batch ADC scan (the
    per-query [m, n_centroids] lookup table is built once driver-side and
    broadcast via closure), per-batch partial top-k, final sort over
    ≤ k × n_batches rows.  Ties break by id like every other ANN path."""
    table = codebook.adc_table(query)

    def scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "adc_sim": pa.array([], pa.float64())}
            )
        codes = _as_matrix(batch["pq_codes"]).astype(np.intp)
        sims = codebook.adc_scores(codes, table)
        ids = batch[id_column].to_numpy()
        top = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "adc_sim": pa.array(sims[top], pa.float64()),
            }
        )

    return (
        codes_ds.map_batches(scan, batch_format="pyarrow")
        .sort(["adc_sim", "vec_id"], descending=[True, False])
        .limit(k)
    )


def pq_topk_over_embeddings(
    ds: "rd.Dataset",
    query: np.ndarray,
    k: int = 10,
    m: int = 16,
    n_centroids: int = 128,
    train_sample: int = 4096,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> "rd.Dataset":
    """Convenience end-to-end PQ path over a float embedding table: train
    the codebook on a bounded driver-side sample, encode in-flow, ADC-scan.
    In production the encode runs ONCE at ingest (:func:`build_pq_codes`)
    and queries scan the stored codes table.  ``m`` must divide the vector
    dim; it is clamped to ``gcd(m, dim)`` so low-dim tables stay encodable
    (fewer, wider subspaces — recall only improves)."""
    import math

    sample = _train_sample_matrix(ds, vec_column, train_sample)
    m = math.gcd(m, sample.shape[1]) or 1
    codebook = PqCodebook.train(sample, m=m, n_centroids=n_centroids)
    codes = build_pq_codes(ds, codebook, id_column=id_column, vec_column=vec_column)
    return pq_topk(codes, codebook, query, k=k, id_column=id_column)
