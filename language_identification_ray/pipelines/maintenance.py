"""Table-maintenance operations for long-lived parquet stores.

A 100 TB pipeline's output directories degrade operationally long before
they degrade logically: every incremental run appends a few small files per
partition, and after weeks a 'table' is millions of KB-sized fragments whose
per-file open/footer costs dominate every scan.  Compaction is the standing
maintenance job that rewrites them into target-sized files.

``compact_parquet`` is the Ray-Data expression: a streaming read of the
fragment set, ``repartition`` to a block count derived from total bytes /
target file size, and a distributed write — workers write their own blocks,
nothing funnels through the driver.  Plain ``repartition`` (no shuffle=True)
splits/merges block ranges without a keyed exchange, so compaction moves each
byte once.
"""

from __future__ import annotations

import os

import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data as rd


def cluster_write(
    ds: "rd.Dataset",
    out_dir: str,
    key: str,
) -> dict:
    """Write ``ds`` CLUSTERED by ``key``: a distributed sort, then a
    distributed write, so each output file covers a narrow, near-disjoint
    key range and its parquet min/max statistics actually prune.

    On an append-only 100 TB store this is the other half of maintenance
    next to :func:`compact_parquet`: compaction fixes file COUNT, clustering
    fixes file OVERLAP — a range predicate over an unclustered table opens
    every file (each spans the whole key range), over a clustered one it
    opens only the files whose [min, max] intersect.  Returns the per-file
    key ranges so callers can verify/record the layout."""
    ds.sort(key).write_parquet(out_dir)
    src = pads.dataset(out_dir)
    ranges = []
    for f in sorted(src.files):
        meta = pq.read_metadata(f)
        los, his = [], []
        for rg in range(meta.num_row_groups):
            col = next(
                meta.row_group(rg).column(i)
                for i in range(meta.num_columns)
                if meta.row_group(rg).column(i).path_in_schema == key
            )
            if col.statistics is not None:
                los.append(col.statistics.min)
                his.append(col.statistics.max)
        if los:
            ranges.append({"file": os.path.basename(f), "min": min(los), "max": max(his)})
    return {"files": len(src.files), "key": key, "ranges": ranges}


def compact_parquet(
    in_dir: str,
    out_dir: str,
    target_bytes: int = 256 << 20,
    min_files: int = 1,
) -> dict:
    """Rewrite a fragmented parquet directory into ~``target_bytes`` files.

    Returns a summary dict (files before/after, rows) so callers — and the
    lineage log of a scheduled maintenance run — can record what the pass
    accomplished.  Output file count is total-bytes / target, floored at
    ``min_files``; row order is not preserved (parquet tables are unordered;
    consumers that need order sort on read).
    """
    src = pads.dataset(in_dir)
    files_before = len(src.files)
    total_bytes = sum(os.path.getsize(f) for f in src.files)
    n_out = max(min_files, int(total_bytes // target_bytes) or min_files)

    ds = rd.read_parquet(in_dir)
    ds.repartition(n_out).write_parquet(out_dir)

    out = pads.dataset(out_dir)
    return {
        "files_before": files_before,
        "files_after": len(out.files),
        "rows": out.count_rows(),
        "bytes_before": total_bytes,
    }


# ---------------------------------------------------------------------------
# Z-order clustering (Morton interleave) — multi-column pruning layout


def _spread8() -> "np.ndarray":
    """256-entry lookup: 8-bit value -> its bits spread to even positions of
    a 16-bit word (the Morton half-interleave)."""
    import numpy as np

    v = np.arange(256, dtype=np.uint32)
    v = (v | (v << 4)) & np.uint32(0x0F0F)
    v = (v | (v << 2)) & np.uint32(0x3333)
    v = (v | (v << 1)) & np.uint32(0x5555)
    return v.astype(np.uint16)


def zorder_write(
    src_path: str,
    out_dir: str,
    key_num: str = "n_chars",
    key_cat: str = "lang",
    n_files: int = 16,
) -> dict:
    """Write a table Z-ORDERED on (``key_num``, ``key_cat``): each row's
    sort key is the Morton interleave of an 8-bit equal-width bucket of the
    numeric key and an 8-bit hash of the categorical key, so EVERY output
    file covers a narrow range of BOTH columns at once — the multi-column
    generalization of :func:`cluster_write` (single-key clustering makes one
    column's ranges disjoint and leaves the other spanning every file;
    Z-ordering is what Delta/Iceberg OPTIMIZE ZORDER runs so that either
    predicate, or both, can prune files).

    The numeric bucket bounds come from the parquet FOOTER statistics (no
    data scan); the categorical code is crc32 & 0xFF (deterministic across
    runs — a re-cluster of the same table yields the same layout).  Returns
    the per-file (num-min, num-max, cat-code set) layout table callers use
    for file-skipping reads; at 100 TB this layout row set is
    files-count-sized, the table itself streams sort → write through the
    distributed exchange exactly once."""
    import zlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    meta = pq.read_metadata(src_path)
    los, his = [], []
    for rg in range(meta.num_row_groups):
        for i in range(meta.num_columns):
            c = meta.row_group(rg).column(i)
            if (
                c.path_in_schema == key_num
                and c.statistics is not None
                and c.statistics.has_min_max  # all-NULL row groups carry stats objects without min/max
            ):
                los.append(c.statistics.min)
                his.append(c.statistics.max)
    lo = min(los) if los else 0
    hi = max(his) if his else 1
    span = max(1, hi - lo)
    spread = _spread8()

    def add_z(batch: pa.Table) -> pa.Table:
        v = batch[key_num].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = np.clip(
            np.nan_to_num((v - lo) / span, nan=0.0) * 255.0, 0, 255
        ).astype(np.uint16)
        cat = batch[key_cat].combine_chunks()
        d = pc.fill_null(cat, "").dictionary_encode()
        codes8 = np.array(
            [zlib.crc32(s.encode()) & 0xFF for s in d.dictionary.to_pylist()],
            dtype=np.uint16,
        )
        cb = codes8[d.indices.to_numpy(zero_copy_only=False)]
        z = (spread[nb].astype(np.uint32) << 1) | spread[cb].astype(np.uint32)
        return batch.append_column("_z", pa.array(z.astype(np.int64), pa.int64()))

    ds = rd.read_parquet(src_path)
    (
        ds.map_batches(add_z, batch_format="pyarrow")
        .sort("_z")
        .repartition(n_files)
        .map_batches(lambda t: t.drop_columns(["_z"]), batch_format="pyarrow")
        .write_parquet(out_dir)
    )

    import ray

    @ray.remote
    def _file_stats(f: str) -> dict:
        # per-file layout row, computed WHERE the file is: numeric range +
        # distinct cat codes from one pruned two-column read.  The driver
        # only collects files-count rows, never data.
        import zlib as _z

        import numpy as _np
        import pyarrow.parquet as _pq

        t = _pq.read_table(f, columns=[key_num, key_cat])
        v = t[key_num].to_numpy(zero_copy_only=False).astype(_np.float64)
        v = v[~_np.isnan(v)]
        cats = set(
            _z.crc32(("" if s is None else s).encode()) & 0xFF
            for s in t[key_cat].to_pylist()
        )
        return {
            "file": f,
            "num_min": float(v.min()) if len(v) else float("inf"),
            "num_max": float(v.max()) if len(v) else float("-inf"),
            "cat_codes": cats,
        }

    out = pads.dataset(out_dir)
    layout = ray.get([_file_stats.remote(f) for f in sorted(out.files)])
    return {"files": len(out.files), "layout": layout, "lo": lo, "hi": hi}


def zorder_pruned_scan(
    layout: dict,
    key_num: str,
    key_cat: str,
    num_lo: int,
    num_hi: int,
    cat: str,
) -> tuple["rd.Dataset", int, int]:
    """File-skipping scan over a :func:`zorder_write` layout: read ONLY the
    files whose recorded (num range, cat-code set) intersect the predicate
    — the read-side half of Z-order maintenance, same proof pattern as the
    IVF hive layout (pruning measured by input-file count).  Returns
    (dataset of surviving rows, files_read, files_total); the exact
    predicate is re-applied to the surviving files, so pruning can only
    skip work, never change the answer."""
    import zlib

    import pyarrow as pa
    import pyarrow.compute as pc

    code = zlib.crc32(cat.encode()) & 0xFF
    files = [
        e["file"]
        for e in layout["layout"]
        if e["num_min"] <= num_hi and e["num_max"] >= num_lo and code in e["cat_codes"]
    ]
    total = layout["files"]
    if not files:
        return None, 0, total

    def exact(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(batch[key_num], num_lo),
                pc.less_equal(batch[key_num], num_hi),
            ),
            pc.equal(batch[key_cat], cat),
        )
        return batch.filter(pc.fill_null(keep, False))

    ds = rd.read_parquet(files).map_batches(exact, batch_format="pyarrow")
    return ds, len(files), total
