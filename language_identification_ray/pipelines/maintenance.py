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
