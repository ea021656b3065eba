"""Checkpointed, resumable execution of the flagship pipeline.

north_rule: "resumable from checkpoint with per-partition lineage + metrics".
The reference has no recovery story at all (a crash loses the run —
SURVEY.md §4.1); this module is the scale-out answer:

  * the input parquet file list is split into deterministic **work groups**
    (``group_size`` fragments each, sorted order — stable across runs);
  * each group runs the full streaming pipeline and writes to its own
    ``group=NNNNN/`` output directory — first into a ``*._tmp`` staging dir,
    renamed into place only on success, so partial output is never visible;
  * per-group **lineage** (input files + row counters + wall time) is
    appended as one JSON line to ``_LINEAGE.jsonl`` *after* the rename —
    the commit record;
  * a re-run reads the lineage file and **skips completed groups** —
    idempotent resume; a crashed group leaves only a staging dir that the
    next run clears and redoes.

Counters are collected by a zero-cpu ``RunCounters`` Ray actor that the
final pipeline stage updates per batch (the distributed analogue of the
reference notebooks' in-process ``Counter`` folds, e.g.
``datasets/common_words.ipynb`` cell 2) — no extra pass over the data and
no driver-side iteration.

At 100 TB: group_size × fragment size bounds per-checkpoint work (e.g. 64
× 1 GiB fragments ≈ 64 GiB per commit); each group still fans out over the
whole cluster, and the commit cadence (minutes) keeps redo-on-crash small.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections import Counter
from typing import List, Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from language_identification_ray.pipelines.quality_filter import build
from language_identification_ray.sources.pages import read_pages

LINEAGE_FILE = "_LINEAGE.jsonl"


@ray.remote(num_cpus=0)
class RunCounters:
    """Cluster-wide run metrics: tiny actor, fire-and-forget updates."""

    def __init__(self):
        self.c = Counter()

    def add(self, **kw) -> None:
        self.c.update(kw)

    def snapshot(self) -> dict:
        return dict(self.c)

    def reset(self) -> dict:
        out = dict(self.c)
        self.c.clear()
        return out


class CounterPool:
    """``n_shards`` RunCounters actors behind one snapshot/reset surface.

    Sinks update their shard SYNCHRONOUSLY (the landed-before-task-completes
    guarantee that makes reset() race-free after ``write_parquet`` returns),
    but each worker talks to its own shard, so the per-batch round-trip
    scales with the shard count instead of serializing the whole final stage
    through one actor's mailbox.  Size ``n_shards`` ~ cluster width / 32."""

    def __init__(self, n_shards: int = 8):
        self.shards = [RunCounters.remote() for _ in range(n_shards)]

    def snapshot(self) -> dict:
        totals: Counter = Counter()
        for s in ray.get([sh.snapshot.remote() for sh in self.shards]):
            totals.update(s)
        return dict(totals)

    def reset(self) -> dict:
        totals: Counter = Counter()
        for s in ray.get([sh.reset.remote() for sh in self.shards]):
            totals.update(s)
        return dict(totals)


class _CountingSink:
    """Final map_batches stage: updates a counter shard per batch and passes
    the batch through unchanged (zero-copy).  Shard choice is per worker
    process, so concurrent sink tasks spread over the pool."""

    def __init__(self, shards: List["ray.actor.ActorHandle"]):
        self.shards = shards
        self._shard = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._shard is None:
            self._shard = self.shards[os.getpid() % len(self.shards)]
        kept = int(pc.sum(batch["keep"]).as_py() or 0)
        reasons = Counter(
            r for r in batch["drop_reason"].to_pylist() if r
        )
        # synchronous: guarantees the update has LANDED at the shard before
        # this map task completes — so when write_parquet returns, the group's
        # counters are complete and reset() cannot race a late add()
        ray.get(
            self._shard.add.remote(
                rows=len(batch),
                kept=kept,
                dropped=len(batch) - kept,
                **{f"drop_{k}": v for k, v in reasons.items()},
            )
        )
        return batch


def list_input_files(input_path: str) -> List[str]:
    """Deterministic sorted parquet fragment list (stable group identity)."""
    if os.path.isfile(input_path):
        return [input_path]
    out = []
    for root, _dirs, files in os.walk(input_path):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def completed_groups(out_dir: str) -> dict:
    """group_id -> lineage record, from the commit log."""
    path = os.path.join(out_dir, LINEAGE_FILE)
    done = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    done[rec["group"]] = rec
    return done


def run_resumable(
    input_path: str,
    out_dir: str,
    group_size: int = 64,
    pages_dataset_fn=None,
    **pipeline_kwargs,
) -> dict:
    """Run (or resume) the flagship pipeline over ``input_path`` parquet.

    Returns {"groups_run": [...], "groups_skipped": [...], "counters": {...}}.
    ``pages_dataset_fn(files) -> Dataset`` overrides the reader (tests use it
    to inject the synthesized-pages schema).
    """
    files = list_input_files(input_path)
    if not files:
        raise FileNotFoundError(f"no parquet under {input_path}")
    groups = [files[i : i + group_size] for i in range(0, len(files), group_size)]
    os.makedirs(out_dir, exist_ok=True)
    done = completed_groups(out_dir)

    counters = CounterPool()
    ran, skipped = [], []
    lineage_path = os.path.join(out_dir, LINEAGE_FILE)

    for gid, gfiles in enumerate(groups):
        gname = f"group={gid:05d}"
        gdir = os.path.join(out_dir, gname)
        if gid in done:
            # a group id is positional; if the input file set or group_size
            # changed since the committed run, gid would map to DIFFERENT
            # files — skipping then silently drops fragments.  Resume is
            # only valid when the lineage record's file list matches.
            rec_files = done[gid].get("input_files")
            if rec_files != gfiles:
                raise RuntimeError(
                    f"lineage mismatch for {gname}: committed run processed "
                    f"{len(rec_files or [])} file(s) starting with "
                    f"{(rec_files or ['<none>'])[0]!r}, but this run's group "
                    f"maps to {len(gfiles)} file(s) starting with "
                    f"{gfiles[0]!r}. The input file set or group_size "
                    "changed — use a fresh out_dir (or delete "
                    f"{LINEAGE_FILE} and all group dirs) instead of resuming."
                )
            skipped.append(gid)
            continue
        staging = gdir + "._tmp"
        for stale in (staging, gdir):  # redo any partial/crashed attempt
            if os.path.exists(stale):
                shutil.rmtree(stale)

        t0 = time.time()
        pages = pages_dataset_fn(gfiles) if pages_dataset_fn else read_pages(gfiles)
        out = build(pages, **pipeline_kwargs)
        out = out.map_batches(
            _CountingSink(counters.shards), batch_format="pyarrow", batch_size=4096
        )
        out.write_parquet(staging)
        group_counts = counters.reset()
        os.rename(staging, gdir)  # commit point 1: output visible
        rec = {
            "group": gid,
            "dir": gname,
            "input_files": gfiles,
            "wall_s": round(time.time() - t0, 3),
            "counters": group_counts,
        }
        with open(lineage_path, "a") as f:  # commit point 2: lineage record
            f.write(json.dumps(rec, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())
        ran.append(gid)

    totals: Counter = Counter()
    for rec in completed_groups(out_dir).values():
        totals.update(rec.get("counters", {}))
    return {"groups_run": ran, "groups_skipped": skipped, "counters": dict(totals)}
