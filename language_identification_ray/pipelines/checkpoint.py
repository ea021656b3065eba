"""Checkpointed, resumable execution of the flagship pipeline.

north_rule: "resumable from checkpoint with per-partition lineage + metrics".
The reference has no recovery story at all (a crash loses the run —
SURVEY.md §4.1); this module is the scale-out answer:

  * the input parquet file list is split into deterministic **work groups**
    (``group_size`` fragments each, sorted order — stable across runs);
  * each group runs the full streaming pipeline and writes to its own
    ``group=NNNNN/`` output directory — first into a ``_tmp_group=NNNNN``
    staging dir (the leading underscore makes parquet dataset discovery
    skip it, so partial output is invisible even mid-crash), renamed into
    place only on success;
  * per-group **lineage** (input files + row counters + wall time) is
    appended as one JSON line to ``_LINEAGE.jsonl`` *after* the rename —
    the commit record;
  * a re-run reads the lineage file and **skips completed groups** —
    idempotent resume; a crashed group leaves only a staging dir that the
    next run clears and redoes.

Live progress counters are collected by zero-cpu ``RunCounters`` actors
that the final pipeline stage updates per batch (the distributed analogue
of the reference notebooks' in-process ``Counter`` folds, e.g.
``datasets/common_words.ipynb`` cell 2).  Those streaming counters are
AT-LEAST-ONCE (a retried Ray task re-adds its batch), so the lineage
record's counters are instead derived from the staged parquet itself —
row counts from footers plus one bounded columnar read of keep /
drop_reason — which is exactly-once by construction.

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
from typing import List

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray

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
    process, so concurrent sink tasks spread over the pool.

    LIVE metrics only — under Ray task retry the same batch can be added
    twice (at-least-once), so committed lineage counts come from
    ``_count_staged`` instead."""

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
    """group_id -> lineage record, from the commit log.

    A torn FINAL line (crash between write and fsync) is by construction an
    uncommitted record: skip it with a warning so resume still works.  A
    malformed line anywhere else means real corruption — fail loudly."""
    path = os.path.join(out_dir, LINEAGE_FILE)
    done = {}
    if os.path.exists(path):
        with open(path) as f:
            lines = [ln.strip() for ln in f]
        lines = [ln for ln in lines if ln]
        for i, line in enumerate(lines):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                if i == len(lines) - 1:
                    print(f"{LINEAGE_FILE}: ignoring torn trailing line (uncommitted record)")
                    continue
                raise
            done[rec["group"]] = rec
    return done


def _count_staged(staging: str) -> dict:
    """Exactly-once group counters from the staged parquet: row count from
    footers, kept/drop-reason from one bounded columnar read."""
    d = pads.dataset(staging)
    rows = d.count_rows()
    tbl = d.to_table(columns=["keep", "drop_reason"])
    kept = int(pc.sum(tbl["keep"]).as_py() or 0)
    reasons = Counter(r for r in tbl["drop_reason"].to_pylist() if r)
    return {
        "rows": rows,
        "kept": kept,
        "dropped": rows - kept,
        **{f"drop_{k}": v for k, v in reasons.items()},
    }


class _RunLock:
    """O_EXCL pid lock on out_dir: a second concurrent driver would rmtree
    staging dirs the first is writing and double-append lineage records.
    A lock whose pid is dead (crashed driver) is taken over."""

    def __init__(self, out_dir: str):
        self.path = os.path.join(out_dir, "_LOCK")

    def __enter__(self):
        for _ in range(3):
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return self
            except FileExistsError:
                try:
                    pid = int(open(self.path).read().strip() or "0")
                except (ValueError, OSError):
                    pid = 0
                alive = False
                if pid > 0:
                    try:
                        os.kill(pid, 0)
                        alive = True
                    except ProcessLookupError:
                        alive = False
                    except PermissionError:
                        # the pid exists but belongs to another user — it
                        # cannot be a crashed driver of ours (same-user
                        # writes created the lock); treat as held
                        alive = True
                if alive:
                    raise RuntimeError(
                        f"another driver (pid {pid}) holds {self.path}; "
                        "refusing to run two resumable jobs on one out_dir"
                    )
                # TOCTOU-safe takeover (r2 ADVICE): CLAIM the stale lock with
                # an atomic rename before removing it — of N drivers that all
                # read the dead pid, exactly one rename succeeds; the losers
                # fall back to the O_EXCL attempt and see the winner's fresh
                # lock.  A bare unlink here would let a loser delete the
                # winner's just-created lock.
                claim = f"{self.path}.stale.{os.getpid()}"
                try:
                    os.rename(self.path, claim)
                except FileNotFoundError:
                    continue  # another racer claimed it first; retry O_EXCL
                # rename() claims whatever file sits at self.path — which may
                # be a FRESH lock a faster racer already recreated after its
                # own takeover, not the stale one we read.  Verify the claimed
                # pid before discarding; restore a stolen live lock with
                # link() (atomic: fails if yet another lock appeared).
                try:
                    claimed_pid = int(open(claim).read().strip() or "0")
                except (ValueError, OSError):
                    claimed_pid = 0
                if claimed_pid not in (0, pid):
                    try:
                        os.link(claim, self.path)
                    except FileExistsError:
                        raise RuntimeError(
                            f"lock takeover race on {self.path}: claimed live "
                            f"lock of pid {claimed_pid} and a third lock "
                            "appeared before it could be restored; manual "
                            f"cleanup of {claim} required"
                        )
                    os.unlink(claim)
                    continue
                os.unlink(claim)
        raise RuntimeError(f"could not acquire {self.path}")

    def __exit__(self, *exc):
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass


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
    # paths in lineage are stored relative to the input root so resuming
    # from a different cwd / path spelling of the SAME data still matches
    rel_root = input_path if os.path.isdir(input_path) else os.path.dirname(input_path) or "."
    os.makedirs(out_dir, exist_ok=True)
    done = completed_groups(out_dir)
    stale = [g for g in done if g >= len(groups)]
    if stale:
        raise RuntimeError(
            f"lineage has committed group(s) {stale} beyond this run's "
            f"{len(groups)} group(s) — the input file set shrank; their "
            "output dirs would silently contribute rows from files no "
            "longer in the input.  Use a fresh out_dir."
        )

    counters = CounterPool()
    ran, skipped = [], []
    lineage_path = os.path.join(out_dir, LINEAGE_FILE)

    lock = _RunLock(out_dir)
    lock.__enter__()
    try:
        _run_groups(
            groups, rel_root, out_dir, done, counters, ran, skipped,
            lineage_path, pages_dataset_fn, pipeline_kwargs,
        )
    finally:
        lock.__exit__()

    totals: Counter = Counter()
    totals_run: Counter = Counter()
    ran_set = set(ran)
    for rec in completed_groups(out_dir).values():
        totals.update(rec.get("counters", {}))
        if rec.get("group") in ran_set:
            totals_run.update(rec.get("counters", {}))
    return {
        "groups_run": ran,
        "groups_skipped": skipped,
        "counters": dict(totals),  # ALL committed groups (table totals)
        "counters_run": dict(totals_run),  # only groups THIS invocation ran
    }


def _run_groups(
    groups, rel_root, out_dir, done, counters, ran, skipped,
    lineage_path, pages_dataset_fn, pipeline_kwargs,
) -> None:
    from language_identification_ray.pipelines.quality_filter import build as _build
    from language_identification_ray.sources.pages import read_pages as _read_pages

    for gid, gfiles in enumerate(groups):
        gname = f"group={gid:05d}"
        gdir = os.path.join(out_dir, gname)
        rel_files = [os.path.relpath(f, rel_root) for f in gfiles]
        if gid in done:
            # a group id is positional; if the input file set or group_size
            # changed since the committed run, gid would map to DIFFERENT
            # files — skipping then silently drops fragments.  Resume is
            # only valid when the lineage record's file list matches
            # (relative form preferred; absolute accepted for old records).
            rec_files = done[gid].get("input_files")
            if rec_files not in (rel_files, gfiles):
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
        # leading underscore: parquet dataset discovery skips the staging
        # dir, so a reader of out_dir never sees a crashed partial write
        staging = os.path.join(out_dir, f"_tmp_{gname}")
        for leftover in (staging, gdir + "._tmp", gdir):  # redo crashed attempts
            if os.path.exists(leftover):
                shutil.rmtree(leftover)

        t0 = time.time()
        pages = pages_dataset_fn(gfiles) if pages_dataset_fn else _read_pages(gfiles)
        out = _build(pages, **pipeline_kwargs)
        # batch_size=None: count whatever block arrives — forcing a size
        # would re-buffer the upstream 1024-row blocks just to count them
        out = out.map_batches(
            _CountingSink(counters.shards), batch_format="pyarrow", batch_size=None
        )
        out.write_parquet(staging)
        counters.reset()  # streaming shards: clear per group (live view only)
        group_counts = _count_staged(staging)  # exactly-once, from the data
        os.rename(staging, gdir)  # commit point 1: output visible
        # make the rename durable BEFORE the lineage record: otherwise a
        # power loss can persist the fsynced lineage line while the cached
        # rename is lost — resume would then skip a group with no output
        dfd = os.open(out_dir, os.O_DIRECTORY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        rec = {
            "group": gid,
            "dir": gname,
            "input_files": rel_files,
            "wall_s": round(time.time() - t0, 3),
            "counters": group_counts,
        }
        with open(lineage_path, "a") as f:  # commit point 2: lineage record
            f.write(json.dumps(rec, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())
        ran.append(gid)
