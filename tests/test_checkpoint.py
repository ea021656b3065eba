"""Resumable checkpointed run: group commit, lineage, skip-on-resume,
crash redo (north_rule resume criterion)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def sharded_input(ray_session, sf_dir, tmp_path_factory):
    """documents.parquet split into 4 fragment files (multi-file input)."""
    src = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    d = tmp_path_factory.mktemp("shards")
    n = len(src)
    step = (n + 3) // 4
    for i in range(4):
        pq.write_table(src.slice(i * step, step), str(d / f"part-{i:03d}.parquet"))
    return str(d), n


def _synth_fn(files):
    import ray.data as rd

    from language_identification_ray.sources.pages import _synthesize_batch

    return rd.read_parquet(files).map_batches(_synthesize_batch, batch_format="pyarrow")


def test_run_resume_and_crash_redo(ray_session, sharded_input, tmp_path):
    import ray.data as rd

    from language_identification_ray.pipelines.checkpoint import (
        LINEAGE_FILE,
        completed_groups,
        run_resumable,
    )

    input_dir, n_rows = sharded_input
    out = str(tmp_path / "out")

    # fresh run: 4 files / group_size 2 → 2 groups, all run
    info = run_resumable(input_dir, out, group_size=2, pages_dataset_fn=_synth_fn)
    assert info["groups_run"] == [0, 1]
    assert info["groups_skipped"] == []
    assert info["counters"]["rows"] == n_rows
    assert info["counters"]["kept"] + info["counters"]["dropped"] == n_rows
    assert any(k.startswith("drop_") for k in info["counters"])

    lineage = completed_groups(out)
    assert set(lineage) == {0, 1}
    assert all(rec["counters"]["rows"] > 0 for rec in lineage.values())
    assert all(len(rec["input_files"]) == 2 for rec in lineage.values())

    full = rd.read_parquet(out).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(full) == n_rows

    # resume with everything done: no work
    info2 = run_resumable(input_dir, out, group_size=2, pages_dataset_fn=_synth_fn)
    assert info2["groups_run"] == []
    assert info2["groups_skipped"] == [0, 1]
    assert info2["counters"]["rows"] == n_rows  # totals from lineage, not rerun

    # simulate a crash mid-group-1: staging dir left behind, no lineage line
    lineage_path = os.path.join(out, LINEAGE_FILE)
    with open(lineage_path) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    with open(lineage_path, "w") as f:
        for r in recs:
            if r["group"] != 1:
                f.write(json.dumps(r) + "\n")
    os.rename(os.path.join(out, "group=00001"), os.path.join(out, "group=00001._tmp"))

    info3 = run_resumable(input_dir, out, group_size=2, pages_dataset_fn=_synth_fn)
    assert info3["groups_run"] == [1]
    assert info3["groups_skipped"] == [0]

    redone = rd.read_parquet(out).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(redone) == n_rows
    # byte-identical output after crash-redo (determinism + idempotence)
    assert (redone["url"] == full["url"]).all()
    assert (redone["scrubbed_text"] == full["scrubbed_text"]).all()
    assert (redone["keep"] == full["keep"]).all()


def test_resume_rejects_changed_input_set(ray_session, sharded_input, tmp_path):
    """A lineage group id is positional: resuming against a different file
    set or group_size must fail loudly, never silently skip wrong inputs."""
    from language_identification_ray.pipelines.checkpoint import run_resumable

    input_dir, _ = sharded_input
    out = str(tmp_path / "out")
    run_resumable(input_dir, out, group_size=2, pages_dataset_fn=_synth_fn)

    # same lineage, different group_size → group 0 maps to different files
    with pytest.raises(RuntimeError, match="lineage mismatch"):
        run_resumable(input_dir, out, group_size=1, pages_dataset_fn=_synth_fn)

    # same group_size, shrunk file set → also a mismatch
    import shutil

    subset = tmp_path / "subset"
    subset.mkdir()
    names = sorted(os.listdir(input_dir))
    for f in names[:2] + names[3:]:  # drop one middle fragment
        shutil.copy(os.path.join(input_dir, f), subset / f)
    with pytest.raises(RuntimeError, match="lineage mismatch"):
        run_resumable(str(subset), out, group_size=2, pages_dataset_fn=_synth_fn)


def test_counter_pool_aggregates_across_shards(ray_session):
    import ray

    from language_identification_ray.pipelines.checkpoint import CounterPool

    pool = CounterPool(n_shards=3)
    ray.get([sh.add.remote(rows=10, kept=7) for sh in pool.shards])
    snap = pool.snapshot()
    assert snap == {"rows": 30, "kept": 21}
    assert pool.reset() == {"rows": 30, "kept": 21}
    assert pool.snapshot() == {}


def test_dedup_cap_surfaces_in_counters(ray_session):
    """Truncated verification buckets must be observable as counter data."""
    import ray
    import ray.data as rd

    from language_identification_ray.pipelines.checkpoint import RunCounters
    from language_identification_ray.stages.dedup import minhash_lsh_pairs

    # 12 identical docs land in one bucket; max_bucket=8 forces a cap
    rows = [{"doc_id": i, "text": "alpha beta gamma delta epsilon zeta"} for i in range(12)]
    counters = RunCounters.remote()
    out = minhash_lsh_pairs(
        rd.from_items(rows), threshold=0.5, max_bucket=8, counters=counters
    ).to_pandas()
    snap = ray.get(counters.snapshot.remote())
    assert snap.get("minhash_lsh_pairs_capped_buckets", 0) >= 1
    assert snap.get("minhash_lsh_pairs_capped_rows", 0) >= 4
    # pairs among the first max_bucket ids still emitted
    assert len(out) > 0


def test_torn_trailing_lineage_line_is_ignored(tmp_path):
    from language_identification_ray.pipelines.checkpoint import (
        LINEAGE_FILE,
        completed_groups,
    )

    out = tmp_path / "out"
    out.mkdir()
    good = json.dumps({"group": 0, "input_files": ["a"], "counters": {}})
    with open(out / LINEAGE_FILE, "w") as f:
        f.write(good + "\n")
        f.write('{"group": 1, "input_fi')  # torn mid-append by a crash
    done = completed_groups(str(out))
    assert list(done) == [0]  # torn record ignored, resume still possible

    # a malformed NON-trailing line is real corruption: loud failure
    with open(out / LINEAGE_FILE, "w") as f:
        f.write('{"group": 0, bro\n')
        f.write(good + "\n")
    with pytest.raises(json.JSONDecodeError):
        completed_groups(str(out))


def test_resume_rejects_shrunk_input(ray_session, sharded_input, tmp_path):
    """Committed groups beyond the new group list mean the input shrank:
    their rows would silently pollute out_dir — must fail loudly."""
    from language_identification_ray.pipelines.checkpoint import run_resumable

    input_dir, _ = sharded_input
    out = str(tmp_path / "out")
    run_resumable(input_dir, out, group_size=2, pages_dataset_fn=_synth_fn)

    import shutil

    smaller = tmp_path / "smaller"
    smaller.mkdir()
    frags = sorted(os.listdir(input_dir))[:2]  # keep only group 0's files
    for f in frags:
        shutil.copy(os.path.join(input_dir, f), smaller / f)
    with pytest.raises(RuntimeError, match="shrank"):
        run_resumable(str(smaller), out, group_size=2, pages_dataset_fn=_synth_fn)


def test_lock_blocks_second_driver(tmp_path):
    from language_identification_ray.pipelines.checkpoint import _RunLock

    out = tmp_path / "out"
    out.mkdir()
    with _RunLock(str(out)):
        with pytest.raises(RuntimeError, match="another driver"):
            _RunLock(str(out)).__enter__()
    # released: can acquire again; a stale lock from a dead pid is taken over
    with open(out / "_LOCK", "w") as f:
        f.write("999999999")  # no such pid
    with _RunLock(str(out)):
        pass


def test_staging_dir_is_invisible_to_parquet_readers(ray_session, sharded_input, tmp_path):
    """A crashed group's staging dir must NOT leak rows into readers of
    out_dir (parquet discovery skips underscore-prefixed directories)."""
    import ray.data as rd

    from language_identification_ray.pipelines.checkpoint import run_resumable

    input_dir, n_rows = sharded_input
    out = str(tmp_path / "out")
    run_resumable(input_dir, out, group_size=2, pages_dataset_fn=_synth_fn)

    # simulate a crash: a half-written staging dir with real parquet inside
    import shutil

    staging = os.path.join(out, "_tmp_group=00007")
    shutil.copytree(os.path.join(out, "group=00000"), staging)
    assert len(rd.read_parquet(out).to_pandas()) == n_rows  # staging unseen
