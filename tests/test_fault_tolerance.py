"""Fault-injection: the engine's scale story leans on Ray's task retry
(SURVEY §4.1 'stragglers/retries' row — lineage re-execution is PROVIDED by
Ray).  These tests actually kill a worker mid-pipeline (os._exit — a system
failure, not a user exception) and assert the pipeline completes with
correct results after transparent rescheduling."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest


def test_map_task_survives_worker_crash(ray_session, tmp_path, sf_dir):
    """One map task hard-kills its worker on first execution; Ray retries
    the task and the job completes with the exact row count and sum."""
    import ray.data as rd

    marker = str(tmp_path / "crashed_once")

    def udf(batch: pa.Table) -> pa.Table:
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
                f.flush()
                os.fsync(f.fileno())
            os._exit(1)  # simulate machine/worker loss (system failure)
        return pa.table(
            {"doc_id": batch["doc_id"], "n": pc.utf8_length(pc.fill_null(batch["text"], ""))}
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(udf, batch_format="pyarrow")
    got = ds.count()

    import pyarrow.parquet as pq

    want = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert got == want
    assert os.path.exists(marker)  # the crash really happened


def test_groupby_survives_worker_crash(ray_session, tmp_path, sf_dir):
    """A crash inside the pre-aggregation stage of a keyed exchange must
    not lose or duplicate partial counts after retry."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    marker = str(tmp_path / "crashed_once_gb")

    def partial(batch: pa.Table) -> pa.Table:
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
                f.flush()
                os.fsync(f.fileno())
            os._exit(1)
        return pa.table(
            {
                "lang": pc.fill_null(batch["lang"], ""),
                "one": pa.array([1] * batch.num_rows, pa.int64()),
            }
        )

    rows = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("one", alias_name="n"))
    ).take_all()

    import pyarrow.parquet as pq

    want = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert sum(r["n"] for r in rows) == want
    assert os.path.exists(marker)
