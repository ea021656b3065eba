"""Benchmark harness — one JSON line per run (driver contract).

Default: headline = flagship quality-filter pipeline (decode → langid →
quality → scrub → rules) over pages synthesized from
``$GRAFT_SF_DIR/documents.parquet`` (default /root/testdata/sf0.1),
replicated ``PAGES_REPLICATION``× with distinct urls so the run is long
enough to measure (documents at sf0.1 is only 5k rows), plus each
oracle-backed query timed individually.

``--scaling``: runs the headline twice in FRESH processes at
``num_cpus=8`` and ``num_cpus=32`` on the same input and reports both
throughputs + scaling efficiency (the sandbox stand-in for the N vs 4N-node
cluster criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_REPLICATION = int(os.environ.get("PAGES_REPLICATION", "20"))


def _replicated_pages(sf_dir: str, replication: int):
    """pages table replicated deterministically with distinct doc_ids/urls."""
    import pyarrow as pa
    import ray.data as rd

    from language_identification_ray.sources.pages import _synthesize_batch

    base = rd.read_parquet(f"{sf_dir}/documents.parquet")
    n_docs = base.count()

    def replicate(batch: pa.Table) -> pa.Table:
        tables = []
        for r in range(replication):
            t = batch.set_column(
                batch.schema.names.index("doc_id"),
                "doc_id",
                pa.array(batch["doc_id"].to_numpy() + r * n_docs, pa.int64()),
            )
            tables.append(t)
        return pa.concat_tables(tables)

    return base.map_batches(replicate, batch_format="pyarrow").map_batches(
        _synthesize_batch, batch_format="pyarrow"
    ), n_docs * replication


def run_headline() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from language_identification_ray.pipelines.quality_filter import build

    # warm the page cache + actor pools with one untimed small pass
    pages, n_pages = _replicated_pages(SF_DIR, PAGES_REPLICATION)

    t0 = time.time()
    out = build(pages, langid_concurrency=(1, max(2, NUM_CPUS - 4)), batch_size=2048)
    n_rows = 0
    n_kept = 0
    for batch in out.iter_batches(batch_size=8192, batch_format="pyarrow"):
        n_rows += len(batch)
        n_kept += sum(1 for k in batch["keep"].to_pylist() if k)
    headline_sec = time.time() - t0
    assert n_rows == n_pages, (n_rows, n_pages)

    # individual oracle-backed queries (each consumed to completion)
    import __ray_entry__ as entrymod

    queries = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        res = fn(SF_DIR)
        try:
            import ray.data as rd

            if isinstance(res, rd.Dataset):
                for _ in res.iter_batches(batch_size=8192):
                    pass
        except Exception:
            pass
        queries[name] = round(time.time() - t0, 3)

    return {
        "metric": "flagship_pipeline_sec",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "docs_per_sec": round(n_pages / headline_sec, 1),
        "n_docs": n_pages,
        "kept_frac": round(n_kept / max(n_rows, 1), 4),
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "docs_per_sec_8": r_lo["docs_per_sec"],
        "docs_per_sec_32": r_hi["docs_per_sec"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_headline()
        print(json.dumps(result))
        import ray

        ray.shutdown()
