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
PAGES_REPLICATION = int(os.environ.get("PAGES_REPLICATION", "40"))


def _pages_parquet(sf_dir: str, replication: int) -> tuple:
    """Materialize the replicated pages table to /tmp ONCE (cached across
    runs) and return (path, n_rows).

    The benchmark then measures the production shape — read_parquet(pages)
    → pipeline → write_parquet — with the synthetic-input prep excluded.
    Pages are documents replicated ``replication``× with offset doc_ids
    (distinct urls), written as one parquet file per copy so the read fans
    out."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from language_identification_ray.sources.pages import _synthesize_batch

    src_path = f"{sf_dir}/documents.parquet"
    meta = pq.ParquetFile(src_path)  # footer only — no data read on the cached path
    n_docs = meta.metadata.num_rows
    # cache key includes the SOURCE file identity: regenerated testdata must
    # invalidate the materialized pages, not silently serve stale ones
    st = os.stat(src_path)
    tag = f"{os.path.basename(os.path.normpath(sf_dir))}_{int(st.st_mtime)}_{st.st_size}"
    cache = f"/tmp/bench_pages_{tag}_x{replication}"
    done = os.path.join(cache, "_DONE")
    if not os.path.exists(done):
        src = pq.read_table(src_path)
        os.makedirs(cache, exist_ok=True)
        idx = src.schema.names.index("doc_id")
        base_ids = src["doc_id"].to_numpy()
        for r in range(replication):
            shifted = src.set_column(
                idx, "doc_id", pa.array(base_ids + r * n_docs, pa.int64())
            )
            pages = _synthesize_batch(shifted)
            pq.write_table(pages, os.path.join(cache, f"part-{r:04d}.parquet"))
        with open(done, "w") as f:
            f.write("ok")
    # warm the page cache: a cold first read of the just-materialized (or
    # session-old) parts costs 2-5x in the timed section on this host
    for name in os.listdir(cache):
        if name.endswith(".parquet"):
            with open(os.path.join(cache, name), "rb") as f:
                while f.read(1 << 22):
                    pass
    return cache, n_docs * replication


def _replicated_pages(sf_dir: str, replication: int):
    """Lazy Dataset over the materialized pages table (see _pages_parquet)."""
    import ray.data as rd

    path, n = _pages_parquet(sf_dir, replication)
    return rd.read_parquet(path), n


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

    # warm the page cache (untimed).  Actor-pool init CANNOT be pre-warmed:
    # Ray Data actor pools are per-execution, so the ~5 s model-load cost is
    # part of the timed window — the same cold start a production run pays
    pages, n_pages = _replicated_pages(SF_DIR, PAGES_REPLICATION)

    import shutil

    out_dir = "/tmp/bench_flagship_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    # fixed-size pool (autoscaling ramps too slowly for a short run) sized
    # to the node minus I/O headroom; full north-rule pipeline incl. the
    # perplexity LM stage
    # batch_size 1024: this sandbox charges ~0.2 s/MB of first-touch page
    # faults PER ACTOR on the numpy temporaries, so the one-time cold cost
    # scales with batch working set; 1024 also yields ~200 bundles per 200k
    # docs (≫ pool size, no idle actors).  Measured 3-5× faster end-to-end
    # than 4096 on this host.
    out = build(
        pages,
        langid_concurrency=max(2, NUM_CPUS - 2),
        batch_size=1024,
        with_perplexity=True,
    )
    # consume with the production sink: distributed parquet write (workers
    # materialize their own blocks).  Driver-side iter_batches would fault
    # the whole output through this sandbox's slow shared-memory path
    # single-threaded (~0.2 s/MB) and dominate the measurement.
    out.write_parquet(out_dir)
    headline_sec = time.time() - t0

    import pyarrow.dataset as pads

    written = pads.dataset(out_dir)
    n_rows = written.count_rows()
    n_kept = written.scanner(columns=["keep"]).to_table()["keep"].to_pandas().sum()
    assert n_rows == n_pages, (n_rows, n_pages)

    # individual oracle-backed queries (each consumed to completion);
    # skipped in --scaling subruns (the criterion is headline throughput)
    import __ray_entry__ as entrymod

    queries = {}
    if os.environ.get("BENCH_HEADLINE_ONLY") == "1":
        return {
            "metric": "flagship_pipeline_sec",
            "value": round(headline_sec, 3),
            "unit": "sec",
            "docs_per_sec": round(n_pages / headline_sec, 1),
            "n_docs": n_pages,
            "kept_frac": round(n_kept / max(n_rows, 1), 4),
            "queries": {},
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
        }
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            res = fn(SF_DIR)
            import ray.data as rd

            if isinstance(res, rd.Dataset):
                # consumption is where a lazy Dataset actually executes — a
                # swallowed exception here would record a crashing operator
                # as a fast successful time
                for _ in res.iter_batches(batch_size=8192):
                    pass
            queries[name] = round(time.time() - t0, 3)
        except Exception as e:
            print(f"QUERY FAILED {name}: {type(e).__name__}: {e}", file=sys.stderr)
            queries[name] = None

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


def _spin_worker(seconds: float) -> int:
    t_end = time.perf_counter() + seconds
    n = 0
    while time.perf_counter() < t_end:
        for _ in range(10_000):
            n += 1
    return n


def _spin_probe(seconds: float = 1.0, nworkers: int = 32) -> float:
    """Effective-parallelism probe: aggregate busy-loop rate of ``nworkers``
    processes over the single-process rate.  ~25-30x on a calm 32-vCPU
    host; hypervisor steal depresses the reading (the round-3 contended
    windows read 21.9-24.3x).  Attached to every scaling pair so sub-bar
    efficiencies are attributable (VERDICT r3 #7)."""
    import multiprocessing as mp

    single = _spin_worker(seconds) / seconds
    with mp.Pool(nworkers) as pool:
        counts = pool.map(_spin_worker, [seconds] * nworkers)
    return round((sum(counts) / seconds) / single, 1)


_CAMPAIGN_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "SCALING_CAMPAIGN.json"
)


def _append_campaign(row: dict) -> None:
    """Append one {efficiency, probe_before/mid/after, legs} row to the
    BASELINE.json-adjacent campaign artifact (a JSON array)."""
    rows = []
    if os.path.exists(_CAMPAIGN_FILE):
        try:
            with open(_CAMPAIGN_FILE) as f:
                rows = json.load(f)
        except (json.JSONDecodeError, OSError):
            rows = []
    rows.append(row)
    with open(_CAMPAIGN_FILE, "w") as f:
        json.dump(rows, f, indent=1)


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        # 8x the default corpus for the scaling pair: strong scaling needs
        # enough work to amortize session/actor-pool startup (~5 s) at 32
        # CPUs; the materialized input is cached across both subruns.
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            BENCH_HEADLINE_ONLY="1",
            PAGES_REPLICATION=str(PAGES_REPLICATION * 8),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # three widths by default (VERDICT r4 #6: a middle leg makes steal-skew
    # easier to reject — a genuine scaling curve is monotone across 8/16/32,
    # an asymmetric steal window breaks one pairwise efficiency only)
    widths = [
        int(w) for w in os.environ.get("SCALING_WIDTHS", "8,16,32").split(",")
    ]
    probes = [_spin_probe()]
    legs = {}
    for w in widths:
        legs[w] = one(w)
        probes.append(_spin_probe())
    lo, hi = widths[0], widths[-1]
    eff = (legs[lo]["value"] / legs[hi]["value"]) / (hi / lo)
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "probe_before": probes[0],
        "probe_mid": probes[len(probes) // 2],
        "probe_after": probes[-1],
        "probes": probes,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "sf": SF_DIR,
    }
    for w in widths:
        result[f"sec_{w}"] = legs[w]["value"]
        result[f"docs_per_sec_{w}"] = legs[w]["docs_per_sec"]
    for a, b in zip(widths, widths[1:]):
        result[f"eff_{a}_{b}"] = round(
            (legs[a]["value"] / legs[b]["value"]) / (b / a), 3
        )
    _append_campaign(result)
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_headline()
        # The driver captures only the TAIL of stdout and parses the FINAL
        # line as the run's JSON (BENCH_r02.json came back "parsed": null
        # because the 77-entry per-query map pushed the line past the
        # capture window).  Emit the full record on an EARLIER line and to a
        # sidecar file, then a compact headline-only object as the final
        # line so the flagship number is always parseable.
        print(json.dumps(result))
        if os.environ.get("BENCH_HEADLINE_ONLY") != "1":  # scaling subruns skip the sidecar
            try:
                with open(
                    os.path.join(
                        os.path.dirname(os.path.abspath(__file__)), "BENCH_QUERIES.json"
                    ),
                    "w",
                ) as f:
                    json.dump(result, f, indent=1)
            except OSError:
                pass
        compact = {k: v for k, v in result.items() if k != "queries"}
        compact["queries"] = {
            "n_timed": sum(v is not None for v in result["queries"].values()),
            "n_failed": sum(v is None for v in result["queries"].values()),
            "total_sec": round(
                sum(v for v in result["queries"].values() if v is not None), 3
            ),
        }
        compact["queries_file"] = "BENCH_QUERIES.json"
        print(json.dumps(compact))
        import ray

        ray.shutdown()
