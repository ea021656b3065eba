"""Compaction: a fragmented parquet directory is rewritten into few
target-sized files with no row loss or value drift."""

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from language_identification_ray.pipelines.maintenance import compact_parquet


def test_compact_parquet_merges_fragments(ray_session, tmp_path):
    frag = tmp_path / "frag"
    frag.mkdir()
    # 40 tiny fragments, 25 rows each
    for i in range(40):
        ids = list(range(i * 25, (i + 1) * 25))
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "v": pa.array([x * 2 for x in ids], pa.int64())}),
            frag / f"part-{i:03d}.parquet",
        )
    out = tmp_path / "compact"
    stats = compact_parquet(str(frag), str(out), target_bytes=1 << 30)

    assert stats["files_before"] == 40
    assert stats["files_after"] < 40 and stats["files_after"] >= 1
    assert stats["rows"] == 1000

    import pyarrow.dataset as pads

    a = pads.dataset(str(frag)).to_table().to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = pads.dataset(str(out)).to_table().to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_compact_parquet_respects_target_size(ray_session, tmp_path):
    frag = tmp_path / "frag2"
    frag.mkdir()
    for i in range(8):
        ids = list(range(i * 1000, (i + 1) * 1000))
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64())}), frag / f"p{i}.parquet"
        )
    total = sum(os.path.getsize(frag / f) for f in os.listdir(frag))
    out = tmp_path / "compact2"
    # target = half the input -> expect ~2 output files
    stats = compact_parquet(str(frag), str(out), target_bytes=max(1, total // 2))
    assert stats["files_after"] <= 4  # blocks may split, but far fewer than 8
    assert stats["rows"] == 8000


def test_cluster_write_produces_pruning_ranges(ray_session, tmp_path):
    """After clustering by n_chars, per-file [min,max] key ranges are
    near-disjoint (each file must NOT span the whole key range the way an
    unclustered write does)."""
    import numpy as np
    import ray.data as rd

    from language_identification_ray.pipelines.maintenance import cluster_write

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 10_000, size=20_000)
    src = tmp_path / "src"
    src.mkdir()
    # 8 unclustered fragments, each spanning the full key range
    for i in range(8):
        pq.write_table(
            pa.table({"doc_id": pa.array(range(i * 2500, (i + 1) * 2500), pa.int64()),
                      "n_chars": pa.array(vals[i * 2500:(i + 1) * 2500], pa.int64())}),
            src / f"p{i}.parquet",
        )
    out = tmp_path / "clustered"
    stats = cluster_write(rd.read_parquet(str(src)), str(out), key="n_chars")
    assert stats["files"] >= 2
    rngs = sorted(stats["ranges"], key=lambda r: r["min"])
    full = 10_000
    for r in rngs:
        assert (r["max"] - r["min"]) < full * 0.8  # no file spans the whole range
    # consecutive files overlap at most at the boundary value
    for a, b in zip(rngs, rngs[1:]):
        assert b["min"] >= a["max"] - 1
    # row preservation
    import pyarrow.dataset as pads

    assert pads.dataset(str(out)).count_rows() == 20_000


def test_zorder_write_prunes_both_predicates(ray_session, tmp_path, sf_dir):
    """Z-order layout: a two-predicate range scan must read strictly fewer
    files than the layout holds, and the pruned answer must equal the
    unpruned full-scan answer (pruning skips work, never rows)."""
    import pyarrow.parquet as pq
    from language_identification_ray.pipelines.maintenance import (
        zorder_pruned_scan,
        zorder_write,
    )

    src = f"{sf_dir}/documents.parquet"
    out = str(tmp_path / "zorder")
    layout = zorder_write(src, out, n_files=8)
    assert layout["files"] > 1

    ds, files_read, files_total = zorder_pruned_scan(
        layout, "n_chars", "lang", 200, 400, "en"
    )
    assert files_total == layout["files"]
    assert 0 < files_read < files_total, (files_read, files_total)

    got = sorted(r["doc_id"] for r in ds.take_all())
    t = pq.read_table(src, columns=["doc_id", "lang", "n_chars"]).to_pandas()
    want = sorted(
        t[(t["lang"] == "en") & (t["n_chars"] >= 200) & (t["n_chars"] <= 400)][
            "doc_id"
        ]
    )
    assert got == want


def test_zorder_same_input_same_layout(ray_session, tmp_path, sf_dir):
    """Deterministic re-cluster: same table -> same per-file key ranges."""
    from language_identification_ray.pipelines.maintenance import zorder_write

    src = f"{sf_dir}/documents.parquet"
    a = zorder_write(src, str(tmp_path / "za"), n_files=4)
    b = zorder_write(src, str(tmp_path / "zb"), n_files=4)
    ka = [(e["num_min"], e["num_max"], sorted(e["cat_codes"])) for e in a["layout"]]
    kb = [(e["num_min"], e["num_max"], sorted(e["cat_codes"])) for e in b["layout"]]
    assert ka == kb
