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
