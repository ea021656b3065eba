"""JSONL source/sink round-trip: documents parquet -> JSONL -> back, value-
and schema-preserving (modulo JSON's int/float unification, which the
documents schema avoids: int64 ids/counts + strings survive exactly)."""

import os
import sys

import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from language_identification_ray.sources.jsonl import (
    jsonl_to_parquet,
    read_jsonl_docs,
    write_jsonl_docs,
)

def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "text", "lang", "source", "n_chars"]
    ]


def test_jsonl_roundtrip_preserves_documents(ray_session, sf_dir, tmp_path):
    import ray.data as rd

    src = rd.read_parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl_docs(src, out)
    assert any(n.endswith(".json") for n in os.listdir(out))

    back = read_jsonl_docs(out)
    a = _canon(src.to_pandas())
    b = _canon(back.to_pandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=True)


def test_jsonl_to_parquet_boundary(ray_session, sf_dir, tmp_path):
    import ray.data as rd

    jl = str(tmp_path / "jl")
    pqdir = str(tmp_path / "pq")
    rd.read_parquet(f"{sf_dir}/documents.parquet").write_json(jl)
    jsonl_to_parquet(jl, pqdir)
    import pyarrow.dataset as pads

    n_src = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert pads.dataset(pqdir).count_rows() == n_src
    # column pruning is back after the boundary conversion
    cols = rd.read_parquet(pqdir, columns=["doc_id"]).schema().names
    assert cols == ["doc_id"]
