"""JSONL document source / sink — the interchange format most web-corpus
releases use (one JSON object per line: Dolma, RedPajama, fineweb dumps all
ship this way alongside parquet).

Thin, Ray-Data-native wrappers:

  * ``read_jsonl_docs``  — ``ray.data.read_json``: each worker parses its own
    files (Arrow's JSON reader, block-parallel), nothing funnels through the
    driver.
  * ``write_jsonl_docs`` — one newline-delimited ``.json`` file per block
    via ``Dataset.write_json`` (Ray's writer names them ``*.json``): the
    distributed sink mirror, resumable at file granularity like the parquet
    writers.

Scale note: JSONL is ~3-6x the bytes of the same table as parquet and loses
column pruning (every read parses whole records), so the engine treats it as
an INGEST/EGRESS format only — pipelines convert to parquet at the boundary
(``jsonl_to_parquet``) and operate on parquet internally.
"""

from __future__ import annotations

import ray.data as rd


def read_jsonl_docs(path: str) -> "rd.Dataset":
    """Documents table from JSONL file(s) (file or directory path)."""
    return rd.read_json(path)


def write_jsonl_docs(ds: "rd.Dataset", out_dir: str) -> None:
    """Distributed JSONL sink: one file per block, written by the workers."""
    ds.write_json(out_dir)


def jsonl_to_parquet(path: str, out_dir: str) -> None:
    """Boundary conversion: land JSONL as parquet once, then every downstream
    read gets column pruning + row-group predicate pushdown back."""
    rd.read_json(path).write_parquet(out_dir)
