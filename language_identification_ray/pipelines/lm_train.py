"""Distributed Kneser–Ney LM training (reference G1–G3 as Ray groupbys).

    corpus Dataset (text column)
      → map_batches(partial n-gram counts)      # combiner: one row per
                                                #   distinct ngram per batch
      → groupby(ngram).sum(cnt)                 # the only shuffle; moves
                                                #   distinct ngrams, not tokens
      → driver-side KN estimation               # tables are tiny after agg

The estimation step (discounts, continuation counts, interpolation) is exact
and runs on the aggregated counts — the same split the reference's notebook
jobs use (Counter fold then closed-form math, ``modified_kneser_ney.py:158-272``).
"""

from __future__ import annotations

import json
from collections import Counter
from pathlib import Path

import pyarrow as pa

import ray.data as rd

from language_identification_ray.functions.kneser_ney import (
    KNModel,
    count_ngrams,
    estimate,
    lm_sentences,
)

_SEP = "\x1f"


def train_kn(
    corpus: "rd.Dataset",
    text_column: str = "text",
    order: int = 3,
    max_types: int = 50_000_000,
) -> KNModel:
    """Train an order-n KN model over a corpus Dataset.

    The counting fans out (per-batch Counter partials → one grouped sum,
    the distributed part), but KN ESTIMATION is inherently whole-table:
    the discount statistics and continuation counts need every surviving
    n-gram type, so the aggregated types are collected to the driver.
    ``max_types`` bounds that collect — at web scale distinct trigram
    types run to billions, and the right move is vocabulary pruning
    UPSTREAM (token-level cutoff before counting), not count-threshold
    pruning here: dropping low-count grams after the fact breaks the
    BOS-padding denominator invariant (see ``kneser_ney.estimate``'s
    NOTE)."""

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_column].to_pylist():
            c.update(count_ngrams(lm_sentences(t or ""), order))
        if not c:
            return pa.table({"ngram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
        keys, vals = zip(*((_SEP.join(g), n) for g, n in c.items()))
        return pa.table({"ngram": pa.array(keys, pa.string()), "cnt": pa.array(vals, pa.int64())})

    from ray.data.aggregate import Sum

    agg = (
        corpus.map_batches(partial, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    counts = {}
    for batch in agg.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for k, v in zip(batch["ngram"].to_pylist(), batch["cnt"].to_pylist()):
            counts[tuple(k.split(_SEP))] = int(v)
        if len(counts) > max_types:
            raise MemoryError(
                f"train_kn: > {max_types:,} distinct n-gram types — the "
                "driver-side KN estimation would exhaust memory.  Prune the "
                "vocabulary upstream (token cutoff before counting) or raise "
                "max_types deliberately."
            )
    return estimate(counts, order)


def save_model(model: KNModel, path: str) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(model.to_flat(), f)


def load_model(path: str) -> KNModel:
    with open(path) as f:
        return KNModel.from_flat(json.load(f))
