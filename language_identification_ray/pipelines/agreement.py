"""Multi-detector agreement harness — the reference's comparison workflow
(``language_identification_test.py:70-78``: run every detector on the same
cleaned text, compare rankings) as a Ray pipeline.

Each detector scores the SAME cleaned text (the shared-preprocessing
contract, ``preprocessing.py:16-27``); output is one row per document with
every detector's top-1 + a majority vote — the ensemble/vote composition the
reference sketches at ``language_identification_test.py:25-68``.
"""

from __future__ import annotations

from collections import Counter
from typing import Optional, Sequence

import pyarrow as pa

import ray.data as rd

from language_identification_ray.functions.textnorm import clean_text
from language_identification_ray.state.stopwords import STOPWORDS


class AgreementScorer:
    """Actor stage: every detector loaded once, scored per batch."""

    def __init__(self, text_column: str = "text", language_codes: Optional[Sequence[str]] = None):
        from language_identification_ray.stages.langid import (
            EnsembleDetector,
            NgramDetector,
            ScriptDetector,
        )
        from language_identification_ray.state.dictionary import DictionaryDetector

        self.text_column = text_column
        self.language_codes = list(language_codes) if language_codes else None
        self.detectors = {
            "ensemble": EnsembleDetector(),
            "ngram": NgramDetector(),
            "script": ScriptDetector(),
            "dictionary": DictionaryDetector({l: list(ws) for l, ws in STOPWORDS.items()}),
        }
        # widen the panel with any third-party wheels present on this
        # machine (fastText/langid.py/langdetect/cld2 adapters, A2-A5) —
        # none exist in this container, so this is a no-op here
        from language_identification_ray.stages.external_detectors import (
            available_external_detectors,
        )

        self.detectors.update(available_external_detectors())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [clean_text(t or "") for t in batch[self.text_column].to_pylist()]
        cols = {}
        tops = {}
        for name, det in self.detectors.items():
            rankings = det.predict_batch(texts, self.language_codes)
            tops[name] = [r[0][0] if r else "und" for r in rankings]
            cols[f"lang_{name}"] = pa.array(tops[name], pa.string())
        votes, agreement = [], []
        n_det = len(self.detectors)
        for i in range(len(texts)):
            c = Counter(tops[name][i] for name in self.detectors if tops[name][i] != "und")
            if c:
                winner, count = c.most_common(1)[0]
                votes.append(winner)
                agreement.append(count / n_det)
            else:
                votes.append("und")
                agreement.append(0.0)
        out = batch
        from language_identification_ray.stages.langid import set_or_append

        for name, arr in cols.items():
            out = set_or_append(out, name, arr)
        out = set_or_append(out, "lang_vote", pa.array(votes, pa.string()))
        return set_or_append(out, "vote_agreement", pa.array(agreement, pa.float64()))


def detector_agreement(sf_dir: str) -> "rd.Dataset":
    """Agreement harness over the documents table (rows-only check)."""
    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        # min-2 pool: detector init is ~2.6 s/actor, so eager-starting two
        # actors halves wall time on small inputs vs autoscale-from-1
        .map_batches(AgreementScorer, batch_format="pyarrow", batch_size=256, concurrency=(2, 4))
        # keep EVERY lang_* vote column (wheel-gated external detectors add
        # theirs when installed) — a vote_agreement must be explainable from
        # the visible columns; a fixed select hid external votes that still
        # counted in the fraction
        .map_batches(
            lambda t: t.select(
                ["doc_id"]
                + sorted(c for c in t.schema.names if c.startswith("lang_") and c != "lang_vote")
                + ["lang_vote", "vote_agreement"]
            ),
            batch_format="pyarrow",
        )
    )
