"""Perplexity-scoring actor stage (the engine's KenLM-style scorer).

Holds a trained :class:`~language_identification_ray.functions.kneser_ney.KNModel`
per actor (loaded once in ``__init__`` — the Ray analogue of the reference's
module-global probability dict, ``modified_kneser_ney.py:521-577``) and adds
a ``perplexity`` column per batch.

Default model: the in-repo English asset trained deterministically from the
seed corpus by ``scripts/train_lm.py``.  Deployments train their own with
``pipelines.lm_train.train_kn`` and pass ``model_path``.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Optional

import pyarrow as pa

from language_identification_ray.functions.kneser_ney import KNModel
from language_identification_ray.stages.langid import set_or_append

_DEFAULT_MODEL = Path(__file__).resolve().parents[1] / "state" / "assets" / "kn_en.json"


class PerplexityScorer:
    """``ds.map_batches(PerplexityScorer, batch_format="pyarrow", concurrency=N)``"""

    def __init__(
        self,
        text_column: str = "text",
        model_path: Optional[str] = None,
        max_chars: int = 4000,
        per_language: bool = False,
        lang_column: str = "lang",
    ):
        from language_identification_ray.pipelines.lm_train import load_model

        self.model: KNModel = load_model(str(model_path or _DEFAULT_MODEL))
        self.text_column = text_column
        self.max_chars = max_chars
        self.lang_column = lang_column
        # per-language tables (kn_<lang>.json, trained by scripts/train_lm.py)
        # — each doc is scored under its DETECTED language's model, the
        # KenLM-per-language layout of production web pipelines; unknown
        # langs fall back to the default model
        self.per_lang: dict = {}
        if per_language:
            # sibling kn_<lang>.json files of the CALLER'S model path, not a
            # hardcoded asset dir — a deployment pointing at its own trained
            # models must not silently score under the repo's seed models
            from pathlib import Path

            base = Path(str(model_path or _DEFAULT_MODEL))
            for p in sorted(base.parent.glob("kn_*.json")):
                if p == base:
                    # the default model IS one of the kn_*.json siblings:
                    # reuse the loaded object instead of a duplicate parse +
                    # duplicate score-index arrays per actor
                    self.per_lang[p.stem[3:]] = self.model
                else:
                    self.per_lang[p.stem[3:]] = load_model(str(p))

    def __call__(self, batch: pa.Table, texts=None) -> pa.Table:
        if texts is None:
            texts = batch[self.text_column].to_pylist()
        texts = [(t or "")[: self.max_chars] for t in texts]
        if not self.per_lang or self.lang_column not in batch.schema.names:
            ppls = self.model.perplexity_batch(texts)
        else:
            langs = batch[self.lang_column].to_pylist()
            ppls = [0.0] * len(texts)
            groups: dict = {}
            for i, l in enumerate(langs):
                groups.setdefault(l if l in self.per_lang else None, []).append(i)
            for lang, idxs in groups.items():
                model = self.per_lang.get(lang, self.model)
                vals = model.perplexity_batch([texts[i] for i in idxs])
                for i, v in zip(idxs, vals):
                    ppls[i] = v
        out = [float(p) if not math.isnan(p) else None for p in ppls]
        return set_or_append(batch, "perplexity", pa.array(out, pa.float64()))
