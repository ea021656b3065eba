"""Keep/drop rule fusion — the quality-filter decision.

Gopher/C4-style heuristic thresholds over the ``q_*`` stats + langid
confidence + PII/toxicity counts.  Fully vectorized (numpy boolean masks);
the FIRST failing rule (in the declared order) becomes ``drop_reason`` —
deterministic and auditable.  Threshold provenance: Rae et al. 2021 (Gopher)
§A1.1 and Raffel et al. 2020 (C4) §2.2, adapted to the reference's own
design notes (reference README.md:128-153: gibberish/boilerplate/repetition
heuristics).

The rule registry is the engine's user-extension surface (the analogue of
the reference's detector-wrapper plug-in contract, SURVEY.md §2.10): each
rule is ``(name, required_columns, fn(batch) -> bool-mask-of-drops)`` and
callers may pass a custom list.  A rule whose REQUIRED COLUMNS are absent
from the batch is skipped (pipeline variants run without some stages); any
error the rule itself raises propagates — a silently disabled rule would
ship documents it should drop.  Legacy 2-tuples ``(name, fn)`` are still
accepted and fall back to skip-on-KeyError.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from language_identification_ray.stages.langid import set_or_append

# (name, required_columns, fn); legacy (name, fn) also accepted
Rule = Tuple


def _col(batch: pa.Table, name: str) -> np.ndarray:
    return batch[name].to_numpy(zero_copy_only=False)


DEFAULT_RULES: List[Rule] = [
    ("empty", ("q_n_words",), lambda b: _col(b, "q_n_words") == 0),
    ("too_short", ("q_n_words",), lambda b: _col(b, "q_n_words") < 5),
    ("mean_word_len", ("q_mean_word_len",),
     lambda b: (_col(b, "q_mean_word_len") < 2.0) | (_col(b, "q_mean_word_len") > 12.0)),
    ("symbol_ratio", ("q_symbol_word_ratio",), lambda b: _col(b, "q_symbol_word_ratio") > 1.5),
    ("digit_ratio", ("q_digit_ratio",), lambda b: _col(b, "q_digit_ratio") > 0.3),
    ("repetition", ("q_dup_ngram_frac",), lambda b: _col(b, "q_dup_ngram_frac") > 0.30),
    # gated on q_stopword_known: a detected language with no stopword table
    # (Arabic, Korean, Hindi, ...) can never score a hit, so zero hits there
    # is "unsupported", not "gibberish" — without the gate this rule deleted
    # every ≥20-word document in such languages from the corpus
    ("stopword", ("q_stopword_hits", "q_n_words", "q_stopword_known"),
     lambda b: (_col(b, "q_stopword_hits") < 1) & (_col(b, "q_n_words") >= 20)
     & _col(b, "q_stopword_known")),
    ("low_lang_conf", ("lang_conf",), lambda b: _col(b, "lang_conf") < 0.20),
    # nan_to_num: a NULL count (rules applied to a parquet-sourced table
    # rather than live Scrubber output) means "not counted" → 0, not the
    # undefined NaN→int64 cast (INT64_MIN + a RuntimeWarning per batch)
    ("toxicity", ("pii_slurs",),
     lambda b: np.nan_to_num(_col(b, "pii_slurs").astype(np.float64)) >= 3),
    # perplexity band (north_rule): wildly out-of-model text is dropped;
    # NaN (unscoreable) compares False → kept.  Skipped when the pipeline
    # variant runs without the LM stage (column absent).
    ("perplexity", ("perplexity",), lambda b: _col(b, "perplexity") > 1.0e5),
]


class KeepDropRules:
    """``ds.map_batches(KeepDropRules, batch_format="pyarrow")`` — adds
    ``keep: bool`` and ``drop_reason: string`` ('' when kept)."""

    def __init__(self, rules: Optional[Sequence[Rule]] = None):
        self.rules = list(rules) if rules is not None else list(DEFAULT_RULES)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        drop_reason = np.full(n, "", dtype=object)
        dropped = np.zeros(n, dtype=bool)
        names = set(batch.schema.names)
        for rule in self.rules:
            if len(rule) == 3:
                name, requires, fn = rule
                if any(c not in names for c in requires):
                    continue  # pipeline variant without this stage's columns
                mask = np.asarray(fn(batch), dtype=bool)  # rule errors propagate
            else:  # legacy (name, fn): no declared columns, skip on KeyError
                name, fn = rule
                try:
                    mask = np.asarray(fn(batch), dtype=bool)
                except KeyError:
                    continue
            newly = mask & ~dropped
            drop_reason[newly] = name
            dropped |= mask
        batch = set_or_append(batch, "keep", pa.array(~dropped))
        return set_or_append(batch, "drop_reason", pa.array(drop_reason.tolist(), pa.string()))
