"""Quality-statistics stage: Gopher/C4-style per-document signals.

Computes, per document (vectorized over the batch via
:class:`~language_identification_ray.functions.tokenizer.BatchTokens` — one
numpy classification pass for the whole batch):

  * n_words, n_sentences, mean_word_len
  * symbol_word_ratio  (punct+symbol chars / words; reference README design
    notes on gibberish filtering, README.md:128-153)
  * digit_ratio        (digit chars / non-space chars)
  * stopword_ratio + stopword_hits (per detected language; the reference uses
    stopwords-iso for its wordlist jobs, merge_wordlists.ipynb cell 2)
  * max_line_frac      (longest line / total chars — boilerplate/nav signal)
  * dup_ngram_frac     (fraction of word 3-grams that are repeats — the
    repetition dedup signal specified in reference README.md:149-153)

Emitted as flat ``q_*`` float/int columns (flat > struct for Parquet
predicate pushdown at 100 TB; the final output assembles the ``quality``
struct per the BASELINE output schema).

Stateful only for the broadcast stopword tables → runs as an actor pool.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa

from language_identification_ray.functions.tokenizer import (
    BatchTokens,
    CLS_DIGIT,
    CLS_PUNCT,
    CLS_SPACE,
)
from language_identification_ray.stages.langid import set_or_append
from language_identification_ray.state.stopwords import STOPWORDS

_SENTENCE_ENDERS = (".", "!", "?", "…", "。", "！", "？")

# sentence counting: runs of enders count ONCE ("..." is one boundary) and a
# '.' between digits (decimals, versions, IPs) is not an ender — the same
# no-close-on-digit heuristic as functions.tokenizer.sentence_split
_RE_DECIMAL_DOT = re.compile(r"(?<=\d)\.(?=\d)")
_RE_SENT_RUN = re.compile("[" + re.escape("".join(_SENTENCE_ENDERS)) + "]+")


def _count_sentences(text: str) -> int:
    return len(_RE_SENT_RUN.findall(_RE_DECIMAL_DOT.sub("", text)))



class QualityStats:
    """``ds.map_batches(QualityStats, batch_format="pyarrow", concurrency=N)``"""

    def __init__(self, text_column: str = "text", lang_column: str = "lang"):
        self.text_column = text_column
        self.lang_column = lang_column
        self.stopwords = STOPWORDS
        # union set as the fallback when lang is unknown/unsupported
        self.stop_union = frozenset().union(*STOPWORDS.values())

    def __call__(self, batch: pa.Table, texts=None, bt=None) -> pa.Table:
        if texts is None:
            texts = [t or "" for t in batch[self.text_column].to_pylist()]
        langs = (
            batch[self.lang_column].to_pylist()
            if self.lang_column in batch.schema.names
            else [None] * len(texts)
        )
        n = len(texts)
        if bt is None:
            bt = BatchTokens(texts)

        n_words = bt.words_per_doc()
        word_chars = bt.word_char_count_per_doc()
        cls_counts = bt.class_counts_per_doc()  # [n, 5]
        n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)

        mean_word_len = np.divide(
            word_chars, n_words, out=np.zeros(n, dtype=np.float64), where=n_words > 0
        )
        symbol_word_ratio = np.divide(
            cls_counts[:, CLS_PUNCT],
            n_words,
            out=np.zeros(n, dtype=np.float64),
            where=n_words > 0,
        )
        non_space = n_chars - cls_counts[:, CLS_SPACE]
        digit_ratio = np.divide(
            cls_counts[:, CLS_DIGIT],
            non_space,
            out=np.zeros(n, dtype=np.float64),
            where=non_space > 0,
        )

        stopword_hits = np.zeros(n, dtype=np.int64)
        stopword_ratio = np.zeros(n, dtype=np.float64)
        dup_ngram_frac = np.zeros(n, dtype=np.float64)
        # languages without a stopword table can never hit the union
        # fallback (it holds only Latin/Cyrillic/Greek-script words), so the
        # stopword RULE must know the count is unsupported rather than zero —
        # otherwise every ≥20-word Arabic/Korean/Hindi/... doc is dropped
        stopword_known = np.array([bool(self.stopwords.get(l)) for l in langs], dtype=bool)
        for d, words in bt.iter_doc_words():
            if not words:
                continue
            stop = self.stopwords.get(langs[d]) or self.stop_union
            lowered = [w.lower() for w in words]
            hits = sum(1 for w in lowered if w in stop)
            stopword_hits[d] = hits
            stopword_ratio[d] = hits / len(words)
            if len(lowered) >= 3:
                grams = Counter(zip(lowered, lowered[1:], lowered[2:]))
                total = len(lowered) - 2
                dup = total - len(grams)
                dup_ngram_frac[d] = dup / total

        n_sentences = np.zeros(n, dtype=np.int64)
        max_line_frac = np.zeros(n, dtype=np.float64)
        for d, t in enumerate(texts):
            if not t:
                continue
            n_sentences[d] = max(_count_sentences(t), 1 if n_words[d] else 0)
            if "\n" in t:
                longest = max(len(line) for line in t.split("\n"))
                max_line_frac[d] = longest / len(t)
            else:
                max_line_frac[d] = 1.0 if len(t) else 0.0

        for name, arr, typ in [
            ("q_n_words", n_words, pa.int64()),
            ("q_n_chars", n_chars, pa.int64()),
            ("q_n_sentences", n_sentences, pa.int64()),
            ("q_mean_word_len", mean_word_len, pa.float64()),
            ("q_symbol_word_ratio", symbol_word_ratio, pa.float64()),
            ("q_digit_ratio", digit_ratio, pa.float64()),
            ("q_stopword_hits", stopword_hits, pa.int64()),
            ("q_stopword_ratio", stopword_ratio, pa.float64()),
            ("q_stopword_known", stopword_known, pa.bool_()),
            ("q_max_line_frac", max_line_frac, pa.float64()),
            ("q_dup_ngram_frac", dup_ngram_frac, pa.float64()),
        ]:
            batch = set_or_append(batch, name, pa.array(arr, typ))
        return batch
