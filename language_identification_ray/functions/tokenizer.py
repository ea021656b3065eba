"""Vectorized Unicode tokenization over Arrow/numpy batches.

Semantics follow the reference tokenizer (reference ``tokenizer.py:148-178``:
word chars = Unicode categories L* + M*; whitespace = Unicode spaces;
everything else — punctuation, symbols, digits-as-separate-class, and
unprintables — is a token boundary) but the implementation is batch-first:
texts in a batch are joined into one codepoint array, classified with a single
dense-table gather, and word boundaries come from one vectorized diff — no
per-character Python loop (the reference walks chars one at a time,
``tokenizer.py:254-347``; that is GIL-bound and does not scale).

Digits: the reference's ``is_word_char`` excludes Nd/Nl/No, so ``unicode61``-
style words never contain digits; we match that (class 3 is a boundary).
"""

from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import numpy as np

from language_identification_ray.state.scripts import load_chartables

# char classes baked by scripts/gen_chartables.py
CLS_PUNCT = 0
CLS_WORD = 1
CLS_SPACE = 2
CLS_DIGIT = 3
CLS_UNPRINTABLE = 4


def codepoints(text: str) -> np.ndarray:
    """str → uint32 codepoint array (zero-copy-ish via UTF-32 encode)."""
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def classify(text: str) -> np.ndarray:
    charclass, _ = load_chartables()
    return charclass[codepoints(text)]


class BatchTokens:
    """All word-token boundaries for a batch of texts, computed vectorized.

    Joins the batch into one buffer (separator = '\\n', class SPACE), gathers
    char classes in one shot, and exposes per-document word slices.
    """

    __slots__ = ("joined", "doc_offsets", "word_starts", "word_ends", "word_doc", "cls", "cps", "n_docs")

    def __init__(self, texts: Sequence[str]):
        n = len(texts)
        self.n_docs = n
        joined = "\n".join(texts) if n else ""
        self.joined = joined
        cps = codepoints(joined)
        charclass, _ = load_chartables()
        cls = charclass[cps] if len(cps) else np.empty(0, dtype=np.uint8)
        self.cps = cps
        self.cls = cls

        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
        # start offset of each doc inside `joined` (separator adds +1)
        self.doc_offsets = np.concatenate([[0], np.cumsum(lens + 1)])  # len n+1; last = len+1

        is_word = cls == CLS_WORD
        if len(cls):
            prev = np.concatenate([[False], is_word[:-1]])
            nxt = np.concatenate([is_word[1:], [False]])
            starts = np.flatnonzero(is_word & ~prev)
            ends = np.flatnonzero(is_word & ~nxt) + 1
        else:
            starts = np.empty(0, dtype=np.int64)
            ends = np.empty(0, dtype=np.int64)
        self.word_starts = starts
        self.word_ends = ends
        # doc id per word: searchsorted the word start into doc offsets
        self.word_doc = np.searchsorted(self.doc_offsets[1:], starts, side="right") if n else starts

    def words_per_doc(self) -> np.ndarray:
        """int64[n_docs] — number of word tokens per document."""
        return np.bincount(self.word_doc, minlength=self.n_docs).astype(np.int64)

    def word_char_count_per_doc(self) -> np.ndarray:
        """total word-token chars per document."""
        lengths = self.word_ends - self.word_starts
        return np.bincount(self.word_doc, weights=lengths, minlength=self.n_docs).astype(np.int64)

    def class_counts_per_doc(self) -> np.ndarray:
        """int64[n_docs, 5] — count of each char class per document.

        Separator chars ('\\n' between docs) are attributed to the *following*
        doc's space count; call sites that care subtract one, but for ratios
        over large docs the off-by-one is irrelevant — we instead exclude them
        exactly by masking the separator positions.
        """
        n = self.n_docs
        if n == 0:
            return np.zeros((0, 5), dtype=np.int64)
        doc_of_char = np.searchsorted(self.doc_offsets[1:], np.arange(len(self.cls)), side="right")
        # mask separators (the char AT doc_offsets[1:]-1 for docs 0..n-2)
        mask = np.ones(len(self.cls), dtype=bool)
        sep_pos = self.doc_offsets[1:-1] - 1
        mask[sep_pos] = False
        key = doc_of_char[mask] * 5 + self.cls[mask]
        flat = np.bincount(key, minlength=n * 5)
        return flat.reshape(n, 5).astype(np.int64)

    def iter_doc_words(self) -> Iterator[Tuple[int, List[str]]]:
        """Yield (doc_idx, [word, ...]) materializing word strings per doc."""
        joined = self.joined
        starts, ends, docs = self.word_starts, self.word_ends, self.word_doc
        i, m = 0, len(starts)
        for d in range(self.n_docs):
            words = []
            while i < m and docs[i] == d:
                words.append(joined[starts[i] : ends[i]])
                i += 1
            yield d, words

    def doc_words(self, d: int) -> List[str]:
        sel = np.flatnonzero(self.word_doc == d)
        return [self.joined[self.word_starts[i] : self.word_ends[i]] for i in sel]


def tokenize(text: str, words_only: bool = True) -> List[str]:
    """Single-document tokenize, matching reference ``unicode_tokenize``
    (``tokenizer.py:350-395``) for the words_only path: maximal runs of
    word chars.  With words_only=False also returns the runs of every other
    class (spaces are runs; each punct/digit char is part of its run)."""
    cls = classify(text)
    if not len(cls):
        return []
    change = np.flatnonzero(np.concatenate([[True], cls[1:] != cls[:-1]]))
    bounds = np.concatenate([change, [len(cls)]])
    out = []
    for i in range(len(change)):
        s, e = bounds[i], bounds[i + 1]
        if words_only and cls[s] != CLS_WORD:
            continue
        out.append(text[s:e])
    return out


def sentence_split(text: str) -> List[str]:
    """Good-enough sentence splitting, per the reference heuristic
    (``tokenizer.py:398-466``): split on newlines into paragraphs, then end a
    sentence when closing punctuation ('.', '!', '?', '…', '。', '！', '？')
    is followed by whitespace.  ``192.168.1.1`` stays one sentence because the
    digit after '.' un-closes it (no whitespace follows the dot)."""
    closers = ".!?…。！？"
    out: List[str] = []
    for para in text.split("\n"):
        para = para.strip()
        if not para:
            continue
        start = 0
        closed = False
        for i, ch in enumerate(para):
            if closed and ch.isspace():
                seg = para[start:i].strip()
                if seg:
                    out.append(seg)
                start = i
                closed = False
            else:
                closed = ch in closers
        seg = para[start:].strip()
        if seg:
            out.append(seg)
    return out


def char_ngrams(text: str, n: int = 2) -> List[str]:
    """char n-grams by slicing (reference ``tokenizer.py:469-474``)."""
    return [text[i : i + n] for i in range(len(text) - n + 1)]


def word_ngrams(words: Sequence[str], n: int) -> Iterator[Tuple[str, ...]]:
    """word n-grams over an already-tokenized word list
    (reference ``tokenizer.py:477-505`` semantics, minus re-tokenization)."""
    return zip(*[words[i:] for i in range(n)])
