"""Norvig-style spelling corrector (reference carries the classic
implementation at ``pdfs/spellcheck/spell.py:17-64``; this is the same
published algorithm — Norvig, "How to Write a Spelling Corrector" — written
fresh): candidates at edit distance 0/1/2 ranked by corpus frequency.

Engine use: actor state for an optional normalization stage (A10 — not on
the keep/drop path)."""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterable, Optional, Set

_LETTERS = "abcdefghijklmnopqrstuvwxyz"


class SpellCorrector:
    def __init__(self, corpus_text: Optional[str] = None, word_counts: Optional[Counter] = None):
        if word_counts is not None:
            self.words = Counter(word_counts)
        elif corpus_text is not None:
            self.words = Counter(re.findall(r"\w+", corpus_text.lower()))
        else:
            raise ValueError("need corpus_text or word_counts")
        self.total = sum(self.words.values())

    def p(self, word: str) -> float:
        return self.words[word] / self.total if self.total else 0.0

    @staticmethod
    def edits1(word: str) -> Set[str]:
        splits = [(word[:i], word[i:]) for i in range(len(word) + 1)]
        deletes = {L + R[1:] for L, R in splits if R}
        transposes = {L + R[1] + R[0] + R[2:] for L, R in splits if len(R) > 1}
        replaces = {L + c + R[1:] for L, R in splits if R for c in _LETTERS}
        inserts = {L + c + R for L, R in splits for c in _LETTERS}
        return deletes | transposes | replaces | inserts

    def edits2(self, word: str) -> Iterable[str]:
        return (e2 for e1 in self.edits1(word) for e2 in self.edits1(e1))

    def known(self, words: Iterable[str]) -> Set[str]:
        return {w for w in words if w in self.words}

    def candidates(self, word: str) -> Set[str]:
        return (
            self.known([word])
            or self.known(self.edits1(word))
            or self.known(self.edits2(word))
            or {word}
        )

    def correction(self, word: str) -> str:
        if not word or not word.strip():
            # edits1('') would fabricate single-letter "corrections"
            return word
        return max(sorted(self.candidates(word)), key=self.p)
