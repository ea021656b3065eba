"""Fuzzy word index — positional-n-gram lookup with EMD scoring.

Re-expression of the reference's ApproxWordList3 contract
(``dictionary_langid/datatypes.py:477-617``): words are indexed by their
char n-grams (START/END sentinels for n>1) with *normalized positions*;
a query scores candidates by how little its n-gram positions must move to
match (1-D EMD), normalized per order, power-mean-averaged across orders;
the ranked cut keeps scores ≥ 0.9×top plus an edit-distance-≤1 rescue.

Used as actor state for spell-dedup / near-match auxiliary stages (built
once per actor from a broadcast wordlist in ``__init__``).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Tuple, Union

from language_identification_ray.functions.strings import (
    damerau_levenshtein,
    emd_1d,
    levenshtein,
)

_STX = "\2"
_ETX = "\3"


def _positional_ngrams(word: str, n: int) -> Dict[str, Tuple[float, ...]]:
    """n-gram → normalized positions (idx / (count-1)) with sentinels for n>1."""
    if n > 1:
        padded = f"{_STX}{word}{_ETX}"
        grams = [padded[i : i + n] for i in range(len(padded) - n + 1)]
    else:
        grams = list(word)
    locs: Dict[str, List[float]] = defaultdict(list)
    if len(grams) > 1:
        denom = len(grams) - 1
        for i, g in enumerate(grams):
            locs[g].append(i / denom)
    elif grams:
        locs[grams[0]].append(0.0)
    return {g: tuple(v) for g, v in locs.items()}


class ApproxWordList1:
    """The reference's first fuzzy-index variant — n-gram COUNT vectors
    scored by cosine similarity (reference ``datatypes.py:693-749``), no
    positions and no EMD:

    * grams come from the literally ``^``/``$``-padded word for EVERY
      order (including n=1, where the pad chars themselves become grams);
    * each word's per-order gram-count vector is L2-normalized at ADD time
      and stored inverted (gram → [(word_idx, norm_count)]), so a lookup
      accumulates the cosine directly from the posting lists;
    * per-order cosines are power-mean-averaged across orders
      (``(sum(x**dim)/len)**(1/dim)``, dim=1 default) and ranked desc with
      the reference's ``Counter.most_common`` tie order (insertion order =
      first-seen during gram iteration).
    """

    def __init__(self, n: Union[int, Iterable[int]] = (2, 4)):
        self.n_list: Tuple[int, ...] = (n,) if isinstance(n, int) else tuple(n)
        self.vocabulary: List[str] = []
        self._vocab_indices: Dict[str, int] = {}
        # per order: n_gram -> [(word_idx, normalized count)]
        self._indices: Dict[int, Dict[str, List[Tuple[int, float]]]] = {}

    @staticmethod
    def _gram_counts(word: str, n: int) -> Dict[str, int]:
        padded = f"^{word}$"
        counts: Dict[str, int] = {}
        for i in range(len(padded) - n + 1):
            g = padded[i : i + n]
            counts[g] = counts.get(g, 0) + 1
        return counts

    def add_word(self, word: str) -> "ApproxWordList1":
        if not word:
            raise ValueError("empty word")
        if word in self._vocab_indices:
            return self
        idx = self._vocab_indices[word] = len(self.vocabulary)
        self.vocabulary.append(word)
        for n in set(self.n_list):
            index = self._indices.setdefault(n, {})
            counts = self._gram_counts(word, n)
            denom = sum(c * c for c in counts.values()) ** 0.5
            for gram, c in counts.items():
                index.setdefault(gram, []).append((idx, c / denom))
        return self

    def add_words(self, words: Iterable[str]) -> "ApproxWordList1":
        for w in words:
            if w:
                self.add_word(w)
        return self

    def lookup(self, word: str, top_k: Optional[int] = None, dim: float = 1.0) -> List[Tuple[str, float]]:
        """→ [(candidate, round(power_mean_cosine, 3))] ranked desc."""
        matches: Dict[int, List[float]] = {}
        for n_idx, n in enumerate(self.n_list):
            index = self._indices.get(n, {})
            counts = self._gram_counts(word, n)
            denom = sum(c * c for c in counts.values()) ** 0.5
            for gram, c in counts.items():
                for widx, norm_count in index.get(gram, ()):
                    scores = matches.setdefault(widx, [0.0] * len(self.n_list))
                    scores[n_idx] += norm_count * (c / denom)
        order = {widx: rank for rank, widx in enumerate(matches)}
        ranked = sorted(
            (
                (widx, (sum(s**dim for s in scores) / len(scores)) ** (1.0 / dim))
                for widx, scores in matches.items()
            ),
            key=lambda kv: (-kv[1], order[kv[0]]),
        )
        if top_k is None:
            top_k = len(ranked)
        return [(self.vocabulary[widx], round(score, 3)) for widx, score in ranked[:top_k]]


class ApproxWordList2:
    """The reference's intermediate positional-list variant
    (``dictionary_langid/datatypes.py:390-458``), kept for parity alongside
    the v3-style :class:`FuzzyWordIndex`:

    * grams come from the literally ``^``/``$``-padded word for EVERY order
      (v3 uses STX/ETX sentinels and only for n>1);
    * per-order scores stay RAW sums (v3 normalizes by gram count), so v2
      favors longer overlaps outright;
    * lookup is a plain top-k by power-mean score with the
      Damerau-Levenshtein distance attached — no 0.9×top cut-off or
      edit-distance rescue rule.
    """

    def __init__(self, n: Union[int, Iterable[int]] = (2, 4)):
        self.n_list: Tuple[int, ...] = (n,) if isinstance(n, int) else tuple(n)
        self.vocabulary: List[str] = []
        self._vocab_indices: Dict[str, int] = {}
        # per order: n_gram -> [(word_idx, positions)]
        self._indices: Dict[int, Dict[str, List[Tuple[int, Tuple[float, ...]]]]] = {}

    @staticmethod
    def _grams(word: str, n: int) -> Dict[str, Tuple[float, ...]]:
        padded = f"^{word}$"
        grams = [padded[i : i + n] for i in range(len(padded) - n + 1)]
        locs: Dict[str, List[float]] = defaultdict(list)
        if len(grams) > 1:
            denom = len(grams) - 1
            for i, g in enumerate(grams):
                locs[g].append(i / denom)
        elif grams:
            locs[grams[0]].append(0.0)
        return {g: tuple(v) for g, v in locs.items()}

    def add_word(self, word: str) -> "ApproxWordList2":
        if not word:
            raise ValueError("empty word")  # same contract as v1/v3
        if word in self._vocab_indices:
            return self
        idx = self._vocab_indices[word] = len(self.vocabulary)
        self.vocabulary.append(word)
        for n in set(self.n_list):
            index = self._indices.setdefault(n, {})
            for gram, locs in self._grams(word, n).items():
                index.setdefault(gram, []).append((idx, locs))
        return self

    def add_words(self, words: Iterable[str]) -> "ApproxWordList2":
        for w in words:
            if w:
                self.add_word(w)
        return self

    def lookup(self, word: str, top_k: Optional[int] = None, dim: float = 1.0) -> List[Tuple[str, float, int]]:
        """→ [(candidate, round(power_mean_score, 3), damerau_levenshtein)]
        ranked by score desc with a deterministic tie-break on VOCABULARY
        (add) order.  NOTE: the reference's Counter.most_common ties break
        on first-seen-during-scoring order instead — deterministic either
        way, but tie ORDER can differ from the reference's."""
        matches: Dict[int, List[float]] = {}
        for n_idx, n in enumerate(self.n_list):
            index = self._indices.get(n, {})
            for gram, locs in self._grams(word, n).items():
                for widx, wlocs in index.get(gram, ()):
                    scores = matches.setdefault(widx, [0.0] * len(self.n_list))
                    scores[n_idx] += max(len(locs), len(wlocs)) - emd_1d(locs, wlocs)
        ranked = sorted(
            (
                (widx, (sum(s**dim for s in scores) / len(scores)) ** (1.0 / dim))
                for widx, scores in matches.items()
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )
        if top_k is None:
            top_k = len(ranked)
        return [
            (self.vocabulary[widx], round(score, 3), damerau_levenshtein(word, self.vocabulary[widx]))
            for widx, score in ranked[:top_k]
        ]


class FuzzyWordIndex:
    def __init__(self, n: Union[int, Iterable[int]] = (2, 4), case_sensitive: bool = False):
        self.n_list: Tuple[int, ...] = (n,) if isinstance(n, int) else tuple(n)
        self.case_insensitive = not case_sensitive
        self.vocabulary: List[str] = []
        self._vocab_indices: Dict[str, int] = {}
        # n_gram -> [(word_idx, positions)]
        self._index: Dict[str, List[Tuple[int, Tuple[float, ...]]]] = defaultdict(list)

    def __len__(self) -> int:
        return len(self.vocabulary)

    def add_word(self, word: str) -> "FuzzyWordIndex":
        if not word:
            raise ValueError("empty word")
        if self.case_insensitive:
            word = word.casefold()
        if word in self._vocab_indices:
            return self
        idx = self._vocab_indices[word] = len(self.vocabulary)
        self.vocabulary.append(word)
        for n in set(self.n_list):
            for gram, locs in _positional_ngrams(word, n).items():
                self._index[gram].append((idx, locs))
        return self

    def add_words(self, words: Iterable[str]) -> "FuzzyWordIndex":
        for w in words:
            if w:
                self.add_word(w)
        return self

    def _scores(self, word: str, dim: float = 1.0) -> Dict[int, float]:
        matches: Dict[int, List[float]] = {}
        for n_idx, n in enumerate(self.n_list):
            query_grams = _positional_ngrams(word, n)
            for gram, locs in query_grams.items():
                for widx, wlocs in self._index.get(gram, ()):
                    scores = matches.setdefault(widx, [0.0] * len(self.n_list))
                    scores[n_idx] += max(len(locs), len(wlocs)) - emd_1d(locs, wlocs)
        out: Dict[int, float] = {}
        for widx, scores in matches.items():
            # max(..., 1): a query shorter than n-3 chars (e.g. 'a' against
            # the 4-gram index) otherwise divides by zero — the padded-gram
            # count floor is 1
            norm = [
                scores[n_idx] / max(len(word) - n + 3, 1) if n > 1 else scores[n_idx] / max(len(word), 1)
                for n_idx, n in enumerate(self.n_list)
            ]
            out[widx] = (sum(s**dim for s in norm) / len(norm)) ** (1.0 / dim)
        return out

    def lookup(self, word: str, top_k: int = 10, dim: float = 1.0) -> List[Tuple[str, float, int, int]]:
        """→ [(candidate, score, damerau_levenshtein, levenshtein)] ranked.

        Keeps candidates scoring ≥ 0.9×top plus any within edit distance 1
        AMONG THE TOP ``2×top_k`` score-ranked candidates — the reference's
        exact rescue window (``datatypes.py:613-617`` iterates
        ``counter.most_common(top_k * 2)``), so a DL≤1 word ranked below
        that window is not rescued on either implementation."""
        if not word:
            raise ValueError("empty word")
        if self.case_insensitive:
            word = word.casefold()
        scores = self._scores(word, dim)
        if not scores:
            return []
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        top_score = ranked[0][1]
        if top_k is None or top_k <= 0:
            top_k = len(ranked)
        out = []
        for widx, score in ranked[: top_k * 2]:
            cand = self.vocabulary[widx]
            dl = damerau_levenshtein(word, cand)
            if score >= top_score * 0.9 or dl <= 1:
                out.append((cand, round(score, 3), dl, levenshtein(word, cand)))
            if len(out) >= top_k:
                break
        return out

    def best(self, word: str) -> Optional[str]:
        hits = self.lookup(word, top_k=1)
        return hits[0][0] if hits else None
