"""Bilingual dictionary store + dictionary-based language detector.

Re-expression of the reference's Dictionary / MultiDictionary contract
(``dictionary_langid/datatypes.py:18-147``): term↔definition entries with a
casefolded inverted word index; lookups are broadcast-small-side semi-joins
ranked by match count (J2/J3 in SURVEY §2.4).  The detector scores a text by
which language's dictionary matches the most words (A7).

All state is built once per actor in ``__init__`` from broadcast wordlists.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from language_identification_ray.functions.tokenizer import tokenize


class BilingualDictionary:
    def __init__(self, term_language: str, definition_language: str):
        self.term_language = term_language
        self.definition_language = definition_language
        self.terms: List[str] = []
        self.definitions: List[str] = []
        self._term_index: Dict[str, set] = defaultdict(set)  # casefolded word -> entry ids
        self._def_index: Dict[str, set] = defaultdict(set)

    def add_entry(self, term: str, definition: str) -> "BilingualDictionary":
        idx = len(self.terms)
        self.terms.append(term)
        self.definitions.append(definition)
        for w in tokenize(term.casefold()):
            self._term_index[w].add(idx)
        for w in tokenize(definition.casefold()):
            self._def_index[w].add(idx)
        return self

    def _lookup(self, text: str, index: Dict[str, set]) -> List[Tuple[str, str, int]]:
        matches: Counter = Counter()
        for w in tokenize(text.casefold()):
            for idx in index.get(w, ()):
                matches[idx] += 1
        return [(self.terms[i], self.definitions[i], c) for i, c in matches.most_common()]

    def lookup_terms(self, text: str) -> List[Tuple[str, str, int]]:
        """Entries whose TERM shares words with the text, by match count."""
        return self._lookup(text, self._term_index)

    def lookup_definitions(self, text: str) -> List[Tuple[str, str, int]]:
        return self._lookup(text, self._def_index)

    def term_words(self) -> List[str]:
        return sorted(self._term_index)


class MultiDictionary:
    """Word → candidate dictionaries → fan-out lookup (two-level semi-join)."""

    def __init__(self) -> None:
        self.dictionaries: List[BilingualDictionary] = []
        self._word_index: Dict[str, set] = defaultdict(set)

    def add_dictionary(self, d: BilingualDictionary) -> "MultiDictionary":
        idx = len(self.dictionaries)
        self.dictionaries.append(d)
        # TERM words only: lookup_terms scans the term index, so a
        # definition-side-only hit would select a dictionary that can never
        # return anything — pure fan-out waste on every query
        for w in d._term_index:
            self._word_index[w].add(idx)
        return self

    def lookup_terms(self, text: str) -> List[Tuple[str, str, int]]:
        cands = set()
        for w in tokenize(text.casefold()):
            cands.update(self._word_index.get(w, ()))
        out: List[Tuple[str, str, int]] = []
        for i in sorted(cands):
            out.extend(self.dictionaries[i].lookup_terms(text))
        return sorted(out, key=lambda x: -x[-1])


class DictionaryDetector:
    """Language ID by wordlist membership (A7): score = fraction of words
    found in each language's vocabulary; conforms to the detector contract."""

    def __init__(self, wordlists: Dict[str, Iterable[str]]):
        self.vocab: Dict[str, frozenset] = {
            lang: frozenset(w.casefold() for w in words) for lang, words in wordlists.items()
        }
        self.SUPPORTED_LANGUAGES = sorted(self.vocab)

    def predict_batch(
        self, texts: Sequence[str], language_codes: Optional[Iterable[str]] = None
    ) -> List[List[Tuple[str, float]]]:
        from language_identification_ray.stages.langid import SCORE_MAX_CHARS, check_languages

        # shared detector contract (empty/None/consumed iterator → all
        # supported), not an ad-hoc truthiness test
        langs = check_languages(language_codes, self.SUPPORTED_LANGUAGES)
        out = []
        for text in texts:
            # same truncation as every other detector (langid.SCORE_MAX_CHARS):
            # membership fractions converge long before 400 chars, and an
            # untruncated 1 MB doc would cost ~150k word x vocab set lookups
            words = [w.casefold() for w in tokenize((text or "")[:SCORE_MAX_CHARS])]
            if not words:
                out.append([])
                continue
            scores = []
            for lang in langs:
                hits = sum(1 for w in words if w in self.vocab[lang])
                if hits:
                    scores.append((lang, hits / len(words)))
            total = sum(s for _, s in scores)
            out.append(
                sorted(((l, s / total) for l, s in scores), key=lambda x: -x[1]) if total else []
            )
        return out
