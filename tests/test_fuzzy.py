"""Fuzzy/dictionary/spell conformance tests — mirrors the reference's own
hard cases (misspelling rescue, banana repetition, fast-vs-slow EMD
differential, Norvig corrector asserts at pdfs/spellcheck/spell.py:67-93)."""

import itertools
import random

import pytest

from language_identification_ray.functions.spell import SpellCorrector
from language_identification_ray.functions.strings import (
    damerau_levenshtein,
    emd_1d,
    emd_1d_brute,
    levenshtein,
)
from language_identification_ray.state.dictionary import (
    BilingualDictionary,
    DictionaryDetector,
    MultiDictionary,
)
from language_identification_ray.state.fuzzy import FuzzyWordIndex


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0


def test_damerau():
    # doctest values from the classic implementation
    assert damerau_levenshtein("ba", "abc") == 2
    assert damerau_levenshtein("fee", "deed") == 2
    assert damerau_levenshtein("abcd", "bacde") == 2  # transposition + insert
    assert damerau_levenshtein("ab", "ba") == 1


def test_emd_equal_lengths():
    assert emd_1d([0.0, 1.0], [0.0, 1.0]) == 0.0
    assert emd_1d([0.0, 0.5], [0.5, 1.0]) == pytest.approx(1.0)
    assert emd_1d([], []) == 0.0


def test_emd_unequal_lengths():
    # one unmatched point costs 1 plus best matching of the rest
    assert emd_1d([0.0, 1.0], [0.0]) == pytest.approx(1.0)
    assert emd_1d([0.0, 0.4, 1.0], [0.5]) == pytest.approx(2.1)


def test_emd_differential_vs_bruteforce():
    # the reference cross-checks fast vs slow on every call
    # (dictionary_langid/datatypes.py:337-341); we pin it property-style
    rng = random.Random(7)
    for _ in range(200):
        xs = sorted(round(rng.random(), 3) for _ in range(rng.randint(0, 5)))
        ys = sorted(round(rng.random(), 3) for _ in range(rng.randint(0, 4)))
        assert emd_1d(xs, ys) == pytest.approx(emd_1d_brute(xs, ys), abs=1e-9), (xs, ys)


@pytest.fixture(scope="module")
def index():
    idx = FuzzyWordIndex(n=(2, 4))
    idx.add_words(
        ["schwarzenegger", "banana", "bandana", "cabana", "government", "grammar", "banana-rama"]
    )
    return idx


@pytest.mark.parametrize(
    "typo",
    [
        "schwarzenegger",
        "schwarzeneger",
        "schwarzenneger",
        "shwarzenegger",
        "schwartzenegger",
        "scwarzenegger",
        "schwarzenegar",
    ],
)
def test_fuzzy_misspellings_rank_first(index, typo):
    hits = index.lookup(typo, top_k=3)
    assert hits and hits[0][0] == "schwarzenegger", (typo, hits)


def test_fuzzy_banana_repetition(index):
    # repetition cases: 'bananana' should still find banana
    for q in ["banana", "bananna", "bananana", "banan"]:
        hits = index.lookup(q, top_k=3)
        assert hits and hits[0][0] == "banana", (q, hits)


def test_fuzzy_edit_distance_rescue(index):
    # a candidate at DL ≤ 1 survives the 0.9×top cutoff rule
    hits = index.lookup("bandana", top_k=5)
    names = [h[0] for h in hits]
    assert names[0] == "bandana"


def test_fuzzy_case_insensitive(index):
    assert index.lookup("BANANA", top_k=1)[0][0] == "banana"


def test_bilingual_dictionary():
    d = BilingualDictionary("en", "ms")
    d.add_entry("good morning", "selamat pagi").add_entry("good night", "selamat malam")
    hits = d.lookup_terms("i said good morning today")
    assert hits[0][0] == "good morning" and hits[0][2] == 2
    back = d.lookup_definitions("selamat pagi semua")
    assert back[0][1] == "selamat pagi"


def test_multi_dictionary():
    en_ms = BilingualDictionary("en", "ms").add_entry("cat", "kucing")
    en_fr = BilingualDictionary("en", "fr").add_entry("cat", "chat")
    md = MultiDictionary().add_dictionary(en_ms).add_dictionary(en_fr)
    hits = md.lookup_terms("the cat sat")
    assert {h[1] for h in hits} == {"kucing", "chat"}


def test_dictionary_detector():
    det = DictionaryDetector(
        {"en": ["the", "cat", "sat", "mat"], "ms": ["kucing", "itu", "duduk"]}
    )
    out = det.predict_batch(["the cat sat on the mat", "kucing itu duduk"])
    assert out[0][0][0] == "en"
    assert out[1][0][0] == "ms"
    assert det.predict_batch([""]) == [[]]


def test_spell_corrector():
    # the reference's own assert vectors (spell.py:67-93 uses a big corpus;
    # ours seeds the needed words directly)
    corpus = "spelling corrected bicycle inconvenient arranged poetry word " * 3
    sc = SpellCorrector(corpus_text=corpus)
    assert sc.correction("speling") == "spelling"
    assert sc.correction("korrectud") == "corrected"
    assert sc.correction("bycycle") == "bicycle"
    assert sc.correction("inconvient") == "inconvenient"
    assert sc.correction("arrainged") == "arranged"
    assert sc.correction("peotry") == "poetry"
    assert sc.correction("word") == "word"
    assert sc.correction("quintessential") == "quintessential"  # unknown passes through


def test_lookup_short_word_no_crash():
    """Queries shorter than n-3 for the largest n-gram order must not divide
    by zero (found via the fuzzy_correct_sample driver query: word 'a')."""
    from language_identification_ray.state.fuzzy import FuzzyWordIndex

    idx = FuzzyWordIndex().add_words(["a", "at", "cat", "the"])
    assert idx.best("a") is not None
    assert idx.lookup("ab", top_k=3) != []


class TestApproxWordList2:
    """v2 intermediate variant (ref datatypes.py:390-458): ^/$ padding on
    every order, raw per-order sums, plain top-k (no rescue rule)."""

    def _index(self):
        from language_identification_ray.state.fuzzy import ApproxWordList2

        return ApproxWordList2((2, 4)).add_words(
            ["schwarzenegger", "schwarz", "negotiate", "governor", "governed"]
        )

    def test_exact_word_ranks_first_with_top_score(self):
        idx = self._index()
        hits = idx.lookup("schwarzenegger", top_k=3)
        assert hits[0][0] == "schwarzenegger"
        assert hits[0][2] == 0  # DL distance attached
        assert hits[0][1] > hits[1][1]

    def test_misspelling_finds_target(self):
        idx = self._index()
        hits = idx.lookup("schwarzeneger", top_k=2)  # dropped one 'g'
        assert hits[0][0] == "schwarzenegger"
        assert hits[0][2] == 1

    def test_raw_sums_favor_long_overlap(self):
        # v2 keeps raw per-order sums: the long word scores ABOVE its prefix
        idx = self._index()
        hits = {w: s for w, s, _ in idx.lookup("schwarzenegger")}
        assert hits["schwarzenegger"] > hits["schwarz"]

    def test_no_rescue_rule_plain_topk(self):
        idx = self._index()
        hits = idx.lookup("govermor", top_k=2)
        assert [h[0] for h in hits] == ["governor", "governed"]

    def test_dedup_add(self):
        from language_identification_ray.state.fuzzy import ApproxWordList2

        idx = ApproxWordList2(2).add_words(["abc", "abc"])
        assert len(idx.vocabulary) == 1


# ---------------------------------------------------------------------------
# v1 cosine variant + the reference's own misspelling conformance corpus


def _misspelling_corpus():
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "schwarzenegger_misspellings.txt")
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip() and not ln.startswith("#")]


def _conformance_vocab():
    from language_identification_ray.state.seed_corpus import SEED_SENTENCES

    vocab = sorted({w for s in SEED_SENTENCES["en"] for w in s.split()})
    # confusable distractors make the corpus a real discrimination test
    vocab += ["schwarzenegger", "schwartz", "switzerland", "sweater", "swagger",
              "schubert", "eggers", "governor", "terminator", "austria"]
    return vocab


class TestApproxWordList1Cosine:
    """ApproxWordList v1 (reference datatypes.py:693-749): L2-normalized
    n-gram count vectors scored by cosine, power-mean across orders."""

    def test_exact_word_scores_one(self):
        from language_identification_ray.state.fuzzy import ApproxWordList1

        idx = ApproxWordList1((2, 4)).add_words(["banana", "bandana", "cabana"])
        out = idx.lookup("banana")
        assert out[0] == ("banana", 1.0)  # cosine of a vector with itself

    def test_single_order_equals_plain_cosine(self):
        """Hand-checked cosine on 2-grams of ^cat$ vs ^cart$."""
        from language_identification_ray.state.fuzzy import ApproxWordList1

        idx = ApproxWordList1(2).add_words(["cart"])
        # ^cat$ grams: {^c, ca, at, t$}; ^cart$ grams: {^c, ca, ar, rt, t$}
        # shared: ^c, ca, t$ -> cos = 3 / (sqrt(4)*sqrt(5))
        (cand, score), = idx.lookup("cat")
        assert cand == "cart"
        assert score == round(3 / (4**0.5 * 5**0.5), 3)

    def test_misspelling_corpus_all_variants(self):
        """The reference's 254 real-world 'Schwarzenegger' misspellings
        (dictionary_langid/datatypes.py:714-975) against a vocabulary with
        confusable distractors.  Floors are the measured behavior of each
        algorithm (v1's plain cosine is genuinely weaker than the EMD
        variants — that is WHY the reference iterated to v2/v3), pinned so
        a scoring regression in any variant fails loudly."""
        from language_identification_ray.state.fuzzy import (
            ApproxWordList1,
            ApproxWordList2,
            FuzzyWordIndex,
        )

        vocab = _conformance_vocab()
        mis = _misspelling_corpus()
        assert len(mis) == 254

        v1 = ApproxWordList1((2, 4)).add_words(vocab)
        v2 = ApproxWordList2((2, 4)).add_words(vocab)
        v3 = FuzzyWordIndex((2, 4)).add_words(vocab)

        def top1_rate(index):
            return sum(
                1
                for m in mis
                if (out := index.lookup(m.casefold(), top_k=3)) and out[0][0] == "schwarzenegger"
            ) / len(mis)

        assert top1_rate(v1) >= 0.55  # measured 150/254
        assert top1_rate(v2) >= 0.90  # measured 234/254
        assert top1_rate(v3) >= 0.90  # measured 233/254
        # v1 recovers in top-3 almost always (measured 250/254)
        v1_top3 = sum(
            1
            for m in mis
            if any(c == "schwarzenegger" for c, *_ in v1.lookup(m.casefold(), top_k=3))
        )
        assert v1_top3 / len(mis) >= 0.97

    def test_pinned_scores(self):
        """Frozen outputs for two canonical misspellings (regression pins)."""
        from language_identification_ray.state.fuzzy import ApproxWordList1

        idx = ApproxWordList1((2, 4)).add_words(_conformance_vocab())
        assert idx.lookup("schwarzeneger", top_k=2) == [
            ("schwarzenegger", 0.883),
            ("schwartz", 0.485),
        ]
        assert idx.lookup("shwarzenegger", top_k=1) == [("schwarzenegger", 0.849)]


def test_v2_rejects_empty_word_like_siblings():
    import pytest

    from language_identification_ray.state.fuzzy import ApproxWordList2

    with pytest.raises(ValueError, match="empty"):
        ApproxWordList2().add_word("")
