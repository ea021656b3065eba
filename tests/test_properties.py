"""Property-based tests (SURVEY §5): invariants that must hold for ALL
inputs, not just fixtures.  Mirrors the reference's differential-testing
habit (fast/slow EMD cross-check, ``dictionary_langid/datatypes.py:337-341``).
"""

import hypothesis.strategies as st
from hypothesis import given, settings

from language_identification_ray.functions.textnorm import truncate_text
from language_identification_ray.functions.tokenizer import (
    BatchTokens,
    sentence_split,
    tokenize,
)

TEXT = st.text(max_size=400)
# digit-free text for scrub idempotence: clamping digit runs can legitimately
# create new phone-shaped strings, so idempotence is only claimed off-digits
TEXT_NO_DIGITS = st.text(
    alphabet=st.characters(blacklist_categories=("Nd", "Nl", "No", "Cs")), max_size=300
)


@settings(max_examples=200, deadline=None)
@given(TEXT, st.integers(min_value=1, max_value=200))
def test_truncate_never_exceeds_byte_cap(text, cap):
    out = truncate_text(text, max_bytes_length=cap)
    assert len(out.encode("utf-8")) <= cap
    # result is a (stripped) substring of the input — truncate_text strips
    # edge whitespace after cutting, per the reference contract
    assert out in text


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_tokenize_partitions_the_string(text):
    toks = tokenize(text, words_only=False)
    assert "".join(toks) == text


@settings(max_examples=100, deadline=None)
@given(st.lists(TEXT, max_size=8))
def test_batch_tokens_match_per_doc_tokenize(texts):
    bt = BatchTokens(texts)
    for d, words in bt.iter_doc_words():
        assert words == tokenize(texts[d], words_only=True)
    counts = bt.words_per_doc()
    for d, t in enumerate(texts):
        assert counts[d] == len(tokenize(t, words_only=True))


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_sentences_are_substrings(text):
    for s in sentence_split(text):
        assert s in text


@settings(max_examples=100, deadline=None)
@given(TEXT_NO_DIGITS)
def test_scrub_is_idempotent_on_text(text):
    from language_identification_ray.stages.scrub import Scrubber

    sc = Scrubber()
    once, *_ = sc.scrub_one(text)
    twice, *_ = sc.scrub_one(once)
    assert twice == once


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200), st.text(max_size=200))
def test_minhash_est_bounds_and_symmetry(a, b):
    from language_identification_ray.stages.dedup import MinHasher, jaccard, word_shingles

    mh = MinHasher(32)
    sa, sb = mh.signature(word_shingles(a)), mh.signature(word_shingles(b))
    est = mh.est_jaccard(sa, sb)
    assert 0.0 <= est <= 1.0
    assert est == mh.est_jaccard(sb, sa)
    assert jaccard(word_shingles(a), word_shingles(b)) == jaccard(
        word_shingles(b), word_shingles(a)
    )


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=100), st.text(max_size=100))
def test_edit_distance_metric_properties(a, b):
    from language_identification_ray.functions.strings import levenshtein

    d = levenshtein(a, b)
    assert d == levenshtein(b, a)
    assert (d == 0) == (a == b)
    assert d <= max(len(a), len(b))
