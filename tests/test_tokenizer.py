"""Tokenizer parity tests.

Expected values mirror the reference semantics: word chars = L*+M* Unicode
categories (reference tokenizer.py:148-152), digits/punct/space are
boundaries; sentence split ends on closing punctuation + whitespace and
un-closes for cases like 192.168.1.1 (reference tokenizer.py:434).
"""

import numpy as np

from language_identification_ray.functions.tokenizer import (
    BatchTokens,
    char_ngrams,
    classify,
    sentence_split,
    tokenize,
    word_ngrams,
    CLS_WORD,
    CLS_SPACE,
    CLS_DIGIT,
    CLS_PUNCT,
)


def test_classify_basic():
    cls = classify("ab 1.")
    assert list(cls) == [CLS_WORD, CLS_WORD, CLS_SPACE, CLS_DIGIT, CLS_PUNCT]


def test_tokenize_words_only():
    assert tokenize("hello, world! it's 42") == ["hello", "world", "it", "s"]


def test_tokenize_unicode_scripts():
    # diacritics (Mn) stay attached to words, like the reference's L*+M* rule
    assert tokenize("café naïve") == ["café", "naïve"]
    assert tokenize("日本語 テスト") == ["日本語", "テスト"]
    assert tokenize("مرحبا بالعالم") == ["مرحبا", "بالعالم"]


def test_tokenize_digits_are_boundaries():
    # is_word_char excludes Nd (reference tokenizer.py:150-152)
    assert tokenize("abc123def") == ["abc", "def"]


def test_tokenize_empty():
    assert tokenize("") == []
    assert tokenize("  \n\t ") == []
    assert tokenize("123 456") == []


def test_batch_tokens_counts():
    texts = ["hello world", "", "a b c", "123", "naïve café test"]
    bt = BatchTokens(texts)
    assert list(bt.words_per_doc()) == [2, 0, 3, 0, 3]
    assert list(bt.word_char_count_per_doc()) == [10, 0, 3, 0, 13]


def test_batch_tokens_words_match_single():
    texts = ["hello, world!", "foo—bar baz", "日本語です", ""]
    bt = BatchTokens(texts)
    for d, words in bt.iter_doc_words():
        assert words == tokenize(texts[d]), texts[d]


def test_batch_class_counts():
    texts = ["ab 1.", "xy"]
    counts = BatchTokens(texts).class_counts_per_doc()
    # doc0: 2 word, 1 space, 1 digit, 1 punct  (separator is excluded)
    assert list(counts[0]) == [1, 2, 1, 1, 0]
    assert list(counts[1]) == [0, 2, 0, 0, 0]


def test_sentence_split():
    assert sentence_split("One. Two! Three?") == ["One.", "Two!", "Three?"]
    assert sentence_split("a\nb") == ["a", "b"]
    # un-close: no whitespace after inner dots
    assert sentence_split("ip is 192.168.1.1 ok") == ["ip is 192.168.1.1 ok"]
    assert sentence_split("") == []


def test_ngrams():
    assert char_ngrams("abcd", 2) == ["ab", "bc", "cd"]
    assert list(word_ngrams(["a", "b", "c"], 2)) == [("a", "b"), ("b", "c")]
    assert list(word_ngrams(["a"], 2)) == []


def test_large_batch_consistency():
    rng = np.random.default_rng(7)
    texts = ["".join(rng.choice(list("abc def. 123 xyz,"), size=50)) for _ in range(200)]
    bt = BatchTokens(texts)
    n = bt.words_per_doc()
    for d in range(0, 200, 37):
        assert n[d] == len(tokenize(texts[d]))


class TestApostropheMerge:
    """Pinned on the reference's own docstring examples
    (ref tokenizer.py:358-365) and its state-machine edge cases."""

    def test_reference_docstring_examples(self):
        from language_identification_ray.functions.tokenizer import tokenize

        assert tokenize("O'reilly", merge_apostrophes=True) == ["O'reilly"]
        assert tokenize("O’reilly", merge_apostrophes=True) == ["O’reilly"]
        assert tokenize("wasn’t", merge_apostrophes=True) == ["wasn’t"]
        # left single quote is NOT an apostrophe (example 4)
        assert tokenize("wasn‘t", merge_apostrophes=True) == ["wasn", "t"]
        # merged even when arguably undesirable (examples 5, 6)
        assert tokenize("l'ensemble", merge_apostrophes=True) == ["l'ensemble"]
        assert tokenize("‘test test’oops", merge_apostrophes=True) == ["test", "test’oops"]

    def test_double_apostrophe_cancels_merge(self):
        from language_identification_ray.functions.tokenizer import tokenize

        assert tokenize("a'b'c", merge_apostrophes=True) == ["a", "b", "c"]
        assert tokenize("won''t", merge_apostrophes=True) == ["won", "t"]

    def test_sentence_context(self):
        from language_identification_ray.functions.tokenizer import tokenize

        assert tokenize("don't stop, won't quit", merge_apostrophes=True) == [
            "don't", "stop", "won't", "quit",
        ]
        # trailing apostrophe (possessive plural) is not merged into the word
        assert tokenize("the dogs' bones", merge_apostrophes=True) == ["the", "dogs", "bones"]

    def test_off_by_default_matches_plain_tokenize(self):
        from language_identification_ray.functions.tokenizer import tokenize

        assert tokenize("don't") == ["don", "t"]
        assert tokenize("don't", merge_apostrophes=False) == ["don", "t"]

    def test_non_words_preserved_when_not_words_only(self):
        from language_identification_ray.functions.tokenizer import tokenize

        assert tokenize("don't!", words_only=False, merge_apostrophes=True) == ["don't", "!"]
