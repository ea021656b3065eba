"""QualityStats + KeepDropRules unit tests (pyarrow batches, no Ray needed)."""

import pyarrow as pa
import pytest

from language_identification_ray.stages.quality import QualityStats
from language_identification_ray.stages.rules import KeepDropRules


def _stats(texts, langs=None):
    t = pa.table({"text": texts, "lang": langs or ["en"] * len(texts)})
    return QualityStats()(t)


def test_basic_counts():
    out = _stats(["the cat sat on the mat.", ""])
    assert out["q_n_words"].to_pylist() == [6, 0]
    assert out["q_n_sentences"].to_pylist() == [1, 0]
    assert out["q_mean_word_len"].to_pylist()[0] == pytest.approx(17 / 6)


def test_stopword_ratio_lang_aware():
    out = _stats(["the of and xyzzy", "der die und gurke"], langs=["en", "de"])
    assert out["q_stopword_hits"].to_pylist() == [3, 3]
    assert out["q_stopword_ratio"].to_pylist() == pytest.approx([0.75, 0.75])


def test_symbol_and_digit_ratio():
    out = _stats(["a b !!! ???", "abc 12345"])
    # 6 punct chars / 2 words = 3.0
    assert out["q_symbol_word_ratio"].to_pylist()[0] == pytest.approx(3.0)
    # digits 5 / non-space 8
    assert out["q_digit_ratio"].to_pylist()[1] == pytest.approx(5 / 8)


def test_dup_ngram_frac():
    spam = "buy now " * 20  # one distinct 3-gram window set, heavy repetition
    out = _stats([spam.strip(), "all unique words here today ok"])
    assert out["q_dup_ngram_frac"].to_pylist()[0] > 0.8
    assert out["q_dup_ngram_frac"].to_pylist()[1] == 0.0


def test_max_line_frac():
    out = _stats(["aaaa\nbb\ncc", "single line"])
    assert out["q_max_line_frac"].to_pylist()[0] == pytest.approx(0.4)
    assert out["q_max_line_frac"].to_pylist()[1] == 1.0


def _ruled(texts, langs=None):
    stats = _stats(texts, langs)
    n = len(texts)
    stats = stats.append_column("lang_conf", pa.array([0.9] * n))
    stats = stats.append_column("pii_slurs", pa.array([0] * n, pa.int32()))
    return KeepDropRules()(stats)


def test_rules_keep_good_text():
    out = _ruled(["the quick brown fox jumps over the lazy dog near the river bank today"])
    assert out["keep"].to_pylist() == [True]
    assert out["drop_reason"].to_pylist() == [""]


def test_rules_drop_empty_and_short():
    out = _ruled(["", "too short here"])
    assert out["keep"].to_pylist() == [False, False]
    assert out["drop_reason"].to_pylist() == ["empty", "too_short"]


def test_rules_drop_repetition():
    out = _ruled([("spam click now " * 30).strip()])
    assert out["drop_reason"].to_pylist() == ["repetition"]


def test_rules_first_reason_wins():
    # empty beats everything else in declared order
    out = _ruled(["!!!"])
    assert out["drop_reason"].to_pylist() == ["empty"]


def test_rules_missing_column_is_skipped():
    t = pa.table({"q_n_words": [10], "q_mean_word_len": [4.0]})
    out = KeepDropRules()(t)  # most rule columns absent → those rules skip
    assert out["keep"].to_pylist() == [True]


def test_sentence_count_runs_and_decimals():
    """Ender RUNS count once and digit-separating dots are not enders."""
    from language_identification_ray.stages.quality import _count_sentences

    assert _count_sentences("Wait... what? Ok.") == 3
    assert _count_sentences("ip is 192.168.1.1 ok") == 0
    assert _count_sentences("v2.3.1 released. done.") == 2
    assert _count_sentences("no enders here") == 0
    assert _count_sentences("！？。") == 1  # one mixed run


def test_stopword_rule_skips_unsupported_languages():
    """A fluent >=20-word doc in a language with no stopword table (Arabic,
    Korean, ...) must NOT be dropped as 'stopword' — zero hits there means
    unsupported, not gibberish."""
    ar = "هذه جملة طويلة مكتوبة باللغة العربية وتحتوي على عدد كاف من الكلمات لتجاوز عتبة العشرين كلمة المطلوبة في هذا الاختبار البسيط"
    en_gibberish = "zxq wvu tsr qpo nml kji hgf edc baz yxw vut srq pon mlk jih gfe dcb azy xwv uts"
    stats = _stats([ar, en_gibberish], langs=["ar", "en"])
    stats = stats.append_column("lang_conf", pa.array([1.0, 1.0]))
    stats = stats.append_column("pii_slurs", pa.array([0, 0]))
    out = KeepDropRules()(stats)
    assert out["q_stopword_known"].to_pylist() == [False, True]
    reasons = out["drop_reason"].to_pylist()
    assert reasons[0] != "stopword"  # unsupported language: rule skipped
    assert reasons[1] == "stopword"  # supported language, zero hits: dropped


def test_decode_preserves_line_structure_for_line_frac():
    """decode used to collapse newlines, making q_max_line_frac identically
    1.0 on the flagship path."""
    from language_identification_ray.stages.decode import decode_and_extract

    out, _ = decode_and_extract("short line\nthis is the much longer second line\n\n\nend", None)
    assert out.count("\n") == 3 - 1  # blank-line run collapsed to one break
    stats = _stats([out])
    assert stats["q_max_line_frac"].to_pylist()[0] < 1.0


def test_codepoints_tolerate_lone_surrogates():
    """Arrow string columns cannot hold lone surrogates, but direct Python
    callers (surrogateescape-decoded bytes) can: the codepoint gather must
    classify them as '?' noise (encode-replace), not raise."""
    from language_identification_ray.functions.tokenizer import codepoints

    cps = codepoints("caf\udce9")
    assert len(cps) == 4 and cps[-1] == ord('?')
