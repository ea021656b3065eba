"""Detector conformance tests.

The expected-language cases mirror the reference's own smoke inputs
(reference script_langid/scripts_langid.py:87-108 and the comparison harness
language_identification_test.py:70-78) plus seeded per-language sentences.
"""

import pytest

from language_identification_ray.stages.langid import (
    EnsembleDetector,
    NgramDetector,
    ScriptDetector,
    check_languages,
)

# (text, expected_top1) — script-unambiguous cases from the reference smoke list
SCRIPT_CASES = [
    ("カタカナ", "ja"),
    ("ひらがな", "ja"),
    ("平仮名, ひらがな", "ja"),
    ("맏아들", "ko"),
    ("ㄱ ㄴ ㄷ ㄹ ㅁ", "ko"),  # jamo
    ("日 月 木", "zh"),
    ("ရှစ်လေးလုံးအရေးအခင်", "my"),
    ("แหลงข้าหลวง", "th"),
    ("तत्सम", "hi"),
    ("முடி", "ta"),
]

LATIN_CASES = [
    ("the quick brown fox jumps over the lazy dog and it was good", "en"),
    ("hello world", "en"),
    ("je ne sais pas pourquoi il est parti hier soir", "fr"),
    ("das wetter ist heute sehr schön und warm", "de"),
    ("no sé por qué se fue anoche pero está bien", "es"),
    ("eu não sei porque ele saiu ontem à noite", "pt"),
    ("ik weet niet waarom hij gisteren is vertrokken", "nl"),
]

CYRILLIC_CASES = [
    ("это очень хорошая книга и я люблю читать её каждый день", "ru"),
]


@pytest.fixture(scope="module")
def ensemble():
    return EnsembleDetector()


@pytest.mark.parametrize("text,expected", SCRIPT_CASES + LATIN_CASES + CYRILLIC_CASES)
def test_ensemble_top1(ensemble, text, expected):
    ranking = ensemble.predict_batch([text])[0]
    assert ranking, text
    assert ranking[0][0] == expected


def test_ranking_shape(ensemble):
    ranking = ensemble.predict_batch(["the cat sat on the mat"])[0]
    # (lang, prob) sorted desc — the reference's universal result shape
    probs = [p for _, p in ranking]
    assert probs == sorted(probs, reverse=True)
    assert all(0.0 <= p <= 1.0 + 1e-9 for p in probs)


def test_empty_and_numeric(ensemble):
    out = ensemble.predict_batch(["", "123", "!!! ???"])
    assert out == [[], [], []]


def test_allowlist_filters(ensemble):
    ranking = ensemble.predict_batch(
        ["the quick brown fox jumps over the lazy dog"], language_codes=["fr", "de"]
    )[0]
    langs = {l for l, _ in ranking}
    assert langs <= {"fr", "de"}


def test_check_languages():
    assert check_languages(None, ["b", "a"]) == ["a", "b"]
    assert check_languages(["a", "zz"], ["a", "b"]) == ["a"]
    assert check_languages([], ["a"]) == ["a"]


def test_ngram_detector_standalone():
    det = NgramDetector()
    assert det.rank("the cat sat on the mat with the hat")[0][0] == "en"
    assert det.rank("le chat est sur la chaise près de la fenêtre")[0][0] == "fr"


def test_script_detector_fractions():
    det = ScriptDetector()
    fr = det.script_fractions(["hello мир"])
    # 5 latin word chars, 3 cyrillic
    from language_identification_ray.state.scripts import SCRIPT_ID

    assert fr[0, SCRIPT_ID["Latin"]] == pytest.approx(5 / 8)
    assert fr[0, SCRIPT_ID["Cyrillic"]] == pytest.approx(3 / 8)


def test_batch_equals_single(ensemble):
    texts = [t for t, _ in SCRIPT_CASES + LATIN_CASES]
    batch = ensemble.predict_batch(texts)
    for t, r in zip(texts, batch):
        assert ensemble.predict_batch([t])[0] == r


def test_external_detectors_gated():
    """A2-A5 adapters raise clear ImportErrors here and report availability
    honestly (no third-party langid wheels in this container)."""
    import pytest as _pytest

    from language_identification_ray.stages.external_detectors import (
        Cld2Detector,
        FastTextDetector,
        LangdetectDetector,
        LangidPyDetector,
        available_external_detectors,
    )

    assert available_external_detectors() == {}
    for cls in (LangidPyDetector, LangdetectDetector, Cld2Detector):
        with _pytest.raises(ImportError):
            cls()
    with _pytest.raises(ImportError):
        FastTextDetector("/nonexistent/lid.176.ftz")
