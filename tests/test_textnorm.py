"""Decode / clean / truncate contract tests (reference utils.py:15-132,
preprocessing.py:16-27 semantics; byte-identical invariant pinned here)."""

import pytest

from language_identification_ray.functions.textnorm import (
    clean_text,
    decode_bytes,
    ensure_unicode,
    fix_mojibake,
    split_filename,
    truncate_text,
)


def test_decode_utf8():
    assert decode_bytes("héllo wörld".encode("utf-8")) == "héllo wörld"


def test_decode_utf8_bom():
    assert decode_bytes(b"\xef\xbb\xbfhi") == "hi"


def test_decode_cp1252():
    raw = "curly ’quote’ and –dash".encode("cp1252")
    assert decode_bytes(raw) == "curly ’quote’ and –dash"


def test_decode_latin1():
    assert decode_bytes("café".encode("latin-1")) == "café"


def test_decode_hint_wins():
    raw = "日本語".encode("shift-jis")
    assert decode_bytes(raw, ["shift-jis"]) == "日本語"


def test_decode_detwingle_mixed_cp1252_inside_utf8():
    """Golden byte fixtures for the detwingle path (reference utils.py:26-27,
    VERDICT r3 missing #2): windows-1252 bytes interleaved INSIDE
    otherwise-valid UTF-8 must be repaired byte-level BEFORE decoding —
    neither wholesale interpretation gets this right."""
    # UTF-8 ellipsis + raw cp1252 smart quotes in one string
    raw = "he said ".encode("utf-8") + b"\x93" + "résumé…".encode("utf-8") + b"\x94"
    assert decode_bytes(raw) == "he said “résumé…”"
    # cp1252 en-dash between two UTF-8 CJK runs
    raw2 = "日本".encode("utf-8") + b"\x96" + "語".encode("utf-8")
    assert decode_bytes(raw2) == "日本–語"
    # cp1252 hole bytes (undefined in windows-1252) fall back to C1 controls
    raw3 = "ok…".encode("utf-8") + b"\x81"
    assert decode_bytes(raw3) == "ok…\x81"
    # truncated multibyte tail: lead byte degrades to its cp1252 char
    raw4 = "fine…".encode("utf-8") + b"\xe2\x80"
    assert decode_bytes(raw4) == "fine…â€"


def test_detwingle_bytes_roundtrip():
    from language_identification_ray.functions.textnorm import detwingle_bytes

    # pure UTF-8 passes through unchanged
    s = "déjà vu — 中文 … ok".encode("utf-8")
    assert detwingle_bytes(s) == s
    # twingled input becomes valid UTF-8 encoding the repaired text
    raw = "a…".encode("utf-8") + b"\x92" + b"z"
    out = detwingle_bytes(raw)
    assert out.decode("utf-8") == "a…’z"


def test_decode_pure_legacy_paths_unchanged():
    """The detwingle branch must NOT capture pure-legacy documents: without
    a complete UTF-8 multibyte sequence the cp1252/latin-1 fallbacks keep
    their exact prior behavior (golden fixtures above pin the outputs)."""
    raw = "curly ’quote’".encode("cp1252")
    assert decode_bytes(raw) == "curly ’quote’"
    assert decode_bytes("café".encode("latin-1")) == "café"


def test_fix_mojibake():
    # UTF-8 bytes mis-decoded as cp1252: the classic â€™ case
    bad = "it’s fine".encode("utf-8").decode("cp1252")
    assert "â" in bad
    assert fix_mojibake(bad) == "it’s fine"


def test_fix_mojibake_leaves_clean_text():
    for s in ["plain ascii", "café crème", "Привет мир", "日本語テスト"]:
        assert fix_mojibake(s) == s


def test_ensure_unicode_types():
    assert ensure_unicode(b"bytes in") == "bytes in"
    assert ensure_unicode("str in") == "str in"
    assert ensure_unicode(12345) == "12345"


def test_clean_text():
    # numbers deleted, whitespace collapsed (preprocessing.py:16-27)
    assert clean_text("hello   42 world\n\t73 x9y") == "hello world x9y"
    assert clean_text("  only 123 456  ") == "only"
    assert clean_text("123") == ""  # engine returns '' instead of raising


def test_truncate_noop():
    assert truncate_text("short", max_bytes_length=100) == "short"
    assert truncate_text("") == ""


def test_truncate_bytes_cap_multibyte():
    text = "é" * 100  # 2 bytes each
    out = truncate_text(text, max_bytes_length=7, truncate_to_space=False)
    assert len(out.encode("utf-8")) <= 7
    assert out == "é" * 3


def test_truncate_str_cap():
    assert truncate_text("abcdef", max_str_length=3, truncate_to_space=False) == "abc"


def test_truncate_to_space():
    text = ("word " * 50).strip()  # 249 chars
    out = truncate_text(text, max_str_length=200, truncate_to_space=True)
    assert len(out) <= 200
    assert not out.endswith(" ")
    # backed off to a whole word within the 1% window
    assert out.split()[-1] == "word"


def test_truncate_never_exceeds_cap_property():
    text = "αβγ δεζ " * 40
    for cap in range(1, 60):
        out = truncate_text(text, max_bytes_length=cap)
        assert len(out.encode("utf-8")) <= cap


def test_split_filename():
    assert split_filename("report.PDF") == ("report", ".pdf")
    assert split_filename("archive.tar.gz") == ("archive", ".tar.gz")
    assert split_filename("data.001") == ("data", ".001")
    assert split_filename("page.htm") == ("page", ".html")
    assert split_filename("photo.jpeg") == ("photo", ".jpg")
    assert split_filename("/tmp/x/noext.") == ("noext", ".")
    assert split_filename("plain") == ("plain", "")


def test_truncate_keeps_complete_char_at_exact_boundary():
    """A multibyte char whose last byte lands exactly on the cap must be
    KEPT (maximal-prefix contract): the old backoff stripped it."""
    assert truncate_text("éé", max_bytes_length=2, truncate_to_space=False) == "é"
    assert truncate_text("aéxyz", max_bytes_length=3, truncate_to_space=False) == "aé"
    # mid-sequence cut still drops the incomplete char only
    assert truncate_text("aé", max_bytes_length=2, truncate_to_space=False) == "a"


def test_split_filename_split_archive_three_digits():
    from language_identification_ray.functions.textnorm import split_filename

    assert split_filename("backup.tar.001") == ("backup", ".tar.001")
    assert split_filename("backup.tar.100") == ("backup", ".tar.100")
    assert split_filename("backup.tar.999") == ("backup", ".tar.999")


def test_fix_mojibake_non_latin_scripts():
    """Cyrillic/Greek/Arabic mojibake has lead chars Ð/Ñ/Î/Ï/Ø/Ù — outside
    the old [Â-Åâ] hint class, so it was never repaired."""
    for original in ["Привет мир", "Γειά σου κόσμε", "مرحبا بالعالم"]:
        bad = original.encode("utf-8").decode("cp1252", errors="replace")
        if "�" in bad:  # bytes undefined in cp1252: decode path differs
            bad = original.encode("utf-8").decode("latin-1")
        assert fix_mojibake(bad) == original


def test_fix_mojibake_tokenwise_when_emoji_blocks_whole_text():
    """One char outside cp1252/latin-1 (emoji) must not veto repairing the
    mojibake spans elsewhere in the document."""
    mixed = "don’t stop".encode("utf-8").decode("cp1252") + " 😀"
    assert fix_mojibake(mixed) == "don’t stop 😀"


def test_fix_mojibake_still_leaves_mixed_clean_text():
    for s in ["¿Cómo está? 😀", "café crème 中文", "naïve — test"]:
        assert fix_mojibake(s) == s
