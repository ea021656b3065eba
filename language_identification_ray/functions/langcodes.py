"""ISO 639 language-code normalization (SURVEY §2.4 J5).

The reference ships a full ISO 639-3 table (``iso639_3.py``) plus ad-hoc
remaps (``datasets/tmp.py:39-150``).  The engine needs only the common
bibliographic/terminology 639-2 → 639-1 remap for the languages it scores —
public ISO data, written out compactly here.  Unknown codes pass through.
"""

from __future__ import annotations

ISO639_2_TO_1: dict[str, str] = {
    "eng": "en", "fra": "fr", "fre": "fr", "deu": "de", "ger": "de",
    "spa": "es", "ita": "it", "por": "pt", "nld": "nl", "dut": "nl",
    "msa": "ms", "may": "ms", "ind": "id", "tgl": "tl", "vie": "vi",
    "swe": "sv", "pol": "pl", "tur": "tr", "rus": "ru", "ukr": "uk",
    "ell": "el", "gre": "el", "ara": "ar", "fas": "fa", "per": "fa",
    "urd": "ur", "hin": "hi", "ben": "bn", "pan": "pa", "guj": "gu",
    "ori": "or", "tam": "ta", "tel": "te", "kan": "kn", "mal": "ml",
    "sin": "si", "tha": "th", "lao": "lo", "bod": "bo", "tib": "bo",
    "mya": "my", "bur": "my", "kat": "ka", "geo": "ka", "kor": "ko",
    "jpn": "ja", "zho": "zh", "chi": "zh", "heb": "he", "yid": "yi",
    "amh": "am", "tir": "ti", "khm": "km", "mon": "mn", "div": "dv",
    "hye": "hy", "arm": "hy", "srp": "sr", "bul": "bg", "ces": "cs",
    "cze": "cs", "slk": "sk", "slo": "sk", "ron": "ro", "rum": "ro",
    "hun": "hu", "fin": "fi", "dan": "da", "nor": "no", "isl": "is",
    "ice": "is", "cat": "ca", "eus": "eu", "baq": "eu", "glg": "gl",
    "hrv": "hr", "lit": "lt", "lav": "lv", "est": "et", "mar": "mr",
    "nep": "ne", "san": "sa", "asm": "as",
}


def to_iso639_1(code: str) -> str:
    """639-2 (B or T) → 639-1 where one exists; already-short or unknown
    codes pass through LOWERCASED (the reference's .get fallback,
    ``scripts_langid.py:31``, over its already-lowercase keys).  Lowercasing
    the fallback too keeps normalization total: 'ENG' and 'EN' must land in
    the same group as 'en', not split one language into case-variant keys."""
    if not code:
        return code
    low = code.lower()
    return ISO639_2_TO_1.get(low, low)
