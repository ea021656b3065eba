"""Unicode script ranges and script→language priors.

The reference drives its script-based detector from a 579 KB ``scripts.json``
built out of UCD + CLDR data (reference ``script_langid/scripts_langid.py:16-36``,
``script-langid.ipynb``).  We re-derive a compact equivalent from public
Unicode block knowledge: a codepoint→script-id table (baked into
``assets/chartables.npz`` by ``scripts/gen_chartables.py``) plus a
script→candidate-languages prior table below.

Everything here is public Unicode Standard block data (www.unicode.org/charts)
and widely published ISO 639 ↔ ISO 15924 associations — no reference assets
are copied.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

import numpy as np

_ASSET = Path(__file__).parent / "assets" / "chartables.npz"

# script name -> list of (lo, hi) inclusive codepoint ranges.
# Order matters: index in this dict == script id in the baked table.
# Index 0 is the catch-all (Common / unassigned).
SCRIPT_RANGES: dict[str, list[tuple[int, int]]] = {
    "Common": [(0x0000, 0x0040)],  # placeholder; id 0 = anything not claimed
    "Latin": [
        (0x0041, 0x005A), (0x0061, 0x007A), (0x00C0, 0x024F),
        (0x1E00, 0x1EFF), (0x2C60, 0x2C7F), (0xA720, 0xA7FF),
    ],
    "Greek": [(0x0370, 0x03FF), (0x1F00, 0x1FFF)],
    "Cyrillic": [(0x0400, 0x04FF), (0x0500, 0x052F), (0x2DE0, 0x2DFF), (0xA640, 0xA69F)],
    "Armenian": [(0x0530, 0x058F)],
    "Hebrew": [(0x0590, 0x05FF)],
    "Arabic": [(0x0600, 0x06FF), (0x0750, 0x077F), (0x08A0, 0x08FF), (0xFB50, 0xFDFF), (0xFE70, 0xFEFF)],
    "Syriac": [(0x0700, 0x074F)],
    "Thaana": [(0x0780, 0x07BF)],
    "Devanagari": [(0x0900, 0x097F), (0xA8E0, 0xA8FF)],
    "Bengali": [(0x0980, 0x09FF)],
    "Gurmukhi": [(0x0A00, 0x0A7F)],
    "Gujarati": [(0x0A80, 0x0AFF)],
    "Oriya": [(0x0B00, 0x0B7F)],
    "Tamil": [(0x0B80, 0x0BFF)],
    "Telugu": [(0x0C00, 0x0C7F)],
    "Kannada": [(0x0C80, 0x0CFF)],
    "Malayalam": [(0x0D00, 0x0D7F)],
    "Sinhala": [(0x0D80, 0x0DFF)],
    "Thai": [(0x0E00, 0x0E7F)],
    "Lao": [(0x0E80, 0x0EFF)],
    "Tibetan": [(0x0F00, 0x0FFF)],
    "Myanmar": [(0x1000, 0x109F), (0xAA60, 0xAA7F)],
    "Georgian": [(0x10A0, 0x10FF), (0x2D00, 0x2D2F)],
    "HangulJamo": [(0x1100, 0x11FF), (0x3130, 0x318F), (0xA960, 0xA97F), (0xD7B0, 0xD7FF)],
    "Ethiopic": [(0x1200, 0x139F), (0x2D80, 0x2DDF)],
    "Cherokee": [(0x13A0, 0x13FF)],
    "Tagalog": [(0x1700, 0x171F)],
    "Khmer": [(0x1780, 0x17FF), (0x19E0, 0x19FF)],
    "Mongolian": [(0x1800, 0x18AF)],
    "Hiragana": [(0x3040, 0x309F)],
    "Katakana": [(0x30A0, 0x30FF), (0x31F0, 0x31FF), (0xFF66, 0xFF9D)],
    "Bopomofo": [(0x3100, 0x312F), (0x31A0, 0x31BF)],
    "Han": [
        (0x2E80, 0x2EFF), (0x3400, 0x4DBF), (0x4E00, 0x9FFF),
        (0xF900, 0xFAFF), (0x20000, 0x2A6DF),
    ],
    "HangulSyllables": [(0xAC00, 0xD7AF)],
    "Deseret": [(0x10400, 0x1044F)],
}

SCRIPT_NAMES: list[str] = list(SCRIPT_RANGES.keys())
SCRIPT_ID: dict[str, int] = {name: i for i, name in enumerate(SCRIPT_NAMES)}

# script -> languages plausibly written in it (ISO 639-1 where one exists).
# Public associations (CLDR likely-subtags style).  Used as the prior for the
# script-based detector; Latin/Cyrillic/Arabic are disambiguated further by
# the stopword / n-gram models.
SCRIPT_LANGS: dict[str, list[str]] = {
    "Latin": ["en", "fr", "de", "es", "it", "pt", "nl", "ms", "id", "tl", "vi", "sv", "pl", "tr"],
    "Greek": ["el"],
    "Cyrillic": ["ru", "uk", "bg", "sr"],
    "Armenian": ["hy"],
    "Hebrew": ["he", "yi"],
    "Arabic": ["ar", "fa", "ur"],
    "Syriac": ["syr"],
    "Thaana": ["dv"],
    "Devanagari": ["hi", "mr", "ne", "sa", "ur"],
    "Bengali": ["bn", "as"],
    "Gurmukhi": ["pa"],
    "Gujarati": ["gu"],
    "Oriya": ["or"],
    "Tamil": ["ta"],
    "Telugu": ["te"],
    "Kannada": ["kn"],
    "Malayalam": ["ml"],
    "Sinhala": ["si"],
    "Thai": ["th"],
    "Lao": ["lo"],
    "Tibetan": ["bo"],
    "Myanmar": ["my"],
    "Georgian": ["ka"],
    "HangulJamo": ["ko"],
    "Ethiopic": ["am", "ti"],
    "Cherokee": ["chr"],
    "Tagalog": ["tl"],
    "Khmer": ["km"],
    "Mongolian": ["mn"],
    "Hiragana": ["ja"],
    "Katakana": ["ja"],
    "Bopomofo": ["zh"],
    "Han": ["zh", "ja"],
    "HangulSyllables": ["ko"],
    "Deseret": ["en"],
}

SUPPORTED_LANGUAGES: list[str] = sorted({lang for langs in SCRIPT_LANGS.values() for lang in langs})


@lru_cache(maxsize=1)
def load_chartables() -> tuple[np.ndarray, np.ndarray]:
    """(charclass, script) dense uint8 arrays over all codepoints.

    charclass: 0=punct/symbol 1=word 2=space 3=digit 4=unprintable.
    Node-local mmap (see ``state/asset_cache.py``): the pages are shared by
    every actor on the host instead of re-faulted per worker.
    """
    from language_identification_ray.state.asset_cache import mmap_derived

    def _member(key):
        def build():
            with np.load(_ASSET) as z:
                return z[key]

        return build

    return (
        mmap_derived("chartables-charclass", _ASSET, _member("charclass")),
        mmap_derived("chartables-script", _ASSET, _member("script")),
    )


@lru_cache(maxsize=1)
def load_lower_table() -> np.ndarray:
    """codepoint → lowercase codepoint (uint32 gather table), node-local mmap."""
    from language_identification_ray.state.asset_cache import mmap_derived

    def build():
        with np.load(_ASSET) as z:
            return z["lower"]

    return mmap_derived("chartables-lower", _ASSET, build)


@lru_cache(maxsize=1)
def load_nd_table() -> np.ndarray:
    """codepoint → 1 iff Unicode category Nd (uint8 gather table, node-local
    mmap).  ``str.isdecimal()`` is exactly category Nd, which is exactly what
    Python's ``re`` ``\\d`` matches — so vectorized decimal-dot detection via
    this table is bit-identical to the regex it replaces.  NOT the same set
    as charclass 3 (that covers all of Nd/Nl/No: '²' and 'Ⅻ' are word
    boundaries but not ``\\d``)."""
    from language_identification_ray.state.asset_cache import mmap_derived

    def build():
        return np.fromiter(
            (chr(c).isdecimal() for c in range(0x110000)), dtype=np.uint8, count=0x110000
        )

    return mmap_derived("chartables-nd", _ASSET, build)
