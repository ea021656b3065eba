"""Character transliteration — table-driven normalizer (SURVEY §2.2 M13).

The reference ships a Deseret-alphabet conversion module
(``deseret/deseret_conversion.py:1-81``): one table mapping a legacy-font
encoding onto Deseret codepoints and one mapping Deseret onto phonemes.
The general operator is "apply a char→string mapping over a text column";
this module provides that operator plus a Deseret→phoneme sample table
derived from the *public Unicode 15 Deseret block* (U+10400-U+1044F;
phonetic values per the Unicode code chart) — NOT copied from the
reference's legacy-font data.

Vectorized via ``str.translate`` (C-level) per row; usable standalone or as
a ``map_batches`` stage through ``transliterate_batch``.
"""

from __future__ import annotations

from typing import Dict, Optional

import pyarrow as pa

# Deseret block → phoneme strings, public Unicode chart letter order
# (LONG I..EW, 40 letters per case; caps U+10400-10427, small U+10428-1044F).
_DESERET_SOUNDS = [
    "ee", "ay", "aa", "ah", "oh", "oo",          # long I E A AH O OO
    "i", "e", "a", "o", "u", "uu",               # short I E A AH O OO
    "ai", "ow",                                   # AY OW
    "w", "y", "h", "p", "b", "t", "d",           # WU YEE H PEE BEE TEE DEE
    "ch", "j", "k", "g", "f", "v",               # CHEE JEE KAY GAY EF VEE
    "th", "dh", "s", "z", "sh", "zh",            # ETH THEE ES ZEE ESH ZHEE
    "r", "l", "m", "n", "ng",                    # ER EL EM EN ENG
    "oi", "ew",                                   # OI EW
]
assert len(_DESERET_SOUNDS) == 40


def deseret_phoneme_table() -> Dict[int, str]:
    """codepoint → phoneme for both Deseret cases (80 letters)."""
    table: Dict[int, str] = {}
    for i, sound in enumerate(_DESERET_SOUNDS):
        table[0x10400 + i] = sound.upper()  # capital letters
        table[0x10428 + i] = sound          # small letters
    return table


def make_translit_table(mapping: Dict[str, str]) -> Dict[int, str]:
    """{'ä': 'ae', ...} → a ``str.translate`` table (codepoint-keyed)."""
    out: Dict[int, str] = {}
    for src, dst in mapping.items():
        if len(src) != 1:
            raise ValueError(f"source keys must be single chars, got {src!r}")
        out[ord(src)] = dst
    return out


def transliterate(text: str, table: Dict[int, str]) -> str:
    return text.translate(table)


def transliterate_batch(
    batch: pa.Table,
    table: Dict[int, str],
    text_column: str = "text",
    out_column: Optional[str] = None,
) -> pa.Table:
    """``ds.map_batches(functools.partial(transliterate_batch, table=t))`` —
    stateless task stage; the table is tiny and ships in the closure."""
    from language_identification_ray.stages.langid import set_or_append

    texts = batch[text_column].to_pylist()
    out = [(t or "").translate(table) for t in texts]
    return set_or_append(batch, out_column or text_column, pa.array(out, pa.string()))
