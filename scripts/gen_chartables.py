"""Generate the codepoint→character-class and codepoint→script lookup tables.

The reference classifies characters one at a time with lru_cached calls to
``unicodedata.category`` (reference ``tokenizer.py:148-178``).  For a Ray Data
engine we want a single vectorized ``TABLE[codepoints]`` gather instead, so
this build-time script bakes two dense uint8 arrays over all 0x110000
codepoints into ``language_identification_ray/state/assets/chartables.npz``:

  * ``charclass``: 0=other/punct/symbol, 1=word (L* + M*), 2=space, 3=digit
    (Nd/Nl/No), 4=unprintable (Cc/Cf/Cs/Cn surrogates etc. -- still tokenized
    as punctuation, matching the reference's is_punctuation_char which folds
    unprintables into punctuation, tokenizer.py:164-173)
  * ``script``: index into SCRIPT_NAMES (see state/scripts.py) from
    public Unicode block ranges.
  * ``lower``: codepoint → lowercased codepoint (first char of str.lower()),
    so batch-level lowercasing is a numpy gather too.

Deterministic: depends only on the CPython unicodedata version, which is
pinned by the container.  Run: ``python scripts/gen_chartables.py``.
"""

from __future__ import annotations

import sys
import unicodedata
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from language_identification_ray.state.scripts import SCRIPT_RANGES  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "language_identification_ray" / "state" / "assets" / "chartables.npz"

N = 0x110000

WORD_CATS = {"Lu", "Ll", "Lt", "Lm", "Lo", "Mn", "Mc", "Me"}
DIGIT_CATS = {"Nd", "Nl", "No"}
UNPRINTABLE_CATS = {"Cc", "Cf", "Cs", "Cn"}

# Unicode whitespace (category Zs/Zl/Zp plus the ASCII control whitespace)
SPACE_CHARS = set(" \t\n\r\v\f\x1c\x1d\x1e\x1f\x85\xa0")


def main() -> None:
    charclass = np.zeros(N, dtype=np.uint8)
    for cp in range(N):
        ch = chr(cp)
        cat = unicodedata.category(ch)
        if ch in SPACE_CHARS or cat in ("Zs", "Zl", "Zp"):
            charclass[cp] = 2
        elif cat in WORD_CATS:
            charclass[cp] = 1
        elif cat in DIGIT_CATS:
            charclass[cp] = 3
        elif cat in UNPRINTABLE_CATS:
            charclass[cp] = 4
        # else 0 = punctuation / symbol

    script = np.zeros(N, dtype=np.uint8)
    for sid, (_name, ranges) in enumerate(SCRIPT_RANGES.items()):
        for lo, hi in ranges:
            script[lo : hi + 1] = sid
    # scripts only apply to letter-ish chars; zero out non-word codepoints so
    # punctuation shared across scripts doesn't vote
    script[charclass != 1] = 0

    lower = np.arange(N, dtype=np.uint32)
    for cp in range(N):
        lo = chr(cp).lower()
        if len(lo) >= 1 and lo != chr(cp):
            lower[cp] = ord(lo[0])

    np.savez_compressed(OUT, charclass=charclass, script=script, lower=lower)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
