"""CharSet — immutable character-set value type with range/regex interop.

The reference builds all of its script detection on a frozen CharSet
abstraction (reference ``datatypes.py:70-460``; duplicated at
``script_langid/datatypes.py:66-456``): a set of single characters
convertible to/from ``[(lo, hi)]`` codepoint ranges, supporting full set
algebra, and compilable to a regex character class.  In this engine the
*hot path* never touches CharSet (chars are classified through dense numpy
tables, ``state/scripts.py``); CharSet is the config-time API those tables
are generated from and the user-facing way to define custom script/filter
classes (SURVEY §2.7 D1: config-time only).

From-scratch implementation; set algebra mirrors ``frozenset`` semantics.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator, List, Tuple


class CharSet:
    """Immutable set of single characters."""

    __slots__ = ("_chars",)

    def __init__(self, chars: Iterable[str] = ()):
        out = set()
        for c in chars:
            if not isinstance(c, str) or len(c) != 1:
                raise ValueError(f"CharSet elements must be single chars, got {c!r}")
            out.add(c)
        object.__setattr__(self, "_chars", frozenset(out))

    def __setattr__(self, name, value):
        # actually enforce immutability — hash/eq contracts depend on it
        # (without this, the object.__setattr__ ceremony above is theater)
        raise AttributeError("CharSet is immutable")

    # -- constructors ----------------------------------------------------
    @classmethod
    def from_ranges(cls, ranges: Iterable[Tuple[int, int]]) -> "CharSet":
        """[(lo, hi)] inclusive codepoint ranges → CharSet."""
        chars = []
        for lo, hi in ranges:
            if lo > hi:
                raise ValueError(f"invalid range {(lo, hi)}")
            chars.extend(chr(cp) for cp in range(lo, hi + 1))
        return cls(chars)

    @classmethod
    def from_string(cls, s: str) -> "CharSet":
        return cls(iter(s))

    # -- views ------------------------------------------------------------
    @property
    def ranges(self) -> List[Tuple[int, int]]:
        """Minimal sorted list of inclusive (lo, hi) codepoint ranges."""
        if not self._chars:
            return []
        cps = sorted(ord(c) for c in self._chars)
        out = []
        lo = prev = cps[0]
        for cp in cps[1:]:
            if cp == prev + 1:
                prev = cp
                continue
            out.append((lo, prev))
            lo = prev = cp
        out.append((lo, prev))
        return out

    def to_regex(self) -> str:
        """Regex character class matching exactly this set (`[...]`)."""
        if not self._chars:
            # matches nothing: empty negative lookahead trick
            return r"(?!)"
        parts = []
        for lo, hi in self.ranges:
            if hi == lo:
                parts.append(re.escape(chr(lo)))
            elif hi == lo + 1:
                parts.append(re.escape(chr(lo)) + re.escape(chr(hi)))
            else:
                parts.append(f"{re.escape(chr(lo))}-{re.escape(chr(hi))}")
        return "[" + "".join(parts) + "]"

    def compile(self) -> "re.Pattern":
        return re.compile(self.to_regex())

    # -- set algebra (reference datatypes.py:257-358) ---------------------
    def union(self, *others: "CharSet") -> "CharSet":
        s = self._chars
        for o in others:
            s = s | o._chars
        return _wrap(s)

    def intersection(self, *others: "CharSet") -> "CharSet":
        s = self._chars
        for o in others:
            s = s & o._chars
        return _wrap(s)

    def difference(self, *others: "CharSet") -> "CharSet":
        s = self._chars
        for o in others:
            s = s - o._chars
        return _wrap(s)

    def symmetric_difference(self, other: "CharSet") -> "CharSet":
        return _wrap(self._chars ^ other._chars)

    __or__ = union
    __and__ = intersection
    __sub__ = difference
    __xor__ = symmetric_difference

    def issubset(self, other: "CharSet") -> bool:
        return self._chars <= other._chars

    def issuperset(self, other: "CharSet") -> bool:
        return self._chars >= other._chars

    def isdisjoint(self, other: "CharSet") -> bool:
        return self._chars.isdisjoint(other._chars)

    # -- protocol ----------------------------------------------------------
    def __contains__(self, c: str) -> bool:
        return c in self._chars

    def __iter__(self) -> Iterator[str]:
        return iter(sorted(self._chars))

    def __len__(self) -> int:
        return len(self._chars)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, CharSet) and self._chars == other._chars

    def __hash__(self) -> int:
        return hash(self._chars)

    def __repr__(self) -> str:
        r = self.ranges
        show = ", ".join(f"U+{lo:04X}-U+{hi:04X}" if hi != lo else f"U+{lo:04X}" for lo, hi in r[:4])
        more = f", +{len(r) - 4} ranges" if len(r) > 4 else ""
        return f"CharSet({len(self)} chars: {show}{more})"


def _wrap(chars: frozenset) -> CharSet:
    cs = CharSet.__new__(CharSet)
    object.__setattr__(cs, "_chars", chars)
    return cs


def script_charset(script_name: str) -> CharSet:
    """CharSet for one of the engine's script tables (state/scripts.py)."""
    from language_identification_ray.state.scripts import SCRIPT_RANGES

    return CharSet.from_ranges(SCRIPT_RANGES[script_name])
