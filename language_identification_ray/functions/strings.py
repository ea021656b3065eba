"""String / sequence distance functions (SURVEY §2.8).

Fresh implementations of the published algorithms the reference uses:
Levenshtein (two-row DP), Damerau–Levenshtein with adjacent transpositions
(reference contract at ``dictionary_langid/datatypes.py:344-387``), and the
1-D earth-mover's distance between n-gram position lists
(``dictionary_langid/datatypes.py:209-341``).

The EMD here is an exact O(n·m) dynamic program (monotone matching on sorted
sequences) — the reference's fast path falls back to exponential enumeration
of combinations for the hard case; the DP is equivalent and bounded.  A
brute-force differential check lives in the tests, mirroring the reference's
own fast-vs-slow assertion pattern.
"""

from __future__ import annotations

from itertools import combinations
from typing import List, Sequence


def levenshtein(s1: Sequence, s2: Sequence) -> int:
    """Classic edit distance, O(min(n,m)) space."""
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    prev = list(range(len(s1) + 1))
    for j, c2 in enumerate(s2, 1):
        cur = [j]
        for i, c1 in enumerate(s1, 1):
            cur.append(min(prev[i] + 1, cur[-1] + 1, prev[i - 1] + (c1 != c2)))
        prev = cur
    return prev[-1]


def damerau_levenshtein(s1: Sequence, s2: Sequence) -> int:
    """Edit distance + adjacent transpositions (restricted DL)."""
    n, m = len(s1), len(s2)
    if n == 0:
        return m
    if m == 0:
        return n
    two_ago: List[int] = []
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = s1[i - 1] != s2[j - 1]
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and s1[i - 1] == s2[j - 2]
                and s1[i - 2] == s2[j - 1]
                and cost
            ):
                cur[j] = min(cur[j], two_ago[j - 2] + 1)
        two_ago, prev = prev, cur
    return prev[m]


def emd_1d(xs: Sequence[float], ys: Sequence[float]) -> float:
    """1-D EMD between two position lists in [0, 1].

    Semantics (matching the reference's contract): every point of the shorter
    list matches a distinct point of the longer list; cost = Σ|x−y| over the
    matching (minimized) + 1 per unmatched longer-list point.  For equal
    lengths the optimal matching is the sorted pairing.

    Exact O(n·m) DP: with both lists sorted, an optimal matching is monotone,
    so D[i][j] = cost of matching first j ys within first i xs =
    min(D[i-1][j] (skip x_i), D[i-1][j-1] + |x_i − y_j|).
    """
    if len(xs) < len(ys):
        xs, ys = ys, xs
    n, m = len(xs), len(ys)
    if m == 0:
        return float(n)
    x = sorted(xs)
    y = sorted(ys)
    INF = float("inf")
    prev = [0.0] + [INF] * m
    for i in range(1, n + 1):
        cur = [0.0] + [INF] * m
        for j in range(1, min(i, m) + 1):
            cur[j] = min(prev[j], prev[j - 1] + abs(x[i - 1] - y[j - 1]))
        prev = cur
    return prev[m] + (n - m)


def emd_1d_brute(xs: Sequence[float], ys: Sequence[float]) -> float:
    """Exponential reference implementation (differential testing only)."""
    if len(xs) < len(ys):
        xs, ys = ys, xs
    if not ys:
        return float(len(xs))
    best = min(
        sum(abs(a - b) for a, b in zip(sorted(comb), sorted(ys)))
        for comb in combinations(sorted(xs), len(ys))
    )
    return best + (len(xs) - len(ys))
