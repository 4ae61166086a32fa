"""Edit distance (no external Levenshtein dependency).

The reference imports ``Levenshtein.distance`` (reference ``ontonotes5/utils.py:7``);
this is a self-contained equivalent: classic two-row Wagner-Fischer with unit
insert/delete/substitute costs. Strings in this workload are tokens/tags
(short), so the O(len_a*len_b) Python loop is fine; callers that need bulk
distances should memoize (see ``functions.align``).
"""

from __future__ import annotations

from functools import lru_cache


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance between two strings."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    if la < lb:  # keep the inner row the shorter one
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        ca = a[i - 1]
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[lb]


@lru_cache(maxsize=65536)
def levenshtein_cached(a: str, b: str) -> int:
    """Memoized variant for hot inner loops (subword split, tag clustering)."""
    return levenshtein(a, b)
