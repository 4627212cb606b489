"""Edit distance with an early-exit band.

The reference uses the C ``Levenshtein`` package (entity_matcher.py:247,288,357);
that package is not available here, so this is a small banded DP — exact for
distances <= ``max_dist`` and returning ``max_dist + 1`` beyond it, which is
all the matcher semantics need (thresholded comparisons only). Operands are
short (words / entity surface forms), so pure Python is fine.
"""

from __future__ import annotations


def levenshtein(a: str, b: str, max_dist: int | None = None) -> int:
    """Levenshtein distance; if ``max_dist`` is given, any true distance
    greater than it is reported as ``max_dist + 1`` (early exit)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la > lb:  # ensure b is the longer → narrower DP rows
        a, b, la, lb = b, a, lb, la
    if max_dist is not None and lb - la > max_dist:
        return max_dist + 1
    if la == 0:
        return lb if max_dist is None else min(lb, max_dist + 1)

    prev = list(range(la + 1))
    cur = [0] * (la + 1)
    for j in range(1, lb + 1):
        cur[0] = j
        bj = b[j - 1]
        row_min = cur[0]
        for i in range(1, la + 1):
            cost = 0 if a[i - 1] == bj else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
            if cur[i] < row_min:
                row_min = cur[i]
        if max_dist is not None and row_min > max_dist:
            return max_dist + 1
        prev, cur = cur, prev
    d = prev[la]
    if max_dist is not None and d > max_dist:
        return max_dist + 1
    return d
