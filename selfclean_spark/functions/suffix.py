"""Per-partition suffix-array kernel for exact substring confirmation.

North-rule requirement: "exact substring duplicates confirmed via
per-partition suffix-array construction".  The kernel is pure NumPy
(prefix-doubling build = O(n log n) vectorized passes) and runs ONLY
inside a pandas UDF over already-candidate pairs / clusters — never as
a distributed suffix construction (SURVEY.md §4.2).

The reference has no substring notion (images); this generalizes its
"exact duplicate ⇒ distance 0" invariant
(tests/unittests/cleaner/near_duplicates/test_embedding_distance.py:22-40)
to verbatim-containment for source text.
"""

from __future__ import annotations

import numpy as np


def suffix_array(data: bytes) -> np.ndarray:
    """Suffix array of ``data`` via vectorized prefix doubling.

    Returns int64 positions sorted by suffix.  O(n log n) numpy passes,
    no per-character Python.
    """
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    idx = np.arange(n, dtype=np.int64)
    k = 1
    order = np.argsort(rank, kind="stable")
    while True:
        shifted = idx + k
        key2 = np.where(shifted < n, rank[np.minimum(shifted, n - 1)], np.int64(-1))
        order = np.lexsort((key2, rank))
        boundary = (rank[order][1:] != rank[order][:-1]) | (
            key2[order][1:] != key2[order][:-1]
        )
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.concatenate(([0], np.cumsum(boundary)))
        rank = new_rank
        if rank[order[-1]] == n - 1:  # all ranks distinct → done
            break
        k *= 2
    return order


def sa_contains(haystack: bytes, sa: np.ndarray, needle: bytes) -> bool:
    """Binary-search ``needle`` against a prebuilt suffix array of
    ``haystack``.  O(|needle| · log |haystack|) — build the array once
    per document (per-batch cache in the verify stage), search once per
    candidate pair."""
    if len(needle) == 0:
        return True
    if len(needle) > len(haystack):
        return False
    lo, hi = 0, len(sa)
    m = len(needle)
    while lo < hi:
        mid = (lo + hi) // 2
        start = sa[mid]
        if haystack[start : start + m] < needle:
            lo = mid + 1
        else:
            hi = mid
    if lo == len(sa):
        return False
    start = sa[lo]
    return haystack[start : start + m] == needle


def contains_via_suffix_array(haystack: bytes, needle: bytes) -> bool:
    """Exact substring test with a one-shot suffix-array build."""
    if len(needle) == 0:
        return True
    if len(needle) > len(haystack):
        return False
    return sa_contains(haystack, suffix_array(haystack), needle)


def is_substring_pair(a: str, b: str) -> bool:
    """True iff the shorter of (a, b) occurs verbatim inside the longer."""
    ab, bb = a.encode("utf-8", "surrogatepass"), b.encode("utf-8", "surrogatepass")
    if len(ab) > len(bb):
        ab, bb = bb, ab
    return contains_via_suffix_array(bb, ab)
