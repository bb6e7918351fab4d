"""Suffix array with O(n log^2 n) prefix-doubling construction (numpy
argsort-based — Manber & Myers 1990 style) and binary-search substring
queries. Used by the containment pass to find exact substring
duplicates that MinHash misses (low-Jaccard containment)."""

from __future__ import annotations

import numpy as np


class SuffixArray:
    __slots__ = ("text", "sa")

    def __init__(self, text: str):
        self.text = text
        n = len(text)
        if n == 0:
            self.sa = np.empty(0, np.int64)
            return
        # prefix doubling over codepoint ranks
        rank = np.frombuffer(text.encode("utf-32-le"), np.uint32).astype(np.int64)
        sa = np.argsort(rank, kind="stable")
        tmp = np.empty(n, np.int64)
        k = 1
        while k < n:
            # sort by (rank[i], rank[i+k]) using lexsort
            rank2 = np.full(n, -1, np.int64)
            rank2[: n - k] = rank[k:]
            sa = np.lexsort((rank2, rank))
            # recompute ranks
            tmp[sa[0]] = 0
            prev = 0
            r_sa = rank[sa]
            r2_sa = rank2[sa]
            diff = np.empty(n, bool)
            diff[0] = False
            diff[1:] = (r_sa[1:] != r_sa[:-1]) | (r2_sa[1:] != r2_sa[:-1])
            tmp[sa] = np.cumsum(diff)
            rank = tmp.copy()
            prev = rank[sa[-1]]
            if prev == n - 1:
                break
            k <<= 1
        self.sa = sa

    def contains(self, pattern: str) -> bool:
        """True iff ``pattern`` occurs in the indexed text (binary search
        over the suffix array)."""
        if not pattern:
            return True
        text, sa = self.text, self.sa
        lo, hi = 0, len(sa)
        m = len(pattern)
        while lo < hi:
            mid = (lo + hi) // 2
            start = sa[mid]
            if text[start : start + m] < pattern:
                lo = mid + 1
            else:
                hi = mid
        if lo == len(sa):
            return False
        start = sa[lo]
        return text[start : start + m] == pattern
