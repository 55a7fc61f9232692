"""Suffix-array longest-common-substring verification (stage S7).

The north rule's "suffix-array substring pass confirms exact duplicate
spans": for each candidate pair we build a suffix array (prefix-doubling on
np.argsort / np.lexsort) + Kasai LCP over the concatenation
    tokens_a ++ [SEP] ++ tokens_b
and take the max LCP between suffixes from different halves — the longest
common token run. For the audio channel tokens are event symbols and the
span is converted back to milliseconds via the events' true durations; for
the transcript channel tokens are codepoints and the span is characters.

Token sequences are short (hundreds), so O(n log^2 n) NumPy is plenty and
each verify batch stays vectorized inside applyInPandas.
"""

from __future__ import annotations

import numpy as np


def suffix_array(tokens: np.ndarray) -> np.ndarray:
    """Suffix array via prefix doubling; tokens: 1-D integer array."""
    n = tokens.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # initial ranks from token values
    order = np.argsort(tokens, kind="stable")
    ranks = np.empty(n, dtype=np.int64)
    sorted_t = tokens[order]
    ranks[order] = np.concatenate(([0], np.cumsum(sorted_t[1:] != sorted_t[:-1])))
    k = 1
    idx = np.arange(n)
    while k < n:
        key2 = np.where(idx + k < n, np.append(ranks, -1)[np.minimum(idx + k, n)], -1)
        order = np.lexsort((key2, ranks))
        r1, r2 = ranks[order], key2[order]
        new = np.empty(n, dtype=np.int64)
        changed = np.concatenate(([0], ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(np.int64)))
        new[order] = np.cumsum(changed)
        ranks = new
        if ranks[order[-1]] == n - 1:
            break
        k <<= 1
    return order


def lcp_array(tokens: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(suffix sa[i-1], suffix sa[i]); lcp[0] = 0."""
    n = tokens.shape[0]
    lcp = np.zeros(n, dtype=np.int64)
    if n < 2:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and tokens[i + h] == tokens[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_run(a: np.ndarray, b: np.ndarray) -> tuple[int, int, int]:
    """Longest common substring of two integer token sequences.

    Returns (length, start_in_a, start_in_b); (0, -1, -1) when none.
    """
    na, nb = a.shape[0], b.shape[0]
    if na == 0 or nb == 0:
        return 0, -1, -1
    lo = min(int(a.min()), int(b.min()))
    sep = lo - 1
    s = np.concatenate((a.astype(np.int64), [sep], b.astype(np.int64)))
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    side = sa < na                       # True = suffix starts in a
    cross = side[1:] != side[:-1]        # adjacent suffixes from different halves
    if not cross.any():
        return 0, -1, -1
    cand = np.flatnonzero(cross) + 1     # lcp index
    best_i = cand[np.argmax(lcp[cand])]
    length = int(lcp[best_i])
    if length <= 0:
        return 0, -1, -1
    p1, p2 = int(sa[best_i - 1]), int(sa[best_i])
    pa, pb = (p1, p2) if p1 < na else (p2, p1)
    return length, pa, pb - na - 1
