"""Suffix-array kernels for exact substring-level duplicate detection.

The reference estimates *set* similarity (minimizer Jaccard); the north_rule
additionally requires a distributed suffix-array pass that finds EXACT shared
substrings ("duplicate spans") between conversations.  These kernels are the
per-pair core of that pass: pure numpy/python, no Spark — the distributed
part (anchor winnowing -> anchor equi-join -> per-pair verification) lives in
``operators/substring.py``.

Algorithms (all textbook, public):
- suffix array by prefix doubling (Manber-Myers) on numpy ``lexsort``;
- LCP array by Kasai's algorithm;
- cross-document best-match LCP by the standard two-sweep over the suffix
  array of ``a + SEP + b`` (SEP is an out-of-alphabet sentinel), yielding for
  every position of ``a`` the longest prefix it shares with ANY position of
  ``b`` — exactly the "duplicate span" signal used for substring dedup.
"""

from __future__ import annotations

import numpy as np

_EMPTY_I64 = np.empty(0, dtype=np.int64)


def suffix_array(data: np.ndarray) -> np.ndarray:
    """Suffix array (int64 start positions in lexicographic suffix order).

    Prefix doubling: O(n log n) rounds of numpy ``lexsort``.  ``data`` is any
    integer array; out-of-range sentinels are fine (they just occupy a rank).
    A shorter suffix sorts before any extension of it (rank padding is -1,
    below every real rank).
    """
    data = np.asarray(data)
    n = data.shape[0]
    if n == 0:
        return _EMPTY_I64
    rank = np.unique(data, return_inverse=True)[1].astype(np.int64)
    k = 1
    while True:
        second = np.full(n, -1, dtype=np.int64)
        if k < n:
            second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        r1, r2 = rank[order], second[order]
        diff = np.empty(n, dtype=np.int64)
        diff[0] = 0
        diff[1:] = ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(np.int64)
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(diff)
        rank = new_rank
        if rank[order[-1]] == n - 1:  # all ranks distinct => fully ordered
            return order.astype(np.int64)
        k *= 2


def lcp_array(data: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: ``lcp[r]`` = longest common prefix of suffixes ``sa[r-1]``
    and ``sa[r]`` (``lcp[0] = 0``).  O(n) total work."""
    data = np.asarray(data)
    n = data.shape[0]
    if n == 0:
        return _EMPTY_I64
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n, dtype=np.int64)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = int(sa[r - 1])
            while i + h < n and j + h < n and data[i + h] == data[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def _best_cross_lcp(
    data: np.ndarray, split: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Best cross-document LCPs in BOTH directions from ONE suffix array.

    ``data`` = bytes(A) + [sentinel at ``split``] + bytes(B).  Returns
    ``(best_a, partner_a, best_b)``: for every position of A the longest
    prefix shared with any B suffix (+ a matching B position), and for every
    position of B the longest prefix shared with any A suffix.  Two sweeps
    over (SA, LCP): the LCP of two arbitrary suffixes is the min of adjacent
    LCPs between their ranks, so each side's best partner is the nearest
    other-side suffix above or below it in suffix order.
    """
    n = data.shape[0]
    sa = suffix_array(data)
    lcp = lcp_array(data, sa)
    len_b = n - split - 1
    best_a = np.zeros(split, dtype=np.int64)
    partner_a = np.full(split, -1, dtype=np.int64)
    best_b = np.zeros(max(len_b, 0), dtype=np.int64)

    for ranks in (range(n), range(n - 1, -1, -1)):
        last_b = -1  # position (in data) of last B-suffix seen this sweep
        run_b = 0  # min LCP between that B-suffix and the current rank
        seen_a = False
        run_a = 0  # min LCP since the last A-suffix
        prev_r = None
        for r in ranks:
            if prev_r is not None:
                # adjacent-lcp index is the larger of the two ranks
                step = int(lcp[r] if r > prev_r else lcp[prev_r])
                if step < run_b:
                    run_b = step
                if step < run_a:
                    run_a = step
            pos = int(sa[r])
            if pos > split:
                if seen_a:
                    m = min(run_a, n - pos)
                    j = pos - split - 1
                    if m > best_b[j]:
                        best_b[j] = m
                last_b = pos
                run_b = n  # reset: next A-suffix mins from here
            elif pos < split:
                if last_b >= 0:
                    # cap by the sentinel: a match can't cross `split`
                    m = min(run_b, split - pos)
                    if m > best_a[pos]:
                        best_a[pos] = m
                        partner_a[pos] = last_b - split - 1
                seen_a = True
                run_a = n
            prev_r = r
    return best_a, partner_a, best_b


def substring_stats(a: str, b: str, min_len: int) -> dict:
    """Exact substring-duplication stats between two texts.

    Returns coverage (how many bytes of each text lie inside some shared
    substring of length >= min_len), the longest shared substring, and the
    list of maximal duplicate spans ``(pos_a, pos_b, length)`` (byte offsets;
    each span verified exact, not left-extendable against its partner).
    """
    ab = np.frombuffer(a.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    bb = np.frombuffer(b.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    if ab.size == 0 or bb.size == 0:
        return {"cov_a": 0, "cov_b": 0, "longest": 0, "spans": []}
    data = np.concatenate([ab, np.array([256], dtype=np.int64), bb])
    split = ab.size
    # one suffix array yields both directions (A-side spans + B-side coverage)
    best_a, part_a, best_b = _best_cross_lcp(data, split)

    longest = int(best_a.max()) if best_a.size else 0

    def _coverage(best: np.ndarray) -> int:
        hit = best >= min_len
        if not hit.any():
            return 0
        ends = np.where(hit, np.arange(best.size) + best, 0)
        reach = np.maximum.accumulate(ends)
        covered = (np.arange(best.size) < reach) | hit
        return int(covered.sum())

    spans: list[tuple[int, int, int]] = []
    for i in np.nonzero(best_a >= min_len)[0]:
        j = int(part_a[i])
        length = int(best_a[i])
        if i > 0 and j > 0 and ab[i - 1] == bb[j - 1]:
            continue  # left-extendable => not maximal
        spans.append((int(i), j, length))

    return {
        "cov_a": _coverage(best_a),
        "cov_b": _coverage(best_b),
        "longest": longest,
        "spans": spans,
    }
