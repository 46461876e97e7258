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


def _suffix_array_levels(data: np.ndarray) -> tuple[np.ndarray, list[tuple[int, np.ndarray]]]:
    """Suffix array + the prefix-doubling rank snapshots that produced it.

    Each snapshot ``(k, rank_k)`` ranks the (end-padded) length-k substring
    at every position; two positions share a rank_k iff those substrings are
    equal.  The snapshots power the fully-vectorized LCP computation below
    (binary lifting) — no per-character Python loops anywhere.

    Memory bound: the log2(n) retained snapshots are int32 for any input
    this code can see (ranks < n < 2^31), i.e. ~4*ceil(log2 n) bytes/char —
    ~120 B/char at n=1M — bounded per task by the substring pass's
    concat-group cap (operators/substring.py), not by document count.
    """
    data = np.asarray(data)
    n = data.shape[0]
    if n == 0:
        return _EMPTY_I64, []
    # int32 halves snapshot memory; ranks are < n so this is exact
    dtype = np.int32 if n < 2**31 else np.int64
    rank = np.unique(data, return_inverse=True)[1].astype(dtype)
    levels: list[tuple[int, np.ndarray]] = [(1, rank)]
    k = 1
    while True:
        second = np.full(n, -1, dtype=dtype)
        if k < n:
            second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        r1, r2 = rank[order], second[order]
        diff = np.empty(n, dtype=np.int64)
        diff[0] = 0
        diff[1:] = ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(np.int64)
        new_rank = np.empty(n, dtype=dtype)
        new_rank[order] = np.cumsum(diff)
        rank = new_rank
        k *= 2
        levels.append((k, rank))
        if rank[order[-1]] == n - 1:  # all ranks distinct => fully ordered
            return order.astype(np.int64), levels


def suffix_array(data: np.ndarray) -> np.ndarray:
    """Suffix array (int64 start positions in lexicographic suffix order).

    Prefix doubling: O(n log n) rounds of numpy ``lexsort``.  ``data`` is any
    integer array; out-of-range sentinels are fine (they just occupy a rank).
    A shorter suffix sorts before any extension of it (rank padding is -1,
    below every real rank).
    """
    return _suffix_array_levels(data)[0]


def _lcp_from_levels(
    sa: np.ndarray, levels: list[tuple[int, np.ndarray]], n: int
) -> np.ndarray:
    """Adjacent-suffix LCP by binary lifting over the doubling snapshots —
    vectorized replacement for Kasai (same output, O(n log n) vector ops).

    Rank equality at level k implies the length-k substrings are equal (and
    for distinct positions, genuinely unpadded); descending the levels adds
    each power of two at most once, so the accumulated offset is the LCP.
    """
    if n == 0:
        return _EMPTY_I64
    i = sa[1:]
    j = sa[:-1]
    length = np.zeros(n - 1, dtype=np.int64)
    for k, rk in reversed(levels):
        ii = i + length
        jj = j + length
        ok = (ii < n) & (jj < n)
        ii_c = np.minimum(ii, n - 1)
        jj_c = np.minimum(jj, n - 1)
        eq = ok & (rk[ii_c] == rk[jj_c])
        length += eq * k
    lcp = np.empty(n, dtype=np.int64)
    lcp[0] = 0
    lcp[1:] = length
    return lcp


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


def _segmented_running_min(
    lcp_seq: np.ndarray, is_src: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per rank-sequence position: min adjacent-LCP since the most recent
    source position (exclusive), and that source's sequence index.

    Vectorized segmented cumulative min: subtracting ``BIG * segment_id``
    makes every later segment's values smaller than any earlier segment's,
    so a plain ``minimum.accumulate`` never leaks mins across segment
    boundaries.  Source positions themselves contribute BIG (excluded).
    """
    big = np.int64(n + 1)
    seg = np.cumsum(is_src.astype(np.int64))
    x = np.where(is_src, big, lcp_seq)
    run = np.minimum.accumulate(x - big * seg) + big * seg
    idx = np.arange(n, dtype=np.int64)
    last_src = np.maximum.accumulate(np.where(is_src, idx, -1))
    return run, last_src


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
    other-side suffix above or below it in suffix order.  Fully vectorized
    (segmented running-min over the rank order) — no per-rank Python.
    """
    n = data.shape[0]
    sa, levels = _suffix_array_levels(data)
    lcp = _lcp_from_levels(sa, levels, n)
    len_b = n - split - 1
    best_a = np.zeros(split, dtype=np.int64)
    partner_a = np.full(split, -1, dtype=np.int64)
    best_b = np.zeros(max(len_b, 0), dtype=np.int64)

    is_b = sa > split
    is_a = sa < split

    for direction in ("fwd", "bwd"):
        if direction == "fwd":
            sa_seq, isa, isb = sa, is_a, is_b
            lcp_seq = lcp  # lcp_seq[r] = LCP crossing rank r-1 -> r
        else:
            sa_seq, isa, isb = sa[::-1], is_a[::-1], is_b[::-1]
            # crossing rank r+1 -> r uses lcp[r+1]
            lcp_seq = np.empty(n, dtype=np.int64)
            lcp_seq[0] = 0
            lcp_seq[1:] = lcp[::-1][: n - 1]

        # A positions: nearest preceding B in this order + running min LCP
        run_b, last_b = _segmented_running_min(lcp_seq, isb, n)
        sel = isa & (last_b >= 0)
        if sel.any():
            pos = sa_seq[sel]
            cand = np.minimum(run_b[sel], split - pos)
            part = sa_seq[last_b[sel]] - split - 1
            better = cand > best_a[pos]
            # scatter-max: positions are unique within one sweep
            best_a[pos[better]] = cand[better]
            partner_a[pos[better]] = part[better]

        # B positions: nearest preceding A + running min LCP
        run_a, last_a = _segmented_running_min(lcp_seq, isa, n)
        sel = isb & (last_a >= 0)
        if sel.any():
            pos = sa_seq[sel]
            cand = np.minimum(run_a[sel], n - pos)
            j = pos - split - 1
            np.maximum.at(best_b, j, cand)
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
