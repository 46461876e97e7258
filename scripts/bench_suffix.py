#!/usr/bin/env python3
"""Micro-bench: vectorized span-verify kernel vs the per-char Python form.

Times substring_stats (suffix array + binary-lifting LCP + segmented-min
sweeps, all numpy) against the interpreted baseline (Kasai LCP + per-rank
Python sweep — the round-1 implementation, inlined here as the oracle) on
10KB documents with a planted 30% shared block.

  python scripts/bench_suffix.py [n_bytes] [reps]
"""

from __future__ import annotations

import json
import random
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from minimizer_jaccard_estimator_spark.suffix import (  # noqa: E402
    lcp_array, substring_stats, suffix_array)


def _python_best_cross_lcp(data, split):
    """Round-1 interpreted sweep (oracle for the vectorized kernel)."""
    n = data.shape[0]
    sa = suffix_array(data)
    lcp = lcp_array(data, sa)  # Kasai: per-char Python loop
    len_b = n - split - 1
    best_a = np.zeros(split, dtype=np.int64)
    partner_a = np.full(split, -1, dtype=np.int64)
    best_b = np.zeros(max(len_b, 0), dtype=np.int64)
    for ranks in (range(n), range(n - 1, -1, -1)):
        last_b = -1
        run_b = 0
        seen_a = False
        run_a = 0
        prev_r = None
        for r in ranks:
            if prev_r is not None:
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
                run_b = n
            elif pos < split:
                if last_b >= 0:
                    m = min(run_b, split - pos)
                    if m > best_a[pos]:
                        best_a[pos] = m
                        partner_a[pos] = last_b - split - 1
                seen_a = True
                run_a = n
            prev_r = r
    return best_a, partner_a, best_b


def main() -> None:
    n_bytes = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    rng = random.Random(7)
    letters = "abcdefghijklmnopqrstuvwxyz "
    a = "".join(rng.choice(letters) for _ in range(n_bytes))
    shared = a[: n_bytes // 3]
    b = ("".join(rng.choice(letters) for _ in range(n_bytes // 3)) + shared
         + "".join(rng.choice(letters) for _ in range(n_bytes // 3)))

    # correctness cross-check before timing
    from minimizer_jaccard_estimator_spark.suffix import _best_cross_lcp
    ab = np.frombuffer(a.encode(), dtype=np.uint8).astype(np.int64)
    bb = np.frombuffer(b.encode(), dtype=np.uint8).astype(np.int64)
    data = np.concatenate([ab, np.array([256], dtype=np.int64), bb])
    va, vp, vb = _best_cross_lcp(data, ab.size)
    pa, pp, pb = _python_best_cross_lcp(data, ab.size)
    assert np.array_equal(va, pa) and np.array_equal(vb, pb)
    assert np.array_equal(vp, pp)

    t0 = time.monotonic()
    for _ in range(reps):
        substring_stats(a, b, 64)
    vec = (time.monotonic() - t0) / reps

    t0 = time.monotonic()
    for _ in range(max(reps // 2, 1)):
        _python_best_cross_lcp(data, ab.size)
    py = (time.monotonic() - t0) / max(reps // 2, 1)

    # component split: the round-1 Python parts (Kasai LCP + per-rank sweep)
    # vs their vectorized replacements, excluding the (shared, already-
    # vectorized) suffix-array lexsort
    from minimizer_jaccard_estimator_spark.suffix import (
        _lcp_from_levels, _suffix_array_levels)
    sa, levels = _suffix_array_levels(data)
    n = data.shape[0]
    t0 = time.monotonic()
    for _ in range(reps):
        _lcp_from_levels(sa, levels, n)
    vec_lcp = (time.monotonic() - t0) / reps
    t0 = time.monotonic()
    for _ in range(max(reps // 2, 1)):
        lcp_array(data, sa)
    kasai = (time.monotonic() - t0) / max(reps // 2, 1)

    t0 = time.monotonic()
    for _ in range(reps):
        suffix_array(data)
    sa_sec = (time.monotonic() - t0) / reps

    loops_py = py - sa_sec  # Kasai + python sweep
    loops_vec = max(vec - sa_sec, 1e-9)  # vec LCP + vec sweeps + span finish
    print(json.dumps({
        "n_bytes": n_bytes,
        "e2e_vectorized_sec": round(vec, 4),
        "e2e_python_sec": round(py, 4),
        "e2e_speedup": round(py / vec, 1),
        "suffix_array_sec": round(sa_sec, 4),
        "lcp_kasai_sec": round(kasai, 4),
        "lcp_vectorized_sec": round(vec_lcp, 4),
        "lcp_speedup": round(kasai / vec_lcp, 1),
        "python_loops_sec": round(loops_py, 4),
        "vectorized_loops_sec": round(loops_vec, 4),
        "loops_speedup": round(loops_py / loops_vec, 1),
    }))


if __name__ == "__main__":
    main()
