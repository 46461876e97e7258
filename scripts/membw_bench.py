#!/usr/bin/env python3
"""Single-socket memory-bandwidth ceiling measurement (STREAM-triad style).

Context: BASELINE.json's north rule asks for >= 0.8 throughput scaling
between cluster sizes N and 4N.  In this sandbox every "executor" shares ONE
socket's L3 and memory controllers, so any bandwidth-touching workload has a
HARDWARE scaling ceiling between 8 and 32 concurrent processes that a real
4N-executor cluster (4N sockets, 4N memory controllers) does not have.  This
script measures that ceiling directly, independent of Spark and of this
engine: P processes, each pinned to its own core, synchronize on a barrier
and then run the STREAM triad (a = b + s*c) over arrays far larger than L3
for a fixed window; we report aggregate GB/s at each P and the N->4N
efficiency.  The engine's sketch stage should be compared against THIS
number, not against 1.0.

The host VM shows heavy co-tenant bandwidth noise (3x swings between runs),
so levels are interleaved ``--alternations`` times and the BEST
(least-interfered) aggregate per level is used — the same min-wall
convention as scripts/scaling_bench.py.

Usage: python scripts/membw_bench.py [--procs 1,8,32] [--mb 512]
    [--seconds 1.5] [--alternations 5] [--out MEMBW.json]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

import numpy as np


def _worker(core: int, mb: int, seconds: float, barrier, out_q: mp.Queue) -> None:
    try:
        os.sched_setaffinity(0, {core})
        n = (mb * 1024 * 1024) // 8 // 3  # three arrays of n float64
        b = np.ones(n)
        c = np.full(n, 2.0)
        a = np.empty(n)
        s = 3.0
        np.add(b, s * c, out=a)  # touch all pages before timing
        barrier.wait(timeout=120)  # every process measures the SAME window
        # (timeout: a sibling that died pre-barrier breaks the barrier for
        # everyone instead of hanging the survivors forever)
        t0 = time.perf_counter()
        passes = 0
        while True:
            np.multiply(c, s, out=a)
            np.add(a, b, out=a)
            passes += 1
            el = time.perf_counter() - t0
            if el >= seconds:
                break
        # the two-op form moves 5 arrays/pass: read c + write a, then
        # read a + read b + write a (a fused triad would move 4 — numpy
        # has no fused op, so count what actually crosses the bus)
        out_q.put((core, passes * 5 * n * 8 / el / 1e9))
    except BaseException:  # noqa: BLE001 — a dead worker must not deadlock the run
        out_q.put((core, float("nan")))
        raise


def run_level(p: int, mb: int, seconds: float) -> dict:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(p)
    procs = [mp.Process(target=_worker, args=(i, mb, seconds, barrier, q))
             for i in range(p)]
    for pr in procs:
        pr.start()
    rates = [q.get(timeout=seconds + 120)[1] for _ in procs]
    for pr in procs:
        pr.join()
    if any(r != r for r in rates):  # NaN => a worker died (bad core/OOM)
        raise RuntimeError(f"worker failure at procs={p}")
    return {
        "procs": p,
        "per_proc_gbps": round(float(np.mean(rates)), 2),
        "aggregate_gbps": round(float(np.sum(rates)), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,8,32")
    ap.add_argument("--mb", type=int, default=512)
    ap.add_argument("--seconds", type=float, default=1.5)
    ap.add_argument("--alternations", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    plist = [int(p) for p in args.procs.split(",")]
    best: dict[int, dict] = {}
    samples: list[dict] = []
    for _ in range(args.alternations):
        for p in plist:
            r = run_level(p, args.mb, args.seconds)
            samples.append(r)
            cur = best.get(p)
            if cur is None or r["aggregate_gbps"] > cur["aggregate_gbps"]:
                best[p] = r
    pairs = [
        {"n": n, "n4": n * 4,
         "hw_ceiling": round(best[n * 4]["aggregate_gbps"]
                             / (4 * best[n]["aggregate_gbps"]), 3)}
        for n in plist if n * 4 in best and n in best
    ]
    summary = {"kind": "stream_triad", "array_mb": args.mb,
               "window_sec": args.seconds, "alternations": args.alternations,
               "best_levels": [best[p] for p in plist],
               "all_samples": samples, "pairs": pairs}
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
