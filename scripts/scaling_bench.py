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

Usage:
  python scripts/scaling_bench.py [--levels 2,8,32] [--scheme seeded|oph]
      [--n-base 20000] [--words 80] [--out SCALING.json]

Each level runs in a subprocess (own JVM); the parent aggregates.
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
from minimizer_jaccard_estimator_spark.plans.session import get_spark
from minimizer_jaccard_estimator_spark.sources.transcripts import synthetic_transcripts
from minimizer_jaccard_estimator_spark.functions.sketch import SketchConfig
from minimizer_jaccard_estimator_spark.operators.dedup import DedupConfig, run_dedup
import pyspark.sql.functions as F

sketch = SketchConfig(
    k=12, w=20, hash_type="splitmix64", hash_seed=0, num_perm=128,
    lsh_bands=32, minhash_scheme=os.environ["SB_SCHEME"],
)
spark = get_spark(app_name=f"scaling-{cpus}", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")
tr = synthetic_transcripts(
    spark, n_base=int(os.environ["SB_NBASE"]), dup_factor=2, seed=42,
    turns_min=4, turns_max=16, words_per_turn=int(os.environ["SB_WORDS"]),
    partitions=cpus * 4,
).persist()
n_turns = tr.count()
n_bytes = tr.agg(F.sum(F.length("text"))).collect()[0][0]
stage = os.environ.get("SB_STAGE", "dedup")
if stage == "sketch":
    # the per-byte UDF stage alone (dominant cost at the 10^12-turn design
    # point); embarrassingly parallel across Arrow batches
    from minimizer_jaccard_estimator_spark.functions.sketch import add_full_sketch
    from minimizer_jaccard_estimator_spark.sources.transcripts import assemble_conversations
    conv = assemble_conversations(tr).persist()
    conv.count()
    src = conv.select("conv_id", "text").repartition(cpus * 2).persist()
    src.count()
    t0 = time.monotonic()
    sk = add_full_sketch(src, sketch)
    n_minis = sk.agg(F.sum(F.size("minimizers"))).collect()[0][0]
    wall = time.monotonic() - t0
    extra = {"n_minimizers": int(n_minis)}
else:
    t0 = time.monotonic()
    res = run_dedup(spark, tr, DedupConfig(sketch=sketch, jaccard_threshold=0.5))
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    wall = time.monotonic() - t0
    extra = {"n_clusters": n_clusters}
print(json.dumps({
    "cpus": cpus, "stage": stage, "wall_sec": round(wall, 2),
    "turns_per_sec": round(n_turns / wall, 1),
    "n_turns": n_turns, "text_bytes": int(n_bytes), **extra,
}))
"""


def run_level(cpus: int, scheme: str, n_base: int, words: int, stage: str = "dedup") -> dict:
    env = dict(os.environ, SB_REPO=REPO, SB_CPUS=str(cpus), SB_SCHEME=scheme,
               SB_NBASE=str(n_base), SB_WORDS=str(words), SB_STAGE=stage)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, capture_output=True, text=True,
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
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    results = []
    for cpus in levels:
        r = run_level(cpus, args.scheme, args.n_base, args.words, args.stage)
        results.append(r)
        print(json.dumps(r), flush=True)

    pairs = []
    by_cpus = {r["cpus"]: r for r in results}
    for n in levels:
        if n * 4 in by_cpus:
            lo, hi = by_cpus[n], by_cpus[n * 4]
            eff = hi["turns_per_sec"] / (4.0 * lo["turns_per_sec"])
            pairs.append({"n": n, "n4": n * 4, "efficiency": round(eff, 3),
                          "tps_n": lo["turns_per_sec"], "tps_4n": hi["turns_per_sec"]})
    summary = {"scheme": args.scheme, "stage": args.stage, "n_base": args.n_base,
               "words_per_turn": args.words, "levels": results, "pairs": pairs}
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
