#!/usr/bin/env python3
"""Per-stage wall-time attribution for the dedup pipeline at one parallelism
level.  Forces each stage with persist+count so the timings are additive;
used to locate the non-scaling fraction (Amdahl analysis for BASELINE.md).

Usage: SB_MODE=local-cluster python scripts/profile_stages.py 32 20000 80
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
words = int(sys.argv[3]) if len(sys.argv) > 3 else 80

extra_conf = {}
if os.environ.get("SB_MODE") == "local-cluster":
    workers = max(cpus // 4, 1)
    mem_mb = 6144
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--master local-cluster[{workers},4,{mem_mb}] pyspark-shell")
    extra_conf = {
        "spark.executor.memory": f"{mem_mb - 1024}m",
        "spark.executorEnv.PYTHONPATH": REPO,
    }

import pyspark.sql.functions as F  # noqa: E402

from minimizer_jaccard_estimator_spark.functions.sketch import (  # noqa: E402
    SketchConfig, add_full_sketch)
from minimizer_jaccard_estimator_spark.operators.connected_components import (  # noqa: E402
    connected_components)
from minimizer_jaccard_estimator_spark.operators.lsh import (  # noqa: E402
    exact_dup_pairs, lsh_candidate_pairs)
from minimizer_jaccard_estimator_spark.operators.verify import verify_pairs  # noqa: E402
from minimizer_jaccard_estimator_spark.plans.session import get_spark  # noqa: E402
from minimizer_jaccard_estimator_spark.sources.transcripts import (  # noqa: E402
    assemble_conversations, synthetic_transcripts)

sketch_cfg = SketchConfig(k=12, w=20, hash_type="splitmix64", hash_seed=0,
                          num_perm=128, lsh_bands=32, minhash_scheme="seeded")
spark = get_spark(app_name=f"profile-{cpus}", cpus=cpus, extra_conf=extra_conf)
spark.sparkContext.setLogLevel("ERROR")

tr = synthetic_transcripts(spark, n_base=n_base, dup_factor=2, seed=42,
                           turns_min=4, turns_max=16, words_per_turn=words,
                           partitions=cpus * 4).persist()
n_turns = tr.count()

timings: dict[str, float] = {}


def stage(name, df):
    t0 = time.monotonic()
    out = df.persist()
    n = out.count()
    timings[name] = round(time.monotonic() - t0, 2)
    print(f"{name}: {timings[name]}s ({n} rows)", flush=True)
    return out


conv_text = stage("assembly", assemble_conversations(tr))
src = conv_text.select("conv_id", "text").repartition(
    spark.sparkContext.defaultParallelism * 2)
sketches = stage("sketch", add_full_sketch(src, sketch_cfg).drop("text"))
exact = stage("exact_pairs", exact_dup_pairs(conv_text))
lsh = stage("lsh_pairs", lsh_candidate_pairs(
    sketches.select("conv_id", "minhash"), sketch_cfg, max_bucket_size=1000))
candidates = stage("cand_union_distinct", exact.union(lsh).distinct())
verified = stage("verify", verify_pairs(
    candidates, sketches.select("conv_id", "minimizers")))
accepted = stage("accepted", verified.where(F.col("j_mini") >= 0.5)
                 .select("id_a", "id_b").union(exact).distinct())
t0 = time.monotonic()
comp = connected_components(accepted)
n_comp = comp.count()
timings["connected_components"] = round(time.monotonic() - t0, 2)
print(f"connected_components: {timings['connected_components']}s ({n_comp} rows)", flush=True)
t0 = time.monotonic()
clusters = (conv_text.select("conv_id").join(comp, "conv_id", "left")
            .select("conv_id", F.coalesce("cluster_id", "conv_id").alias("cluster_id")))
n_clu = clusters.select("cluster_id").distinct().count()
timings["cluster_join"] = round(time.monotonic() - t0, 2)
print(f"cluster_join: {timings['cluster_join']}s ({n_clu} clusters)", flush=True)

total = round(sum(timings.values()), 2)
print(json.dumps({"cpus": cpus, "mode": os.environ.get("SB_MODE", "local"),
                  "n_turns": n_turns, "total": total, "stages": timings}))
spark.stop()
