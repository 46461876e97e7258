#!/usr/bin/env python3
"""r06 A/B probe: time dedup_pipeline / dedup_documents exactly as bench.py
does (same configs, same single action), without the rest of the suite.
NOT part of the frozen measurement contract.

Usage: python scripts/probe_dedup.py [pipeline|docs|both] [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from bench import SKETCH  # noqa: E402
from minimizer_jaccard_estimator_spark.operators.dedup import DedupConfig, run_dedup  # noqa: E402
from minimizer_jaccard_estimator_spark.plans.session import get_spark  # noqa: E402
from minimizer_jaccard_estimator_spark.sources.transcripts import synthetic_transcripts  # noqa: E402

REPEATS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    spark = get_spark(app_name="mje-probe-dedup", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, object] = {}

    if what in ("pipeline", "both"):
        n_base = max(200, int(120_000 * sf))
        transcripts = synthetic_transcripts(
            spark, n_base=n_base, dup_factor=2, seed=42,
            partitions=max(cpus * 2, 8)).persist()
        n_turns = transcripts.count()
        walls = []
        for _ in range(REPEATS):
            t0 = time.monotonic()
            res = run_dedup(spark, transcripts,
                            DedupConfig(sketch=SKETCH, jaccard_threshold=0.5,
                                        staged_verify=True, rebalance_sketch=False))
            stats = res.clusters.agg(
                F.countDistinct("cluster_id").alias("k"), F.count("*").alias("n")
            ).collect()[0]
            res.release()
            walls.append(round(time.monotonic() - t0, 3))
        out["dedup_pipeline"] = {"walls": walls, "n_turns": n_turns,
                                 "n_clusters": stats["k"], "n_convs": stats["n"]}
        transcripts.unpersist()

    if what in ("docs", "both"):
        walls = []
        for _ in range(REPEATS):
            t0 = time.monotonic()
            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            res = run_dedup(spark, entry_mod._docs_as_transcripts(docs),
                            DedupConfig(sketch=entry_mod._SKETCH))
            n = res.clusters.select("cluster_id").distinct().count()
            res.release()
            walls.append(round(time.monotonic() - t0, 3))
        out["dedup_documents"] = {"walls": walls, "n_doc_clusters": n}

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
