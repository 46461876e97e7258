#!/usr/bin/env python3
"""r06: per-stage attribution of the bench dedup queries via the UI REST API.

Runs the query once (warm-up) + once (measured) with the Spark UI enabled,
then dumps each completed stage's wall, executor CPU-seconds, shuffle bytes
and task count, sorted by total task time.  NOT part of the frozen
measurement contract.

Usage: python scripts/probe_stages.py [pipeline|docs] [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from bench import SKETCH  # noqa: E402
from minimizer_jaccard_estimator_spark.operators.dedup import DedupConfig, run_dedup  # noqa: E402
from minimizer_jaccard_estimator_spark.plans.session import get_spark  # noqa: E402
from minimizer_jaccard_estimator_spark.sources.transcripts import synthetic_transcripts  # noqa: E402


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "pipeline"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/scaledata/sf1.0"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    spark = get_spark(app_name="mje-probe-stages", cpus=cpus,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.retainedStages": "3000"})
    spark.sparkContext.setLogLevel("ERROR")

    if what == "pipeline":
        n_base = max(200, int(120_000 * sf))
        transcripts = synthetic_transcripts(
            spark, n_base=n_base, dup_factor=2, seed=42,
            partitions=max(cpus * 2, 8)).persist()
        transcripts.count()

        def run():
            res = run_dedup(spark, transcripts,
                            DedupConfig(sketch=SKETCH, jaccard_threshold=0.5,
                                        staged_verify=True, rebalance_sketch=False))
            res.clusters.agg(F.countDistinct("cluster_id"), F.count("*")).collect()
            res.release()
    else:
        def run():
            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            res = run_dedup(spark, entry_mod._docs_as_transcripts(docs),
                            DedupConfig(sketch=entry_mod._SKETCH))
            res.clusters.select("cluster_id").distinct().count()
            res.release()

    t0 = time.monotonic(); run(); warm = time.monotonic() - t0
    app = spark.sparkContext.applicationId
    base = "http://localhost:4040/api/v1/applications/" + app
    before = {s["stageId"] for s in json.load(
        urllib.request.urlopen(base + "/stages?status=complete"))}
    t0 = time.monotonic(); run(); wall = time.monotonic() - t0
    stages = json.load(urllib.request.urlopen(base + "/stages?status=complete"))
    rows = []
    for s in stages:
        if s["stageId"] in before:
            continue
        rows.append({
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:70],
            "wall_s": round((time.mktime(time.strptime(
                s["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")) - time.mktime(
                time.strptime(s["firstTaskLaunchedTime"][:19],
                              "%Y-%m-%dT%H:%M:%S"))), 1)
            if s.get("completionTime") and s.get("firstTaskLaunchedTime") else None,
            "tasks": s["numCompleteTasks"],
            "cpu_s": round(s["executorCpuTime"] / 1e9, 1),
            "run_s": round(s["executorRunTime"] / 1000, 1),
            "sh_read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
            "sh_write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
            "input_mb": round(s["inputBytes"] / 1e6, 1),
        })
    rows.sort(key=lambda r: -r["cpu_s"])
    print(json.dumps({"what": what, "warm_wall": round(warm, 2),
                      "measured_wall": round(wall, 2),
                      "total_cpu_s": round(sum(r["cpu_s"] for r in rows), 1)}))
    for r in rows[:25]:
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
