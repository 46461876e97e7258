#!/usr/bin/env python3
"""Per-delta wall vs corpus size — evidence for the incremental band/digest
probe tables (VERDICT r02 #1).

Builds two checkpointed corpora at the same dedup config — N and 10N base
conversations — then times the SAME delta batch (commit=False probe) against
each, repeat-and-min.  With run_dedup_delta probing the store's digests
(8 B/doc) and bands (~24 B/row) tables, the delta's wall should be dominated
by its own sketch/verify work: the corpus-size-dependent terms are narrow
columnar scans (bands/digests/clusters) plus the verify join's sketch
lookup, so wall_large / wall_small should sit near 1, far below the 10x
corpus ratio.

Prints ONE JSON line and writes DELTA_BENCH.json at the repo root:
  {"corpus": {"small": {...}, "large": {...}}, "wall_ratio": r,
   "corpus_ratio": 10.0, ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from minimizer_jaccard_estimator_spark.functions.sketch import SketchConfig  # noqa: E402
from minimizer_jaccard_estimator_spark.operators.dedup import DedupConfig, run_dedup  # noqa: E402
from minimizer_jaccard_estimator_spark.operators.delta import run_dedup_delta  # noqa: E402
from minimizer_jaccard_estimator_spark.plans.catalog import StageStore  # noqa: E402
from minimizer_jaccard_estimator_spark.plans.session import get_spark  # noqa: E402
from minimizer_jaccard_estimator_spark.sources.transcripts import synthetic_transcripts  # noqa: E402

SKETCH = SketchConfig(k=12, w=20, hash_type="splitmix64", hash_seed=0,
                      num_perm=128, lsh_bands=32, minhash_scheme="oph")


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    n_small = int(os.environ.get("DELTA_BENCH_SMALL", "2000"))
    scale = int(os.environ.get("DELTA_BENCH_SCALE", "10"))
    delta_base = int(os.environ.get("DELTA_BENCH_DELTA", "400"))

    spark = get_spark(app_name="mje-delta-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = DedupConfig(sketch=SKETCH, jaccard_threshold=0.5, staged_verify=True)

    # the SAME delta batch for both corpora: fresh ids via a "d" prefix,
    # texts drawn from the generator family so some cross-link to the corpus
    delta = (
        synthetic_transcripts(spark, n_base=delta_base, dup_factor=1, seed=7,
                              partitions=cpus)
        .withColumn("conv_id", F.concat(F.lit("d"), F.col("conv_id")))
        .persist()
    )
    n_delta_turns = delta.count()

    out: dict = {"cpus": cpus, "repeats": repeats,
                 "n_delta_turns": n_delta_turns}
    corpora: dict = {}
    roots = []
    try:
        for tag, n_base in (("small", n_small), ("large", n_small * scale)):
            root = tempfile.mkdtemp(prefix=f"mje_delta_bench_{tag}_")
            roots.append(root)
            store = StageStore(root=root)
            t0 = time.monotonic()
            corpus = synthetic_transcripts(spark, n_base=n_base, dup_factor=2,
                                           seed=42, partitions=cpus * 2)
            res = run_dedup(spark, corpus, cfg, store=store)
            res.release()
            build_sec = time.monotonic() - t0
            n_convs = store.load(spark, "conv_text").count()

            walls = []
            for _ in range(repeats):
                t0 = time.monotonic()
                d = run_dedup_delta(spark, delta, cfg, store)  # commit=False probe
                d.clusters.agg(F.count("*")).collect()  # force the full DAG
                walls.append(time.monotonic() - t0)
                d.release()

            # commit=True walls (VERDICT r04 #2 evidence): since round 5 a
            # committed delta appends O(delta) clusters_overrides rows
            # instead of rewriting the O(corpus) assignment — the commit
            # wall must therefore be corpus-size-independent too.  Each rep
            # commits into a fresh COPY of the store (a commit mutates it);
            # the copy cost is excluded from the timed window.
            commit_walls = []
            for i in range(repeats):
                croot = f"{root}_commit{i}"
                shutil.copytree(root, croot)
                try:
                    cstore = StageStore(root=croot)
                    t0 = time.monotonic()
                    d = run_dedup_delta(spark, delta, cfg, cstore, commit=True)
                    d.clusters.agg(F.count("*")).collect()
                    commit_walls.append(time.monotonic() - t0)
                    d.release()
                finally:
                    shutil.rmtree(croot, ignore_errors=True)

            corpora[tag] = {
                "n_base": n_base, "n_convs": n_convs,
                "corpus_build_sec": round(build_sec, 3),
                "delta_walls_sec": [round(w, 3) for w in walls],
                "delta_wall_min_sec": round(min(walls), 3),
                "commit_walls_sec": [round(w, 3) for w in commit_walls],
                "commit_wall_min_sec": round(min(commit_walls), 3),
            }
    finally:
        for root in roots:
            shutil.rmtree(root, ignore_errors=True)

    out["corpus"] = corpora
    out["corpus_ratio"] = float(scale)
    out["wall_ratio"] = round(
        corpora["large"]["delta_wall_min_sec"]
        / corpora["small"]["delta_wall_min_sec"], 3)
    out["commit_wall_ratio"] = round(
        corpora["large"]["commit_wall_min_sec"]
        / corpora["small"]["commit_wall_min_sec"], 3)
    print(json.dumps(out))
    out_name = os.environ.get("DELTA_BENCH_OUT", "DELTA_BENCH.json")
    with open(os.path.join(REPO, out_name), "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
