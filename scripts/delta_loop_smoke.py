#!/usr/bin/env python3
"""End-to-end smoke of the DRIVER-FACING delta ingestion loop (VERDICT r03
#6): the spark-submit path (scripts/run_dedup_job.py + --py-files zip) is
exercised three times against one store —

  1. base run over batch 0,
  2. ``--delta`` over batch 1 (committed),
  3. ``--delta`` over batch 2 (committed),

then the final cluster assignment is compared against a single full
recompute over all three batches, and the store is checked for true
incremental behavior: the parquet data files the base run / first delta
wrote into the ``bands``/``digests``/``sketches`` probe tables must survive
the second delta BYTE-IDENTICAL (append-only — a delta that rebuilt or
re-banded the corpus would rewrite them; the committed-delta plan property
itself is pinned by tests/test_delta.py::
test_delta_probes_incremental_tables_not_corpus).

Usage:  python scripts/delta_loop_smoke.py   (writes nothing outside /tmp)
Exit code 0 = all assertions green.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONF = [
    "--master", "local[8]",
    "--conf", "spark.sql.shuffle.partitions=8",
    "--conf", "spark.sql.adaptive.enabled=true",
    "--conf", "spark.driver.memory=4g",
    "--conf", "spark.ui.enabled=false",
]
JOB_ARGS = ["--k", "12", "--w", "20", "--num-perm", "64", "--bands", "32"]


def snapshot(root: str) -> dict[str, float]:
    """relpath -> (size, mtime) for every data file under the probe tables."""
    out = {}
    for stage in ("bands", "digests", "sketches", "conv_text"):
        d = os.path.join(root, stage)
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if f.startswith(("part-", "_SUCCESS")):
                p = os.path.join(d, f)
                out[f"{stage}/{f}"] = (os.path.getsize(p), os.path.getmtime(p))
    return out


def main() -> int:
    work = tempfile.mkdtemp(prefix="delta_smoke_")
    store_root = os.path.join(work, "store")
    zip_path = os.path.join(REPO, "dist", "minimizer_jaccard_estimator_spark.zip")
    subprocess.run([sys.executable, os.path.join(REPO, "scripts", "build_pyfiles.py")],
                   check=True, cwd=REPO)

    # -- generate 3 disjoint batches of transcripts as parquet inputs --------
    from minimizer_jaccard_estimator_spark.plans.session import get_spark
    from minimizer_jaccard_estimator_spark.sources.transcripts import synthetic_transcripts
    import pyspark.sql.functions as F

    spark = get_spark(app_name="delta-smoke-gen", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synthetic_transcripts(spark, n_base=60, dup_factor=2, seed=101).cache()
    idx = F.substring("conv_id", 2, 10).cast("long")
    batches = []
    for i in range(3):
        p = os.path.join(work, f"batch{i}.parquet")
        corpus.where(idx % 3 == i).write.mode("overwrite").parquet(p)
        batches.append(p)

    env = dict(os.environ, PYTHONPATH=REPO)

    def submit(extra: list[str]) -> None:
        cmd = (["spark-submit", *CONF, "--py-files", zip_path,
                os.path.join(REPO, "scripts", "run_dedup_job.py"), *extra, *JOB_ARGS])
        r = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True, text=True)
        if r.returncode != 0:
            sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-4000:] + "\n")
            raise SystemExit(f"spark-submit failed: {' '.join(extra)}")
        done = [ln for ln in r.stdout.splitlines() if "complete" in ln]
        # the completion line can be lost to stdout buffering on JVM
        # teardown; a zero exit already proves the run succeeded
        print(done[-1] if done else f"(exit 0, no completion line) {' '.join(extra)}")

    # -- 1. base run, 2./3. committed deltas via the real driver -------------
    submit(["--input", batches[0], "--output", store_root])
    snap0 = snapshot(store_root)
    submit(["--input", batches[1], "--output", store_root, "--delta"])
    snap1 = snapshot(store_root)
    submit(["--input", batches[2], "--output", store_root, "--delta"])
    snap2 = snapshot(store_root)

    # append-only: every probe/data file from the previous step survives the
    # next step unmodified (same size + mtime); only NEW files appear
    for earlier, later, tag in ((snap0, snap1, "delta 1"), (snap1, snap2, "delta 2")):
        changed = {f for f in earlier
                   if f in later and later[f] != earlier[f] and not f.endswith("_SUCCESS")}
        missing = {f for f in earlier
                   if f not in later and not f.endswith("_SUCCESS")}
        assert not changed and not missing, (
            f"{tag} rewrote corpus probe files: changed={sorted(changed)[:5]} "
            f"missing={sorted(missing)[:5]}")
        assert len(later) > len(earlier), f"{tag} appended no probe rows?"

    # -- cluster equality vs one full recompute ------------------------------
    from minimizer_jaccard_estimator_spark.functions.sketch import SketchConfig
    from minimizer_jaccard_estimator_spark.operators.dedup import (
        DedupConfig, load_clusters, run_dedup)
    from minimizer_jaccard_estimator_spark.plans.catalog import StageStore

    cfg = DedupConfig(sketch=SketchConfig(k=12, w=20, num_perm=64, lsh_bands=32))
    full = run_dedup(spark, corpus, cfg)

    def canon(df):
        groups: dict[str, set[str]] = {}
        for r in df.collect():
            groups.setdefault(r["cluster_id"], set()).add(r["conv_id"])
        return {frozenset(g) for g in groups.values()}

    # the current assignment = base table + any delta override rows
    looped = canon(load_clusters(spark, StageStore(root=store_root)))
    recomputed = canon(full.clusters)
    assert looped == recomputed, (
        f"3-batch delta loop diverged from full recompute: "
        f"{len(looped)} vs {len(recomputed)} clusters")
    n_convs = corpus.select("conv_id").distinct().count()
    assert sum(len(g) for g in looped) == n_convs

    print(f"delta loop smoke OK: {n_convs} convs, {len(looped)} clusters, "
          f"probe files append-only across both committed deltas")
    shutil.rmtree(work)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
