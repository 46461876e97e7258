"""Stage checkpointing + lineage/metrics tables.

Every pipeline stage can be materialized to a table and resumed from it.  In
this sandbox the table format is parquet; on a cluster with the Iceberg
runtime jars, ``format='iceberg'`` writes the same stage paths as path-based
(Hadoop-catalog) Iceberg tables via the DataFrame writer, and resume detects
them by their ``metadata/`` dir (parquet commits are detected by
``_SUCCESS``).  Gated, not assumed — the jars are absent here.  This is the
engine's equivalent of the reference's debug taps
(``--debug=hashes/minis/...``, SURVEY.md §5.6): every intermediate is a real,
queryable table.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def replace_path(spark: SparkSession, dst: str, src: str) -> None:
    """Replace the table directory at ``dst`` with the one at ``src``
    (rename-rename-delete, both local paths and Hadoop FS ``://`` URIs).

    Crash windows: the old table is parked at ``dst__old`` BEFORE the new
    one moves in, so at every instant either ``dst`` or ``dst__old`` holds a
    complete copy — a crash mid-swap is recovered by renaming ``__old``
    back, never by re-deriving data.  A pre-existing ``dst`` is optional
    (first-time creation swaps in cleanly on both backends)."""
    old = dst.rstrip("/") + "__old"
    if "://" in dst:
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path
        jdst, jsrc, jold = jvm_path(dst), jvm_path(src), jvm_path(old)
        fs = jdst.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jold):
            fs.delete(jold, True)
        had_dst = fs.exists(jdst)
        if had_dst and not fs.rename(jdst, jold):
            raise OSError(f"rename {dst} -> {old} failed")
        if not fs.rename(jsrc, jdst):
            raise OSError(f"rename {src} -> {dst} failed")
        if had_dst:
            fs.delete(jold, True)
    else:
        import shutil

        if os.path.exists(old):
            shutil.rmtree(old)
        had_dst = os.path.exists(dst)
        if had_dst:
            os.rename(dst, old)
        os.rename(src, dst)
        if had_dst:
            shutil.rmtree(old)


@dataclass
class StageStore:
    """Checkpoint/resume + metrics for a pipeline run."""

    root: str | None  # None => no checkpointing (pure in-memory run)
    format: str = "parquet"
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])
    _metrics: list[dict] = field(default_factory=list)
    _partition_rows: list[dict] = field(default_factory=list)
    _pending: list[dict] = field(default_factory=list)

    def path(self, stage: str) -> str:
        assert self.root is not None
        return os.path.join(self.root, stage)

    def _marker(self, stage: str) -> str:
        # parquet commits write _SUCCESS; path-based (Hadoop-catalog) Iceberg
        # tables have a metadata/ dir instead and never write _SUCCESS
        name = "_SUCCESS" if self.format == "parquet" else "metadata"
        return os.path.join(self.path(stage), name)

    def exists(self, stage: str, spark: SparkSession | None = None) -> bool:
        if self.root is None:
            return False
        p = self._marker(stage)
        if "://" in self.root:
            # remote roots (hdfs://, s3a://, …) need the Hadoop FS API —
            # os.path would silently report missing and disable resume
            if spark is None:
                spark = SparkSession.getActiveSession()
            assert spark is not None, "remote StageStore roots need an active SparkSession"
            jpath = spark._jvm.org.apache.hadoop.fs.Path(p)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            return bool(fs.exists(jpath))
        return os.path.exists(p)

    def remove_all(self, spark: SparkSession) -> None:
        """Delete the whole stage-store root (fresh-run cleanup), working for
        both local paths and Hadoop FS URIs."""
        if self.root is None:
            return
        if "://" in self.root:
            jpath = spark._jvm.org.apache.hadoop.fs.Path(self.root)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(jpath):
                fs.delete(jpath, True)
        elif os.path.exists(self.root):
            import shutil

            shutil.rmtree(self.root)

    def load(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.format(self.format).load(self.path(stage))

    # -- sketch-config manifest (ADVICE r03): the digests/bands probe tables
    # are only meaningful at the config that produced them; a delta at a
    # mismatched config would silently find zero LSH candidates.  run_dedup
    # stamps the store; run_dedup_delta fails loudly on mismatch.
    _MANIFEST = "_sketch_config.json"

    def manifest_path(self, name: str | None = None) -> str:
        return os.path.join(self.root, name or self._MANIFEST)

    def read_manifest(self, spark: SparkSession, name: str | None = None) -> dict | None:
        """The sketch-config manifest stamped at run_dedup time, or None for
        a store that predates manifests.  ``name`` selects a different
        sidecar (e.g. the anchors-config manifest for the substring probe
        table, which is min_len-dependent)."""
        if self.root is None:
            return None
        p = self.manifest_path(name)
        if "://" in self.root:
            jpath = spark._jvm.org.apache.hadoop.fs.Path(p)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            if not fs.exists(jpath):
                return None
            # byte-at-a-time over py4j is fine for a <1 KB manifest and
            # needs only the Hadoop FS API (no commons-io on the driver
            # classpath — Hadoop 3 shades its own copy; review r04)
            stream = fs.open(jpath)
            try:
                chunks = bytearray()
                b = stream.read()
                while b >= 0:
                    chunks.append(b)
                    b = stream.read()
            finally:
                stream.close()
            return json.loads(bytes(chunks).decode("utf-8"))
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def write_manifest(
        self, spark: SparkSession, manifest: dict, name: str | None = None
    ) -> None:
        if self.root is None:
            return
        payload = json.dumps(manifest, indent=1, sort_keys=True)
        p = self.manifest_path(name)
        if "://" in self.root:
            jpath = spark._jvm.org.apache.hadoop.fs.Path(p)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            out = fs.create(jpath, True)
            try:
                out.write(bytearray(payload.encode("utf-8")))
            finally:
                out.close()
        else:
            os.makedirs(self.root, exist_ok=True)
            with open(p, "w") as fh:
                fh.write(payload)

    def remove_stage(self, spark: SparkSession, stage: str) -> None:
        """Delete one stage's table directory (local paths and Hadoop FS
        ``://`` URIs) — e.g. dropping the clusters override table after a
        compaction folded it into the base."""
        p = self.path(stage)
        if "://" in p:
            jpath = spark._jvm.org.apache.hadoop.fs.Path(p)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(jpath):
                fs.delete(jpath, True)
        elif os.path.exists(p):
            import shutil

            shutil.rmtree(p)

    def swap_in(self, spark: SparkSession, stage: str, pending_stage: str) -> None:
        """Replace ``stage``'s table with ``pending_stage``'s, working for
        both local paths and Hadoop FS URIs (``://`` roots) — the pattern for
        replacing a table some pending plan may still reference: write the
        replacement to a side path first, then swap."""
        replace_path(spark, self.path(stage), self.path(pending_stage))

    def materialize(
        self,
        spark: SparkSession,
        stage: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        resume: bool = True,
    ) -> DataFrame:
        """Write ``df`` as the stage table (unless it already exists and
        ``resume``) and return the re-read DataFrame (cuts lineage, makes the
        stage the new scan root for downstream plan optimization).

        The per-partition lineage pass is DEFERRED: each materialize used to
        run its own partition-count job (one extra Spark job per stage — a
        scale-flat scheduling term, VERDICT r04 #1); the counts for all
        stages now run as ONE unioned job inside :meth:`write_metrics`.
        """
        if self.root is None:
            return df
        t0 = time.monotonic()
        if not (resume and self.exists(stage)):
            writer = df.write.mode("overwrite").format(self.format)
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.save(self.path(stage))
            skipped = False
        else:
            skipped = True
        out = self.load(spark, stage)
        # re-materializing a stage (e.g. two deltas against one store, each
        # overwriting 'delta_candidates') supersedes the earlier pending
        # entry: its table contents are gone, and keeping both would count
        # the current table's partitions into BOTH entries at resolve time
        self._pending = [p for p in self._pending if p["stage"] != stage]
        self._pending.append(
            {
                "stage": stage,
                "run_id": self.run_id,
                "wall_ms": int((time.monotonic() - t0) * 1000),
                "resumed": skipped,
                "ts": time.time(),
            }
        )
        return out

    def resolve_metrics(self, spark: SparkSession) -> None:
        """Run the deferred per-partition lineage counts for every stage
        materialized since the last resolve — one unioned Spark job for the
        whole run instead of one job per stage (north_rule: per-partition
        lineage stays; its scheduling cost stops scaling with stage count).

        Counts reflect each table's contents AT RESOLVE TIME: a stage that
        was appended to after its materialize (delta probe-table appends)
        reports the post-append partitioning, which is the state the next
        run will actually scan."""
        if self.root is None or not self._pending:
            return
        union = None
        for p in self._pending:
            pm = self.partition_metrics(self.load(spark, p["stage"]), p["stage"])
            union = pm if union is None else union.unionByName(pm)
        parts = union.collect()
        by_stage: dict[str, list] = {}
        for r in parts:
            by_stage.setdefault(r["stage"], []).append(r)
        for p in self._pending:
            rows = by_stage.get(p["stage"], [])
            self._metrics.append(
                {
                    **p,
                    "rows_out": sum(r["rows"] for r in rows),
                    "n_partitions": len(rows),
                    "max_partition_rows": max((r["rows"] for r in rows), default=0),
                }
            )
            self._partition_rows.extend(
                {"stage": p["stage"], "run_id": self.run_id,
                 "partition_id": r["partition_id"], "rows": r["rows"]}
                for r in rows
            )
        self._pending = []

    def write_metrics(self, spark: SparkSession) -> None:
        """Persist per-stage lineage/metrics as a table next to the stages
        (resolving any deferred partition counts first)."""
        self.resolve_metrics(spark)
        if self.root is None or not self._metrics:
            return
        df = spark.createDataFrame(self._metrics)
        df.write.mode("append").format(self.format).save(os.path.join(self.root, "_metrics"))
        if self._partition_rows:
            pdf = spark.createDataFrame(self._partition_rows)
            pdf.write.mode("append").format(self.format).save(
                os.path.join(self.root, "_partition_metrics")
            )

    def metrics(self) -> list[dict]:
        """Resolved per-stage metrics (call after write_metrics / the end of
        a run; stages whose deferred counts haven't resolved yet are not
        included)."""
        return list(self._metrics)

    def partition_metrics(self, df: DataFrame, stage: str) -> DataFrame:
        """Per-partition row counts for a stage (skew visibility)."""
        return (
            df.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(F.count("*").alias("rows"))
            .withColumn("stage", F.lit(stage))
            .withColumn("run_id", F.lit(self.run_id))
        )
