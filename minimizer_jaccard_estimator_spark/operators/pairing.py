"""Scalable consecutive pairing (reference J1, ``jaccard_correction_test.py:
857-895``): pair row 2i-1 with row 2i in global key order — WITHOUT a
single-partition global window.

The parity-scale J1 implementation (``__spark_entry__.q_j1_pair_zip_join``,
``sources/fasta.consecutive_pairs``) uses ``row_number() OVER (ORDER BY key)``
— one task does all the numbering, which is fine for parity fixtures and
wrong at 100x the orders table.  This operator distributes it:

1. ``repartitionByRange(key)`` — range shuffle, sorted runs per partition;
2. per-partition local ``row_number`` (window PARTITIONED by partition id —
   every partition numbers in parallel);
3. per-partition row counts -> driver (one tiny row per partition) ->
   cumulative offsets broadcast back;
4. global_rn = offset[pid] + local_rn; pair_id = ceil(global_rn / 2);
5. self-join odd/even on pair_id.

The driver-side state is O(#partitions), never O(rows).  Equality with the
global-window form is tested (tests/test_pipeline.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def global_row_numbers(df: DataFrame, order_col: str, partitions: int | None = None) -> DataFrame:
    """df + ``rn`` (1-based dense global order by ``order_col``) computed with
    per-partition parallelism.  ``order_col`` values must be unique (they are
    the sort key; ties would make the order non-deterministic)."""
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    # persist: the counts action and the downstream joins must see the SAME
    # range-sampling outcome (repartitionByRange samples boundaries)
    local = ranged.withColumn("_lrn", F.row_number().over(w)).persist()
    # one row per partition -> driver; cumulative offsets are O(#partitions)
    counts = {
        r["_pid"]: r["cnt"]
        for r in local.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    if not counts:
        return local.withColumn("rn", F.lit(1).cast("int")).drop("_pid", "_lrn")
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    return (
        local.withColumn("rn", F.col("_lrn") + off_map[F.col("_pid")])
        .drop("_pid", "_lrn")
    )


def consecutive_pairs_ranged(
    df: DataFrame, order_col: str, partitions: int | None = None
) -> DataFrame:
    """(pair_id, key_a, key_b, + _a/_b copies of the remaining columns):
    row 2i-1 zipped with row 2i in ``order_col`` order, numbered in parallel.
    An odd trailing row is dropped (reference behavior: the unpaired tail
    sequence only triggers a warning, ``jaccard_correction_test.py:884-893``).
    """
    rn = global_row_numbers(df, order_col, partitions)
    others = [c for c in df.columns if c != order_col]
    a = rn.where(F.col("rn") % 2 == 1).select(
        ((F.col("rn") + 1) / 2).cast("long").alias("pair_id"),
        F.col(order_col).alias("key_a"),
        *[F.col(c).alias(f"{c}_a") for c in others],
    )
    b = rn.where(F.col("rn") % 2 == 0).select(
        (F.col("rn") / 2).cast("long").alias("pair_id"),
        F.col(order_col).alias("key_b"),
        *[F.col(c).alias(f"{c}_b") for c in others],
    )
    return a.join(b, "pair_id")
