"""Scalable consecutive pairing (reference J1, ``jaccard_correction_test.py:
857-895``): pair row 2i-1 with row 2i in global key order — WITHOUT a
single-partition global window.

The parity-scale J1 implementation (``__spark_entry__.q_j1_pair_zip_join``,
``sources/fasta.consecutive_pairs``) uses ``row_number() OVER (ORDER BY key)``
— one task does all the numbering, which is fine for parity fixtures and
wrong at 100x the orders table.  This operator distributes it:

1. sample ~200 keys per target partition ONCE, freeze the P-1 range
   boundaries as PLAN LITERALS (so every re-evaluation of the lazy result
   sees identical partitioning — no persist, no repartitionByRange
   re-sampling hazard);
2. pid = #boundaries <= key (an O(P) JVM array filter per row);
3. per-pid row counts -> driver (one tiny row per pid) -> cumulative
   offsets rebuilt into a literal map;
4. global_rn = offset[pid] + local row_number (window PARTITIONED by pid —
   every range numbers in parallel);
5. self-join odd/even on pair_id.

Driver-side state is O(#partitions), never O(rows).  Equality with the
global-window form is tested (tests/test_pipeline.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _range_boundaries(df: DataFrame, order_col: str, parts: int, n: int) -> list:
    """P-1 ascending split points sampled from ``order_col`` (any orderable
    type, not just numeric).  Collected once and embedded as literals."""
    if n == 0 or parts <= 1:
        return []
    frac = min(1.0, (parts * 200.0) / n)
    sample = sorted(
        r[0] for r in df.select(order_col).sample(False, frac, seed=7).collect()
        if r[0] is not None
    )
    if not sample:
        return []
    bounds = []
    for i in range(1, parts):
        b = sample[min(len(sample) - 1, (len(sample) * i) // parts)]
        if not bounds or b > bounds[-1]:  # keep strictly ascending
            bounds.append(b)
    return bounds


def _count_and_boundaries(
    df: DataFrame, order_col: str, parts: int
) -> tuple[int, list | None]:
    """(row count, boundary candidates) in as few jobs as possible.

    Numeric/date/timestamp keys: ONE aggregation job computes the exact
    count AND parts-1 approximate percentile split points (r06, guide §1.2
    "fewer passes": the previous count + sample pair cost two full scans of
    the key column before any real work started).  Global row numbers are
    BOUNDARY-INDEPENDENT — rn = offset[pid] + local rank is the global rank
    for ANY boundary placement, because offsets are rebuilt from the actual
    per-pid counts — so approximate (even run-to-run varying) percentiles
    only affect balance, never values.  Other orderable types (strings)
    keep the sample pass; returns (n, None) and the caller samples."""
    if parts <= 1:
        return df.count(), []
    from pyspark.sql.types import DateType, NumericType, TimestampType

    dt = df.schema[order_col].dataType
    if not isinstance(dt, (NumericType, DateType, TimestampType)):
        return df.count(), None
    fr = [i / parts for i in range(1, parts)]
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(
            order_col, F.array(*[F.lit(f) for f in fr]), F.lit(10_000)
        ).alias("bs"),
    ).collect()[0]
    bounds: list = []
    for b in row["bs"] or []:
        if b is not None and (not bounds or b > bounds[-1]):  # strictly ascending
            bounds.append(b)
    return row["n"], bounds


def global_row_numbers(
    df: DataFrame, order_col: str, partitions: int | None = None,
    small_input_threshold: int = 1_000_000,
) -> DataFrame:
    """df + ``rn`` (1-based dense global order by ``order_col``) computed with
    per-range parallelism.  ``order_col`` values must be unique (they are
    the sort key; ties would make the order non-deterministic).

    Size gate: below ``small_input_threshold`` rows (or at 1 target
    partition) the single-partition global window is used instead — at that
    scale one task numbers the rows faster than the ranged form's three
    metadata passes cost (measured 3x on the sf0.1 orders table, VERDICT
    r02 #5).  Pass ``small_input_threshold=0`` to force the ranged plan
    (the form the plan test asserts has no SinglePartition exchange).

    Contract: ``df`` must be DETERMINISTIC under re-evaluation — this
    operator runs one count, one boundary-sample collect, one per-pid count
    pass, and the caller's final job as independent evaluations (the three
    metadata passes are column-pruned to ``order_col``, so on columnar
    sources they cost a fraction of the final job).  A nondeterministic
    input (``sample()`` in its lineage, a table mutating between actions)
    would pair wrong rows silently: persist such inputs first."""
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    n, bounds = _count_and_boundaries(df, order_col, parts)
    if (n < small_input_threshold and small_input_threshold > 0) or parts <= 1:
        w = Window.orderBy(order_col)
        return df.withColumn("rn", F.row_number().over(w))
    if bounds is None:
        bounds = _range_boundaries(df, order_col, parts, n)
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        pid = F.size(F.filter(barr, lambda b: b <= F.col(order_col)))
    else:
        pid = F.lit(0)
    ranged = df.withColumn("_pid", pid)
    w = Window.partitionBy("_pid").orderBy(order_col)
    # one tiny row per pid -> driver; cumulative offsets are O(#partitions).
    # The pid expression is pure (literal boundaries), so this action and the
    # final job see identical assignments — no persist needed.
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    if not offsets:
        return ranged.withColumn("rn", F.lit(1).cast("int")).drop("_pid")
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    return (
        ranged.withColumn("rn", F.row_number().over(w) + off_map[F.col("_pid")])
        .drop("_pid")
    )


def consecutive_pairs_ranged(
    df: DataFrame, order_col: str, partitions: int | None = None,
    small_input_threshold: int = 1_000_000,
) -> DataFrame:
    """(pair_id, key_a, key_b, + _a/_b copies of the remaining columns):
    row 2i-1 zipped with row 2i in ``order_col`` order, numbered in parallel
    (single-window below ``small_input_threshold`` rows — see
    :func:`global_row_numbers`).  An odd trailing row is dropped (reference
    behavior: the unpaired tail sequence only triggers a warning,
    ``jaccard_correction_test.py:884-893``).
    """
    rn = global_row_numbers(df, order_col, partitions, small_input_threshold)
    others = [c for c in df.columns if c != order_col]
    # one hash aggregation instead of an odd/even self-join: the join form
    # shuffled both halves by pair_id and built a join hash table; this ships
    # the same rows through ONE exchange and reassembles each pair with
    # first(ignorenulls) (deterministic: exactly one odd and one even row per
    # pair_id).  Output columns/rows identical — the inner join's "drop the
    # unpaired odd tail" becomes the key_b IS NOT NULL filter.
    odd = F.col("rn") % 2 == 1

    def side(col, when_odd):
        return F.first(
            F.when(odd if when_odd else ~odd, F.col(col)), ignorenulls=True
        )

    out = (
        rn.groupBy(F.ceil(F.col("rn") / 2).cast("long").alias("pair_id"))
        .agg(
            side(order_col, True).alias("key_a"),
            *[side(c, True).alias(f"{c}_a") for c in others],
            side(order_col, False).alias("key_b"),
            *[side(c, False).alias(f"{c}_b") for c in others],
        )
        .where(F.col("key_b").isNotNull())
    )
    return out
