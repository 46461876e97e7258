"""Distributed FASTA source (parity-domain input).

The reference streams ``(name, seq)`` pairs from multi-line FASTA files
(``fasta_sequences``, ``jaccard_correction_test.py:900-915`` /
``sliding_jaccard.py:630-645``) with gzip-transparent open
(``jaccard_correction_test.py:225-228``).  Spark-first equivalent: one
``spark.read.text`` scan with ``lineSep='>'`` — each FASTA record becomes one
row, split JVM-side into header + concatenated body lines; gzip handled by
Spark's codec layer.  No Python in the parse path.

Record order: sequence index is assigned by ``monotonically_increasing_id``
ordering, which follows (partition, offset-within-partition).  Text files are
not splittable on a custom lineSep (and ``.gz`` never is), so a single FASTA
file is one partition and the index reproduces the reference's file order
exactly; across many input files the order is per-file.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """(seq_idx long, name string, seq string) for every FASTA record.

    Bodies are uppercased like every reference read site
    (``jaccard_correction_test.py:865-877``, ``sliding_jaccard.py:254``).
    """
    raw = spark.read.text(path, lineSep=">")
    recs = raw.where(F.length(F.trim("value")) > 0).select(
        F.monotonically_increasing_id().alias("_mid"),
        F.split(F.col("value"), "\n").alias("_lines"),
    )
    name = F.trim(F.element_at("_lines", 1))
    body = F.expr("upper(concat_ws('', slice(_lines, 2, greatest(size(_lines) - 1, 0))))")
    ordered = recs.select(
        F.row_number().over(Window.orderBy("_mid")).alias("_rn"),
        name.alias("name"),
        body.alias("seq"),
    )
    return ordered.select((F.col("_rn") - 1).cast("long").alias("seq_idx"), "name", "seq")


def consecutive_pairs(fasta: DataFrame) -> DataFrame:
    """Chunk an ordered sequence stream into consecutive pairs (1,2), (3,4), …
    — the reference's one-file mode of ``fasta_pairs``
    (``jaccard_correction_test.py:857-895``).  An unpaired trailing sequence
    is dropped (the reference warns and skips it).

    Returns (pair_id long, name_a, text_a, name_b, text_b).
    """
    a = fasta.where(F.col("seq_idx") % 2 == 0).select(
        (F.col("seq_idx") / 2).cast("long").alias("pair_id"),
        F.col("name").alias("name_a"),
        F.col("seq").alias("text_a"),
    )
    b = fasta.where(F.col("seq_idx") % 2 == 1).select(
        ((F.col("seq_idx") - 1) / 2).cast("long").alias("pair_id"),
        F.col("name").alias("name_b"),
        F.col("seq").alias("text_b"),
    )
    return a.join(b, "pair_id")


def zipped_pairs(fasta_a: DataFrame, fasta_b: DataFrame) -> DataFrame:
    """Positional zip of two sequence streams — the reference's two-file mode
    (``jaccard_correction_test.py:868-877``).  Inner join on sequence index:
    leftover sequences on either side are dropped (the reference warns)."""
    a = fasta_a.select(
        F.col("seq_idx").alias("pair_id"),
        F.col("name").alias("name_a"),
        F.col("seq").alias("text_a"),
    )
    b = fasta_b.select(
        F.col("seq_idx").alias("pair_id"),
        F.col("name").alias("name_b"),
        F.col("seq").alias("text_b"),
    )
    return a.join(b, "pair_id")
