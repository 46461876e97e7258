"""Distributed FASTA source (parity-domain input).

The reference streams ``(name, seq)`` pairs from multi-line FASTA files
(``fasta_sequences``, ``jaccard_correction_test.py:900-915`` /
``sliding_jaccard.py:630-645``) with gzip-transparent open
(``jaccard_correction_test.py:225-228``).  Spark-first equivalent: one
``spark.read.text`` scan (line per row); only LINE-INITIAL ``>`` starts a
record (a ``>`` inside a header description does not split, matching the
reference's ``startswith('>')`` test), every line is fully stripped (CRLF
and stray whitespace included, like the reference's ``line.strip()``), and a
cumulative header count groups body lines under their record.  Gzip is
handled by Spark's codec layer; no Python in the parse path.

Record order: line ids come from ``monotonically_increasing_id`` which
follows (partition, offset).  ``.gz`` inputs are unsplittable (one partition
per file) so the index reproduces the reference's file order exactly.  The
single global window is fine at parity-fixture scale; FASTA is not the
100TB-domain input.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """(seq_idx long, name string, seq string) for every FASTA record.

    Bodies are uppercased like every reference read site
    (``jaccard_correction_test.py:865-877``, ``sliding_jaccard.py:254``).
    Junk lines before the first header are dropped (the reference asserts
    instead — ``fasta_sequences`` requires header-first).
    """
    raw = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("_rid"),
        F.regexp_replace("value", r"^\s+|\s+$", "").alias("_line"),
    )
    w = Window.orderBy("_rid")
    is_header = F.col("_line").startswith(">")
    lines = raw.select(
        "_rid", "_line", is_header.alias("_hdr"),
        (F.sum(is_header.cast("long")).over(w) - 1).alias("seq_idx"),
    ).where(F.col("seq_idx") >= 0)
    recs = lines.groupBy("seq_idx").agg(
        # the header is always the group's first line (min _rid)
        F.trim(F.substring(F.min_by(F.col("_line"), F.col("_rid")), 2, 1 << 30)).alias("name"),
        F.upper(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~F.col("_hdr"), F.struct("_rid", "_line"))
                        )
                    ),
                    lambda s: s["_line"],
                ),
            )
        ).alias("seq"),
    )
    return recs.select(F.col("seq_idx").cast("long"), "name", "seq").orderBy("seq_idx")


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
