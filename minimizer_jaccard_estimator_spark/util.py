"""Small config-parsing helpers mirrored from the reference CLIs."""

from __future__ import annotations

from math import ceil


def int_with_unit(s: str) -> int:
    """Parse an integer with an optional K/M/G suffix (powers of 1000).

    Bit-parity with reference ``sliding_jaccard.py:702-716`` /
    ``jaccard_correction_test.py:999-1013``: uppercase suffix only; plain
    ``int`` parse first, else ``ceil(float * multiplier)`` (so "2.5M" ->
    2_500_000 and "0.1K" -> 100).
    """
    if s.endswith("K"):
        multiplier, s = 1000, s[:-1]
    elif s.endswith("M"):
        multiplier, s = 1000 * 1000, s[:-1]
    elif s.endswith("G"):
        multiplier, s = 1000 * 1000 * 1000, s[:-1]
    else:
        multiplier = 1
    try:
        return int(s) * multiplier
    except ValueError:
        return int(ceil(float(s) * multiplier))


def parse_hash_spec(spec: str, default_type: str = "minimap2") -> tuple[str, int]:
    """Parse the reference's ``--hash=[type.]seed`` CLI form
    (``sliding_jaccard.py:106-125``): seed is decimal or 0x-hex; the type
    prefix is optional and dot-separated."""
    s = spec
    hash_type = default_type
    if "." in s:
        head, tail = s.split(".", 1)
        if not head.isdigit() and not head.lower().startswith("0x"):
            hash_type, s = head, tail
    seed = int(s, 16) if s.lower().startswith("0x") else int(s)
    return hash_type, seed


def write_report(df, out: str | None, fmt: str = "tsv") -> None:
    """Shared report sink for the CLI job scripts: stdout TSV when ``out``
    is None, else a tab-separated CSV dir or parquet."""
    if out is None:
        for line in df.toPandas().to_csv(sep="\t", index=False).splitlines():
            print(line)
    elif fmt == "tsv":
        df.write.mode("overwrite").option("sep", "\t").option("header", True).csv(out)
    else:
        df.write.mode("overwrite").parquet(out)


def spread_small_input(df, parts: int | None = None):
    """Round-robin repartition iff the input has fewer partitions than the
    cluster has task slots (r06, guide §2.5 "input skew: repartition
    immediately after the read").

    The heavy per-row Arrow/pandas operators (pairwise scoring, sliding
    scan, feature extraction, sketch/signature kernels) inherit their
    input's partitioning; a few-MB parquet fixture yields 1-2 splits, which
    serializes minutes of kernel CPU into 1-2 tasks.  Inputs that are
    already at least as parallel as the cluster pass through UNCHANGED — a
    well-partitioned 100 TB table never pays the extra shuffle, and the
    repartition can only widen, never shrink, the task count.
    """
    if getattr(df, "isStreaming", False):
        return df  # partition introspection is undefined on streaming plans
    parts = parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= parts:
        return df
    return df.repartition(parts)
