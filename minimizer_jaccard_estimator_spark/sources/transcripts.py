"""Synthetic multi-turn transcript corpus + conversation assembly.

The engine's production input is an Iceberg table with columns
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` (BASELINE.json input_hint).  This module provides:

- :func:`synthetic_transcripts` — a deterministic, DISTRIBUTED corpus
  generator with planted duplicate structure (exact dups, near-dups at
  several mutation rates, unrelated convs, a hot-key skew family), mirroring
  the reference's experiment corpus design
  (``/root/reference/reproduce/README.md:195-255``) for transcripts.
  Generation is per-row deterministic (seeded by conv index), so the corpus
  is identical at any partitioning/parallelism — required for the scaling
  benchmark and resume tests.
- :func:`assemble_conversations` — per-conversation text assembly under
  stable (conv_id, turn_idx) order: the transcript-domain equivalent of the
  reference's FASTA sequence scan (``sliding_jaccard.py:630-645``).
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)

TRUTH_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("dup_of", StringType()),
        StructField("mutation_rate", StringType()),
    ]
)

# near-dup mutation rates cycled over planted duplicates (reference corpus
# uses 0.1%..10%, reproduce/README.md:214-233)
MUTATION_RATES = (0.0, 0.001, 0.01, 0.05, 0.10)

_ROLES = ("user", "assistant", "assistant", "tool")
_TOOLS = (None, None, "search", "bash", "python", "browser")


def _vocab(seed: int, size: int = 800) -> list[str]:
    rng = random.Random(f"vocab:{seed}")
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = set()
    while len(words) < size:
        n = rng.randint(3, 10)
        words.add("".join(rng.choice(alphabet) for _ in range(n)))
    return sorted(words)


def _conv_rows(conv_idx: int, n_base: int, seed: int, vocab: list[str],
               turns_min: int, turns_max: int, words_per_turn: int,
               skew_fraction: float):
    """All turn rows for one conversation index. Pure function of
    (conv_idx, generator params) — partitioning-independent."""
    # dup structure: indices >= n_base are clones of (idx % n_base) mutated
    # at a rate cycled from MUTATION_RATES
    if conv_idx < n_base:
        base_idx = conv_idx
        rate = None
    else:
        base_idx = conv_idx % n_base
        rate = MUTATION_RATES[(conv_idx // n_base - 1) % len(MUTATION_RATES)]

    rng = random.Random(f"conv:{seed}:{base_idx}")
    n_turns = rng.randint(turns_min, turns_max)
    # hot-key skew family: the first skew_fraction of base convs get 8x turns
    if base_idx < int(n_base * skew_fraction):
        n_turns *= 8
    rows = []
    conv_id = f"c{conv_idx:010d}"
    base_id = f"c{base_idx:010d}"
    mrng = random.Random(f"mut:{seed}:{conv_idx}") if rate is not None else None
    for t in range(n_turns):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(words_per_turn)]
        if mrng is not None and rate > 0:
            for i in range(len(words)):
                if mrng.random() < rate:
                    words[i] = vocab[mrng.randrange(len(vocab))]
        role = _ROLES[t % len(_ROLES)]
        tool = _TOOLS[rng.randrange(len(_TOOLS))] if role == "tool" else None
        ts = pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=conv_idx * 1000 + t)
        rows.append((conv_id, t, role, " ".join(words), tool, ts))
    truth = (conv_id, base_id if conv_idx >= n_base else None,
             str(rate) if rate is not None else None)
    return rows, truth


def synthetic_transcripts(
    spark: SparkSession,
    n_base: int = 200,
    dup_factor: int = 2,
    seed: int = 42,
    turns_min: int = 3,
    turns_max: int = 12,
    words_per_turn: int = 30,
    skew_fraction: float = 0.01,
    partitions: int | None = None,
    with_truth: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Deterministic transcript corpus of ``n_base * (1 + dup_factor)``
    conversations; every conv with index >= n_base is a (near-)duplicate of
    ``index % n_base``.  Distributed generation via mapInPandas over a range —
    no driver-side materialization, scales linearly with executors."""
    n_total = n_base * (1 + dup_factor)
    params = dict(n_base=n_base, seed=seed, turns_min=turns_min, turns_max=turns_max,
                  words_per_turn=words_per_turn, skew_fraction=skew_fraction)
    vocab = _vocab(seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for conv_idx in pdf["id"].tolist():
                rows, _ = _conv_rows(int(conv_idx), vocab=vocab, **params)
                out.extend(rows)
            yield pd.DataFrame(out, columns=[f.name for f in TRANSCRIPT_SCHEMA.fields])

    rng_df = spark.range(0, n_total, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    df = rng_df.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    if not with_truth:
        return df

    def gen_truth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_conv_rows(int(i), vocab=vocab, **params)[1] for i in pdf["id"].tolist()]
            yield pd.DataFrame(out, columns=[f.name for f in TRUTH_SCHEMA.fields])

    truth = rng_df.mapInPandas(gen_truth, schema=TRUTH_SCHEMA)
    return df, truth


def assemble_conversations(transcripts: DataFrame, sep: str = "\n") -> DataFrame:
    """conv_text(conv_id, n_turns, text, text_len): concatenate per-turn text
    under stable (conv_id, turn_idx) order.

    Spark-first: one hash-aggregate (map-side partial agg) + array_sort on
    (turn_idx, text) structs — no window function, no Python.  array_sort on
    structs orders by fields left-to-right, so turn_idx dominates and the
    original per-turn text is reproduced exactly (the per-turn text-equality
    invariant is tested in tests/test_pipeline.py).
    """
    turns = F.array_sort(F.collect_list(F.struct("turn_idx", "text")))
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.count("*").cast("int").alias("n_turns"),
            F.concat_ws(sep, F.transform(turns, lambda s: s["text"])).alias("text"),
        )
        .withColumn("text_len", F.length("text").cast("long"))
    )
