"""Distributed suffix-array pass: exact substring-level duplicate spans.

north_rule requirement: "a distributed suffix-array pass for exact
substring-level duplicate spans".  Design (Spark-first, no per-row Python):

1. **Anchor stage** — every document is winnowed into (w,k) minimizer anchors
   of its byte shingles (same kernels as the sketch stage, reference
   ``winnowed_minimizers.py:18-53``), with ``k + w - 1 = min_len``.  The
   winnowing guarantee (Schleimer et al., MOSS): any two documents sharing an
   exact substring of length >= min_len share at least one anchor VALUE, so
   the UNCAPPED anchor equi-join has perfect recall for spans >= min_len.
   The frequency cap below trades recall on corpus-wide boilerplate anchors
   for bounded work — capped anchors are recorded, never silently dropped.
2. **Candidate join** — exploded ``(doc_id, anchor)`` self-join on anchor
   hash, hot anchors capped by frequency (stop-shingle removal) exactly like
   the LSH bucket cap; this is the scale knob that keeps the shuffle linear
   in corpus size rather than quadratic in bucket size.
3. **Verify stage** — candidate pairs join back to their texts and a
   vectorized pandas UDF runs the per-pair suffix-array kernel
   (:mod:`..suffix`: prefix-doubling SA + Kasai LCP over ``a+SEP+b``) to emit
   exact maximal duplicate spans, coverage, and the longest shared substring.

At cluster scale each stage is a plain shuffle-on-key: anchors are uniformly
distributed 64-bit hashes (no key skew by construction after the frequency
cap), and verification is embarrassingly parallel per pair.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .. import kernels as K
from ..suffix import substring_stats


def anchor_params(min_len: int) -> tuple[int, int]:
    """(k, w) with k + w - 1 == min_len (winnowing detection guarantee)."""
    if min_len < 4:
        raise ValueError("min_len must be >= 4")
    k = min(32, max(4, (min_len + 1) // 2))
    w = min_len - k + 1
    return k, w


_ANCHOR_SCHEMA = ArrayType(
    StructType([StructField("anchor", LongType()), StructField("pos", IntegerType())])
)


def _anchor_udf(min_len: int, hash_type: str, seed: int):
    k, w = anchor_params(min_len)

    def run(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in batches:
            out = []
            for t in texts:
                h = K.hash_text_shingles(t or "", k, hash_type, seed)
                v, p = K.winnow_minimizers(h, w)
                iv = K.u64_to_i64(v)
                out.append([{"anchor": int(a), "pos": int(q)} for a, q in zip(iv, p)])
            yield pd.Series(out)

    return F.pandas_udf(run, _ANCHOR_SCHEMA)


def anchor_table(
    docs: DataFrame,
    min_len: int,
    hash_type: str = "splitmix64",
    seed: int = 0,
    id_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Exploded (id, anchor, pos) winnowed-anchor table."""
    u = _anchor_udf(min_len, hash_type, seed)
    return (
        docs.select(F.col(id_col).alias("id"), u(F.col(text_col)).alias("_a"))
        .select("id", F.explode("_a").alias("a"))
        .select("id", F.col("a.anchor").alias("anchor"), F.col("a.pos").alias("pos"))
    )


def substring_candidate_pairs(
    anchors: DataFrame, max_bucket_size: int | None = 200,
    with_dropped: bool = False,
    cache_registry: list | None = None,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Distinct (id_a < id_b) pairs sharing >=1 anchor value.

    Hot anchors (> max_bucket_size docs) are excluded before the self-join —
    they are boilerplate shingles whose pair blow-up is quadratic.  NOTE this
    is a recall trade: duplicate spans whose ONLY shared anchors are
    corpus-wide boilerplate are missed; ``with_dropped=True`` returns the
    excluded (anchor, n_docs) table so capped runs are auditable (no silent
    caps), and raising max_bucket_size restores full recall.

    The distinct (id, anchor) table feeds FOUR consumers (the frequency
    aggregate, the keep join, and both self-join sides); it is persisted so
    the anchor winnow UDF runs once per corpus, not once per consumer
    (measured 163 s -> 29 s on the full duplicate_spans query at sf0.1 —
    guide §5 "reused AND expensive to recompute").  Persisted handles are
    appended to ``cache_registry`` when given (the dedup pipeline's release
    discipline); without a registry they stay cached for the session — the
    one-shot query path — at MEMORY_AND_DISK, bounded by the narrow
    (id, anchor) row count (~16 B/row, linear in corpus size).
    """
    per_doc = anchors.select("id", "anchor").distinct().persist()
    if cache_registry is not None:
        cache_registry.append(per_doc)
    dropped = None
    if max_bucket_size is not None:
        freq = per_doc.groupBy("anchor").agg(F.count("*").alias("n_docs"))
        if with_dropped:
            freq = freq.persist()
            if cache_registry is not None:
                cache_registry.append(freq)
            dropped = freq.where(F.col("n_docs") > max_bucket_size)
        keep = freq.where(F.col("n_docs") <= max_bucket_size).select("anchor")
        per_doc = per_doc.join(keep, "anchor")
    elif with_dropped:
        dropped = anchors.sparkSession.createDataFrame([], "anchor long, n_docs long")
    a = per_doc.select(F.col("anchor"), F.col("id").alias("id_a"))
    b = per_doc.select(F.col("anchor"), F.col("id").alias("id_b"))
    pairs = (
        a.join(b, "anchor")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if with_dropped:
        return pairs, dropped
    return pairs


_SPAN_SCHEMA = StructType(
    [
        StructField("cov_a", LongType()),
        StructField("cov_b", LongType()),
        StructField("longest", LongType()),
        StructField("n_spans", LongType()),  # TRUE count (spans array is capped)
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("pos_a", IntegerType()),
                        StructField("pos_b", IntegerType()),
                        StructField("length", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def _span_udf(min_len: int, max_spans: int):
    def run(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.DataFrame]:
        for ta, tb in it:
            cov_a, cov_b, longest, n_spans, spans = [], [], [], [], []
            for x, y in zip(ta, tb):
                st = substring_stats(x or "", y or "", min_len)
                cov_a.append(st["cov_a"])
                cov_b.append(st["cov_b"])
                longest.append(st["longest"])
                n_spans.append(len(st["spans"]))
                spans.append(
                    [
                        {"pos_a": pa, "pos_b": pb, "length": ln}
                        for pa, pb, ln in st["spans"][:max_spans]
                    ]
                )
            yield pd.DataFrame(
                {
                    "cov_a": np.array(cov_a, dtype=np.int64),
                    "cov_b": np.array(cov_b, dtype=np.int64),
                    "longest": np.array(longest, dtype=np.int64),
                    "n_spans": np.array(n_spans, dtype=np.int64),
                    "spans": spans,
                }
            )

    return F.pandas_udf(run, _SPAN_SCHEMA)


def span_stats_for_pairs(
    pairs: DataFrame,
    texts: DataFrame,
    min_len: int,
    max_spans_per_pair: int = 64,
) -> DataFrame:
    """Run the per-pair suffix-array kernel over ``pairs`` (id_a, id_b),
    fetching each side's text from ``texts`` (id, text).  Shared by the full
    pass below and the delta pass (operators/delta.py), which restricts
    ``pairs`` to delta-touched candidates and prunes ``texts`` to their
    endpoints first.  Pairs with no span >= min_len are dropped."""
    # byte lengths (octet_length), matching the byte-offset span coordinates
    # and byte coverage from the suffix-array kernel — char lengths would
    # overstate coverage fractions on multi-byte text
    ta = texts.select(F.col("id").alias("id_a"), F.col("text").alias("_text_a"),
                      F.octet_length("text").cast("long").alias("len_a"))
    tb = texts.select(F.col("id").alias("id_b"), F.col("text").alias("_text_b"),
                      F.octet_length("text").cast("long").alias("len_b"))
    joined = pairs.join(ta, "id_a").join(tb, "id_b")
    st = _span_udf(min_len, max_spans_per_pair)(F.col("_text_a"), F.col("_text_b")).alias("_st")
    return (
        joined.select("id_a", "id_b", "len_a", "len_b", st)
        .select(
            "id_a",
            "id_b",
            "len_a",
            "len_b",
            F.col("_st.cov_a").alias("cov_a"),
            F.col("_st.cov_b").alias("cov_b"),
            F.col("_st.longest").alias("longest"),
            F.col("_st.n_spans").alias("n_spans"),
            F.col("_st.spans").alias("spans"),
        )
        .where(F.col("longest") >= min_len)
    )


def duplicate_spans(
    docs: DataFrame,
    min_len: int,
    hash_type: str = "splitmix64",
    seed: int = 0,
    max_bucket_size: int | None = 200,
    max_spans_per_pair: int = 64,
    id_col: str = "conv_id",
    text_col: str = "text",
    with_dropped: bool = False,
    anchors: DataFrame | None = None,
    cache_registry: list | None = None,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """End-to-end suffix-array duplicate-span pass.

    Output: one row per candidate doc pair with exact duplicated-byte
    coverage on each side, the longest shared substring, the TRUE maximal
    span count, and (capped) span coordinates.  Pairs with no span >=
    min_len are dropped.  ``with_dropped=True`` also returns the hot-anchor
    table excluded by the frequency cap.  ``anchors`` short-circuits the
    anchor UDF pass with a precomputed (id, anchor) table — run_dedup passes
    the store's materialized ``anchors`` probe stage so the winnow UDF runs
    once per corpus, not once per consumer.

    The candidate pair table is persisted before the span verify: its two
    text-attach joins would otherwise re-run the whole anchor/self-join
    chain once per side (see substring_candidate_pairs for the registry/
    lifetime contract).
    """
    base = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    if anchors is None:
        anchors = anchor_table(base, min_len, hash_type, seed, id_col="id")
    pairs = substring_candidate_pairs(anchors, max_bucket_size, with_dropped,
                                      cache_registry=cache_registry)
    dropped = None
    if with_dropped:
        pairs, dropped = pairs
    pairs = pairs.persist()
    if cache_registry is not None:
        cache_registry.append(pairs)
    out = span_stats_for_pairs(pairs, base, min_len, max_spans_per_pair)
    if with_dropped:
        return out, dropped
    return out


def substring_dup_pairs(
    spans: DataFrame, min_cov_frac: float = 0.5
) -> DataFrame:
    """(id_a, id_b) pairs where either side has >= min_cov_frac of its bytes
    inside exact duplicate spans — the candidate source fed into the dedup
    pipeline's verify/cluster stages."""
    frac_a = F.col("cov_a") / F.greatest(F.col("len_a"), F.lit(1))
    frac_b = F.col("cov_b") / F.greatest(F.col("len_b"), F.lit(1))
    return (
        spans.where((frac_a >= min_cov_frac) | (frac_b >= min_cov_frac))
        .select("id_a", "id_b")
    )
