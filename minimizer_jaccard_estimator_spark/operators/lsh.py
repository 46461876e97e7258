"""LSH band hashing + candidate-pair generation.

The reference has no LSH (it scores given pairs); this stage generalizes its
hash-equijoin candidate seed (``shared_hash_positions``,
``jaccard_correction_test.py:736-761``) into banded-MinHash candidate
generation at corpus scale.

Scale notes:
- band hashes are computed JVM-side (``transform`` + ``xxhash64`` over array
  slices) — the exploded rows carry only (id, band_id, band_hash), never the
  full signature, so the band shuffle is ~24 bytes/row * bands.
- candidate generation ships the band table ONCE: a map-side-combined count
  aggregation sizes buckets first (tiny count rows, never id lists), the
  band rows join the surviving bucket keys, and the bounded ``collect_list``
  + map-side JVM pair expansion reuse that join's partitioning — never a
  band-table self-join (which would ship the widest intermediate three more
  times).  ``max_bucket_size`` bounds both the per-bucket list memory and
  the quadratic pair expansion, dropping degenerate buckets (thousands of
  identical boilerplate docs) with an explicit lineage table instead of a
  silent blow-up — exact dups are still caught by the exact-dedup fast path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.sketch import SketchConfig


def band_hashes(signatures: DataFrame, cfg: SketchConfig, id_col: str = "conv_id") -> DataFrame:
    """(id, band_id, band_hash) — one row per band per doc."""
    nb, r = cfg.lsh_bands, cfg.lsh_rows
    bands = F.expr(
        f"transform(sequence(0, {nb - 1}), b -> "
        f"struct(b as band_id, xxhash64(slice(minhash, b * {r} + 1, {r})) as band_hash))"
    )
    return signatures.select(
        F.col(id_col), F.explode(bands).alias("bh")
    ).select(id_col, F.col("bh.band_id").alias("band_id"), F.col("bh.band_hash").alias("band_hash"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    cfg: SketchConfig,
    id_col: str = "conv_id",
    max_bucket_size: int | None = 1000,
    with_dropped: bool = False,
    cache_registry: list | None = None,
    bands: DataFrame | None = None,
    distinct: bool = True,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Distinct candidate pairs (id_a < id_b) sharing any LSH band bucket.

    ``distinct=False`` skips the final pair dedup shuffle — for callers that
    union these pairs with another source and distinct the union themselves
    (the dedup pipeline), a distinct here would shuffle the pair set twice.

    The band table is shipped ONCE: a map-side-combined count aggregation
    sizes the buckets first (it shuffles tiny partially-aggregated count
    rows, never id lists), the band rows equi-join against the surviving
    bucket keys (this is the single shuffle of the wide table), and the
    ``collect_list`` + in-JVM pair expansion (double posexplode / slice —
    never a self-join) run on the join's partitioning without a further
    exchange.  Filtering by count BEFORE collecting means no aggregation
    buffer ever materializes a degenerate bucket's full membership: a
    boilerplate bucket with millions of identical docs costs one long of
    count state, not an executor-OOM-sized list.  Per-bucket list memory is
    therefore bounded by ``max_bucket_size`` ids.

    ``with_dropped=True`` additionally returns the (band_id, band_hash,
    n_docs) buckets the cap excluded.  When ``cache_registry`` is given the
    (tiny) count aggregate is persisted and appended to it so BOTH outputs
    derive from one computation and the caller unpersists it once they are
    materialized; without a registry the dropped table recomputes the
    (map-side-combined, cheap) aggregate instead — persisting with nobody to
    unpersist would pin executor storage memory for the session lifetime.

    ``bands`` short-circuits the band computation with a precomputed
    (id, band_id, band_hash) table (e.g. the checkpointed corpus bands stage)
    — the signature transform then never re-runs over those rows."""
    b = bands if bands is not None else band_hashes(signatures, cfg, id_col)
    # (r06 A/B note: sharing ONE bucket-keyed exchange between the count
    # aggregate and the bucket join — b.repartition(band_id, band_hash)
    # before both — was tried and reverted: AQE coalesces the two exchange
    # instances independently, which defeats ReuseExchange, and the
    # complete-mode count aggregate built its full 3.9M-key map per task
    # where the map-side partial had amortized it (aggregate build 33 ->
    # 70 s, pipeline CPU total up ~significantly in the same window).  The
    # map-side partial stays even though it combines little — its output
    # rows, not its build, are the cheap part.)
    sizes = (
        b.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") >= 2)
    )
    dropped = None
    if max_bucket_size is not None:
        if with_dropped:
            if cache_registry is not None:
                sizes = sizes.persist()
                cache_registry.append(sizes)
            dropped = sizes.where(F.col("_n") > max_bucket_size).select(
                "band_id", "band_hash", F.col("_n").cast("long").alias("n_docs")
            )
        sizes = sizes.where(F.col("_n") <= max_bucket_size)
    elif with_dropped:
        dropped = signatures.sparkSession.createDataFrame(
            [], "band_id int, band_hash long, n_docs long"
        )
    # (r06 A/B note: deduplicating identical bucket MEMBERSHIP lists across
    # bands before expansion — sort_array + distinct on the list rows — was
    # tried and reverted: the array-keyed aggregation costs more than the
    # duplicate pair blocks it removes at every measured scale, e.g.
    # dedup_documents 44 -> 88 s at the sf1.0 shape.)
    # the surviving-bucket side sits behind an aggregation whose size the
    # static planner cannot estimate, so without the hint this equi-join
    # planned as sort-merge — sorting the 11.5M-row band table on both
    # sides for nothing (the downstream collect_list needs only the hash
    # distribution, which it reuses from the join either way).  SHUFFLE_HASH
    # builds the per-partition hash map on the bucket-key side: O(#buckets /
    # shuffle partitions) rows per map, scale-safe, and AQE skew handling
    # still applies (r06; guide §3.1 "pick the strategy deliberately").
    buckets = (
        b.join(sizes.select("band_id", "band_hash").hint("shuffle_hash"),
               ["band_id", "band_hash"])
        .groupBy("band_id", "band_hash")
        .agg(F.collect_list(id_col).alias("_ids"))
    )
    # all (i < j) position pairs of each bucket, JVM-side, no join:
    # posexplode picks the left element, slice takes everything after it
    pairs = (
        buckets.select(F.col("_ids"), F.posexplode("_ids").alias("_i", "_a"))
        .select(
            F.col("_a"),
            F.explode(F.slice(F.col("_ids"), F.col("_i") + F.lit(2),
                              F.size("_ids"))).alias("_b"),
        )
        .select(
            F.least("_a", "_b").alias("id_a"),
            F.greatest("_a", "_b").alias("id_b"),
        )
    )
    if distinct:
        pairs = pairs.distinct()
    if with_dropped:
        return pairs, dropped
    return pairs


def lsh_dropped_buckets(
    signatures: DataFrame, cfg: SketchConfig, id_col: str = "conv_id",
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """(band_id, band_hash, n_docs) of the buckets the cap WOULD drop — no
    silent truncation: the dedup pipeline materializes this as a lineage
    table so a capped run reports exactly which boilerplate buckets were
    excluded (their exact dups are still caught by the digest fast path)."""
    b = band_hashes(signatures, cfg, id_col)
    sizes = b.groupBy("band_id", "band_hash").agg(F.count("*").alias("n_docs"))
    if max_bucket_size is None:
        return sizes.limit(0)
    return sizes.where(F.col("n_docs") > max_bucket_size)


def simhash_filter(pairs_with_simhash: DataFrame, max_hamming: int = 16) -> DataFrame:
    """Secondary near-dup prefilter: keep pairs whose 64-bit SimHashes are
    within ``max_hamming`` bits.  Expects columns simhash_a / simhash_b."""
    dist = F.bit_count(F.expr("simhash_a ^ simhash_b"))
    return pairs_with_simhash.where(dist <= F.lit(max_hamming))


def text_digest(text_col):
    """THE corpus text-digest expression (xxhash64 over the raw text).

    Contract function: the StageStore ``digests`` probe table
    (operators/dedup.py), the delta's fresh-batch digests and legacy-store
    backfill (operators/delta.py), and the exact-dup fallback below must
    agree bit-for-bit — a divergence would silently unlink exact duplicates
    across old/new documents.  Change it here or nowhere."""
    return F.xxhash64(text_col)


def exact_dup_pairs(
    conv_text: DataFrame, id_col: str = "conv_id", text_col: str = "text",
    digests: DataFrame | None = None,
) -> DataFrame:
    """Exact-duplicate fast path: group by text hash, pair everything with the
    group's min id (star pairs, linear not quadratic in group size).

    ``digests`` short-circuits the hashing with a precomputed (id, digest)
    table (8 B/doc — the checkpointed digests stage) so the text column is
    never rescanned."""
    if digests is not None:
        h = digests.select(F.col(id_col), F.col("digest").alias("_h"))
    else:
        h = conv_text.select(F.col(id_col), text_digest(F.col(text_col)).alias("_h"))
    mins = h.groupBy("_h").agg(F.min(id_col).alias("id_a"), F.count("*").alias("_n"))
    return (
        h.join(mins.where(F.col("_n") > 1), "_h")
        .where(F.col(id_col) != F.col("id_a"))
        .select("id_a", F.col(id_col).alias("id_b"))
    )
