"""Candidate-pair verification: exact Jaccard on minimizer sets.

Reference semantics J3/J4 (``jaccard_by_kmers`` / ``jaccard_by_minimizers``,
``jaccard_correction_test.py:786-852``) as pure DataFrame expressions:
I = |array_intersect|, U = |A| + |B| − I, J = I/U (0 when U = 0).  Stays
entirely JVM-side (whole-stage codegen) — no Python in the verify hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def attach_pair_columns(
    pairs: DataFrame, per_doc: DataFrame, cols: list[str], id_col: str = "conv_id"
) -> DataFrame:
    """Join per-doc columns onto (id_a, id_b) pairs as <col>_a / <col>_b."""
    a = per_doc.select(F.col(id_col).alias("id_a"), *[F.col(c).alias(f"{c}_a") for c in cols])
    b = per_doc.select(F.col(id_col).alias("id_b"), *[F.col(c).alias(f"{c}_b") for c in cols])
    return pairs.join(a, "id_a").join(b, "id_b")


def attach_pair_columns_zip(
    pairs: DataFrame, per_doc: DataFrame, cols: list[str], id_col: str = "conv_id"
) -> DataFrame:
    """attach_pair_columns through ONE payload exchange instead of three.

    The join form ships the per-doc payload across three exchanges when the
    per-doc table is too big to broadcast: the a-side projection, the b-side
    projection, and the pairs⋈a intermediate re-shuffled by id_b (measured
    2.6 GB of exchanged array payload for a 6 MB pair table at the 2.9M-turn
    transcripts shape).  This form explodes each pair into two narrow
    (doc id, pair key, side) rows, joins the per-doc table ONCE (the narrow
    side broadcasts under AQE when small, and even shuffled it is ~24 B/row),
    and reassembles both sides with a single hash aggregation — the payload
    crosses exactly one exchange, as first(side-0)/first(side-1) state
    (guide §2.3 "shuffle fewer bytes" / §2.4 "remove shuffles outright").

    PRECONDITIONS (why this is not the default): ``pairs`` rows must be
    UNIQUE per (id_a, id_b) — duplicate pair rows would collapse into one
    output row, where the join form preserves multiplicity — and the
    attached payloads must be non-null (inner-join drop of ids absent from
    ``per_doc`` is reproduced by the IS NOT NULL filters, which cannot
    distinguish a null payload from a missing doc).  Both hold for every
    dedup verify call (pairs are deduplicated, sketch columns are
    non-nullable arrays/longs).  Output rows and schema are identical to
    attach_pair_columns up to row order.
    """
    doc = F.col("_k.doc")
    sides = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("id_a").alias("doc"), F.lit(0).alias("side")),
                F.struct(F.col("id_b").alias("doc"), F.lit(1).alias("side")),
            )
        ).alias("_k"),
        "id_a",
        "id_b",
    ).select("id_a", "id_b", doc.alias("_doc"), F.col("_k.side").alias("_side"))
    payload = per_doc.select(F.col(id_col).alias("_doc"), *cols)
    joined = sides.join(payload, "_doc")
    # first(array) aggregation buffers are not hash-able, so the reassembly
    # plans as SortAggregate.  Establishing the pair-key distribution with
    # an explicit repartition BEFORE the groupBy makes partial and final
    # aggregate run back-to-back in the post-exchange stage: the payload
    # rows are sorted ONCE (the final inherits the partial's output order)
    # instead of sorted before the exchange AND re-sorted after it — the
    # exchange destroys ordering, and the pre-exchange partial combined
    # almost nothing anyway (measured 720k -> 711k rows for ~1 GB sorted
    # twice at the 2.9M-turn shape).  Explicit N keeps the CPU-bound
    # aggregation from being AQE-coalesced to byte-sized (= too few) tasks.
    spark = pairs.sparkSession
    joined = joined.repartition(
        spark.sparkContext.defaultParallelism * 4, "id_a", "id_b"
    )
    agg = [
        F.first(
            F.when(F.col("_side") == s, F.col(c)), ignorenulls=True
        ).alias(f"{c}_{t}")
        for c in cols
        for s, t in ((0, "a"), (1, "b"))
    ]
    out = joined.groupBy("id_a", "id_b").agg(*agg)
    cond = None
    for c in cols:
        for t in ("a", "b"):
            nn = F.col(f"{c}_{t}").isNotNull()
            cond = nn if cond is None else (cond & nn)
    return out.where(cond)


def signature_estimate(
    candidates: DataFrame,
    signatures: DataFrame,
    id_col: str = "conv_id",
    sig_col: str = "minhash",
) -> DataFrame:
    """(id_a, id_b, j_sig): MinHash agreement fraction per candidate pair.

    The cheap pre-verify: signatures are num_perm longs (~1KB) vs full
    minimizer arrays (~10x more), so estimating J from slot agreement first
    and only shipping arrays for plausible pairs cuts the verify shuffle.
    std(j_sig) = sqrt(J(1-J)/num_perm) ≈ 0.044 at 128 perms.  NOTE: j_sig
    estimates the SHINGLE-set Jaccard while the accept test runs on the
    minimizer-set Jaccard, which is positively biased vs the true Jaccard
    (the very bias correction.py quantifies) — so the filter margin must
    budget for sampling noise AND that bias; see verify_pairs_staged.
    """
    joined = attach_pair_columns(candidates, signatures, [sig_col], id_col)
    a, b = f"{sig_col}_a", f"{sig_col}_b"
    agree = F.size(
        F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda eq: eq)
    )
    return joined.select(
        "id_a", "id_b", (agree / F.size(a)).alias("j_sig")
    )


def verify_pairs_staged(
    candidates: DataFrame,
    sketches: DataFrame,
    threshold: float,
    margin: float = 0.2,
    id_col: str = "conv_id",
    set_col: str = "minimizers",
    sig_col: str = "minhash",
    size_col: str = "n_shingles",
    small_doc_bypass: int = 1024,
    min_score: float | None = None,
    attach: str = "join",
) -> DataFrame:
    """Two-stage verify: signature-estimate filter, then exact minimizer
    Jaccard on the survivors.  Output schema == verify_pairs (survivors
    only); final accept decisions remain exact.

    APPROXIMATE, not provably recall-safe: the default ``margin`` (0.25 via
    DedupConfig) budgets ~4 sigma of MinHash sampling noise (0.18 at
    num_perm=128) PLUS an allowance for the winnowed-minimizer estimator's
    positive bias — j_sig tracks the shingle Jaccard while the accept test
    uses the minimizer Jaccard, which sits a few percent above it (that gap
    is exactly what correction.py's Bias statistic measures; it grows with
    w/L).  A borderline pair whose minimizer bias exceeds the allowance can
    still be dropped; use plain verify_pairs when exactness of the candidate
    set matters more than the ~10x verify-shuffle saving.

    The sigma bound on j_sig also assumes (near-)independent signature
    slots; densified-OPH slots are correlated when a document has few
    distinct fingerprints (measured std ~2x the binomial bound at ~20
    fingerprints).  Pairs where either side has fewer than
    ``small_doc_bypass`` shingles therefore skip the prefilter and go
    straight to exact verification — they are exactly the pairs where the
    prefilter saves nothing anyway.  Set ``small_doc_bypass=0`` to disable
    (safe for the seeded scheme).
    """
    use_bypass = bool(small_doc_bypass) and size_col in sketches.columns
    cols = [sig_col, size_col] if use_bypass else [sig_col]
    _attach = attach_pair_columns_zip if attach == "zip" else attach_pair_columns
    joined = _attach(
        candidates, sketches.select(id_col, *cols), cols, id_col
    )
    a, b = f"{sig_col}_a", f"{sig_col}_b"
    agree = F.size(F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda eq: eq))
    keep = (agree / F.size(a)) >= F.lit(max(0.0, threshold - margin))
    if use_bypass:
        keep = keep | (
            F.least(F.col(f"{size_col}_a"), F.col(f"{size_col}_b"))
            < F.lit(small_doc_bypass)
        )
    plausible = joined.where(keep)
    return verify_pairs(
        plausible.select("id_a", "id_b"), sketches.select(id_col, set_col),
        id_col, set_col, min_score=min_score, attach=attach,
    )


def verify_pairs(
    candidates: DataFrame,
    sketches: DataFrame,
    id_col: str = "conv_id",
    set_col: str = "minimizers",
    min_score: float | None = None,
    attach: str = "join",
) -> DataFrame:
    """(id_a, id_b, i_mini, u_mini, j_mini) for each candidate pair.

    Minimizer VALUES form the comparison set (positions ignored), matching
    ``jaccard_by_minimizers``: set-of-values Jaccard, zero union → J = 0.

    ``min_score`` is an EXACT accept-side pruning gate for callers that only
    consume pairs with j_mini >= min_score (the dedup clusters path): since
    I <= min(|A|,|B|) and U >= max(|A|,|B|), a pair with
    min(|A|,|B|) < min_score * max(|A|,|B|) has j_mini strictly below
    min_score and is dropped BEFORE the array_intersect — two int compares
    instead of a hash-set build per pruned pair (r06, guide §1.2 "don't
    compute things you throw away").  Pairs at exactly the ratio bound are
    kept (j could equal min_score).  Empty-set pairs (|A|=|B|=0) pass the
    gate and score 0 via the zero-union convention, same as before.  With
    ``min_score=None`` every candidate is scored (the ``verified`` output
    contract).
    """
    sets = sketches.select(
        F.col(id_col), F.array_distinct(F.col(set_col)).alias("_set")
    )
    _attach = attach_pair_columns_zip if attach == "zip" else attach_pair_columns
    joined = _attach(candidates, sets, ["_set"], id_col)
    if min_score is not None:
        joined = joined.where(
            F.least(F.size("_set_a"), F.size("_set_b"))
            >= F.lit(float(min_score)) * F.greatest(F.size("_set_a"), F.size("_set_b"))
        )
    i = F.size(F.array_intersect("_set_a", "_set_b")).cast("long")
    u = (F.size("_set_a") + F.size("_set_b")).cast("long") - i
    return joined.select(
        "id_a",
        "id_b",
        i.alias("i_mini"),
        u.alias("u_mini"),
        F.when(u == 0, F.lit(0.0)).otherwise(i / u).alias("j_mini"),
    )
