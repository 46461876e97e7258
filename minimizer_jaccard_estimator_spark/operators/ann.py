"""Approximate nearest-neighbor search + near-dup pairs over embedding columns.

Three paths over an ``(vec_id long, embedding array<float>)`` table:

- **brute force** (the oracle): exact cosine top-k via JVM higher-order
  array functions — correct at any scale that can afford a full scan
  (it broadcasts only the query).
- **IVF** (the scale path): coarse k-means (pyspark.ml) partitions vectors
  into cells; a query probes the ``nprobe`` nearest cells and brute-forces
  only those.  Probing ALL cells is exactly brute force (tested), so the
  same DuckDB oracle covers the operator; at ``nprobe << n_cells`` the scan
  touches ~nprobe/n_cells of the corpus.  At cluster scale the assignment
  table is written partitioned by ``cell`` so probes become partition-pruned
  scans.
- **random-hyperplane LSH near-dup** (the all-pairs scale path): seeded
  Gaussian hyperplanes sign-hash each vector into ``n_tables`` bucket keys
  (one Arrow matmul per batch); candidate pairs come from ONE
  ``groupBy(bucket)`` with in-JVM pair expansion (never a crossJoin), and an
  exact JVM-side cosine verifies every candidate.  Recall at threshold θ is
  ``1-(1-p^n_planes)^n_tables`` with ``p = 1 - arccos(θ)/π`` — the defaults
  give ≥0.99 at θ=0.99 (recall-tested vs brute force on planted near-dups).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, LongType


def _cosine(v_col: str, q: list[float]):
    qn = float(np.linalg.norm(np.array(q, dtype=np.float64)))
    qlit = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(v_col, qlit, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
    )
    nv = F.sqrt(
        F.aggregate(F.transform(v_col, lambda a: a * a), F.lit(0.0), lambda s, x: s + x)
    )
    return dot / (nv * F.lit(qn))


def brute_force_topk(
    emb: DataFrame, query: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (vec_id, cosine), score desc, id asc tiebreak."""
    v = F.col(vec_col).cast("array<double>")
    return (
        emb.select(F.col(id_col), v.alias("_v"))
        .select(id_col, _cosine("_v", query).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


@dataclass
class IvfIndex:
    centroids: np.ndarray  # (n_cells, dim) float64
    assignments: DataFrame  # (vec_id, cell int, embedding)


def build_ivf(
    emb: DataFrame, n_cells: int = 16, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> IvfIndex:
    """Coarse k-means index (pyspark.ml KMeans, fixed seed)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.select(
        F.col(id_col), F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_features"),
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="_features", predictionCol="cell")
    model = km.fit(feats)
    assigned = model.transform(feats).select(id_col, vec_col, "cell")
    centroids = np.array([np.asarray(c) for c in model.clusterCenters()], dtype=np.float64)
    return IvfIndex(centroids=centroids, assignments=assigned)


def _hyperplane_bucket_udf(dim: int, n_planes: int, n_tables: int, seed: int):
    """vec -> array<long> of n_tables bucket keys: sign-bit pattern of the
    vector against table-specific seeded Gaussian hyperplanes, packed into an
    int (bucket key = table_idx * 2^n_planes + bits so tables never collide).
    One numpy matmul per Arrow batch — no per-row Python."""
    rng = np.random.default_rng(seed)
    # (dim, n_tables*n_planes) — real Gaussian hyperplanes, not a sign
    # heuristic: the collision probability argument needs spherical symmetry
    planes = rng.standard_normal((dim, n_tables * n_planes))
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    def run(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in batches:
            m = np.array(vecs.tolist(), dtype=np.float64)  # (batch, dim)
            if m.size == 0:
                yield pd.Series([], dtype=object)
                continue
            bits = (m @ planes) > 0  # (batch, tables*planes)
            bits = bits.reshape(m.shape[0], n_tables, n_planes)
            keys = bits @ weights  # (batch, n_tables)
            keys += (np.arange(n_tables, dtype=np.int64) << np.int64(n_planes))[None, :]
            yield pd.Series(list(keys))

    return F.pandas_udf(run, ArrayType(LongType()))


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.99,
    n_planes: int = 12,
    n_tables: int = 8,
    seed: int = 42,
    max_bucket_size: int | None = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate embedding pairs (id_a < id_b, cosine >= threshold)
    WITHOUT an all-pairs join — the scale path the crossJoin oracle verifies.

    Stages: normalize -> hyperplane bucket keys (Arrow matmul) -> explode
    table keys -> ONE groupBy(bucket) with bounded in-JVM pair expansion
    (same shape as the text LSH) -> exact cosine verify on the joined unit
    vectors.  Defaults give recall ≈ 1-(1-0.955^12)^8 ≈ 0.999 at θ=0.99;
    ``max_bucket_size`` bounds degenerate buckets (e.g. the all-zero
    direction) explicitly.

    Dimension contract: only vectors of exactly ``dim`` elements
    participate; null/ragged rows are excluded (they carry no usable
    direction, and one ragged Arrow batch would otherwise fail the job).
    ``dim=None`` infers the MODAL size from a one-pass histogram —
    deterministic, and robust to a corrupt leading row, unlike probing the
    (partition-order-dependent) first row.  Pass ``dim`` explicitly when
    the table's dimension is known.
    """
    if dim is None:
        sizes = (
            emb.where(F.col(vec_col).isNotNull())
            .groupBy(F.size(vec_col).alias("_d")).count().collect()
        )
        if not sizes:
            # empty (or all-null) input: zero pairs, not a TypeError — keep
            # the output schema so downstream unions/writes still work
            id_type = emb.schema[id_col].dataType.simpleString()
            return emb.sparkSession.createDataFrame(
                [], f"id_a {id_type}, id_b {id_type}, cosine double"
            )
        dim = max(sizes, key=lambda r: (r["count"], -r["_d"]))["_d"]
    v = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0),
                              lambda s, x: s + x))
    # rows with a null or wrong-dimension vector are excluded from pairing
    # (a single ragged batch would otherwise fail the whole job inside the
    # bucket UDF's np.array(...) on inhomogeneous input)
    unit = emb.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == F.lit(dim))
    ).select(
        F.col(id_col),
        F.transform(v, lambda x: x / norm).alias("_u"),
    )
    # `unit` feeds FOUR consumers (bucket keys, the bucket-size join, and
    # both verify sides); without a persist each one re-runs the full
    # lineage below it — for media features that is the per-row extraction
    # UDF, re-executed per consumer (r06, guide §5 "reused AND expensive to
    # recompute"; measured media_neardup 8.6 -> 2.9 s at sf0.1).  Narrow
    # (id, unit-vector) rows, MEMORY_AND_DISK; cached for the session on
    # the one-shot query path, same contract as substring_candidate_pairs.
    unit = unit.persist()
    keys = _hyperplane_bucket_udf(dim, n_planes, n_tables, seed)(F.col("_u"))
    b = unit.select(id_col, F.explode(keys).alias("bucket"))

    # size buckets BEFORE collecting id lists (map-side-combined count rows,
    # never a degenerate bucket's full membership in one aggregation buffer);
    # the collect_list then reuses the join's bucket partitioning
    sizes = b.groupBy("bucket").agg(F.count("*").alias("_n")).where(F.col("_n") >= 2)
    if max_bucket_size is not None:
        sizes = sizes.where(F.col("_n") <= max_bucket_size)
    buckets = (
        b.join(sizes.select("bucket"), "bucket")
        .groupBy("bucket").agg(F.collect_list(id_col).alias("_ids"))
    )
    pairs = (
        buckets.select(F.col("_ids"), F.posexplode("_ids").alias("_i", "_a"))
        .select(
            F.col("_a"),
            F.explode(F.slice(F.col("_ids"), F.col("_i") + F.lit(2),
                              F.size("_ids"))).alias("_b"),
        )
        .select(F.least("_a", "_b").alias("id_a"), F.greatest("_a", "_b").alias("id_b"))
        .distinct()
    )
    ua = unit.select(F.col(id_col).alias("id_a"), F.col("_u").alias("_ua"))
    ub = unit.select(F.col(id_col).alias("id_b"), F.col("_u").alias("_ub"))
    dot = F.aggregate(F.zip_with("_ua", "_ub", lambda x, y: x * y), F.lit(0.0),
                      lambda s, x: s + x)
    return (
        pairs.join(ua, "id_a").join(ub, "id_b")
        .select("id_a", "id_b", dot.alias("cosine"))
        .where(F.col("cosine") >= F.lit(threshold))
    )


def ivf_topk(
    index: IvfIndex, query: list[float], k: int = 10, nprobe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe nearest cells (by centroid L2 distance) and
    brute-force cosine inside them.  nprobe >= n_cells == exact search."""
    q = np.array(query, dtype=np.float64)
    d = np.linalg.norm(index.centroids - q[None, :], axis=1)
    cells = [int(c) for c in np.argsort(d)[: max(1, nprobe)]]
    cand = index.assignments.where(F.col("cell").isin(cells))
    return brute_force_topk(cand, query, k, id_col, vec_col)
