"""Approximate nearest-neighbor search over embedding columns.

Two paths over an ``(vec_id long, embedding array<float>)`` table:

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
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


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
