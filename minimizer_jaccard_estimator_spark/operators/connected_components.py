"""Iterative large-star / small-star connected components on the pair graph.

Driver-side loop of DataFrame operations (Kiveris et al., "Connected
Components in MapReduce and Beyond") — each iteration is two shuffles on the
edge set; ``localCheckpoint`` per iteration truncates lineage so plans stay
bounded regardless of iteration count.  Converges in O(log^2 n) iterations;
the pair graphs produced by dedup (near-clique clusters) converge in 2-4.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _large_star(edges: DataFrame) -> DataFrame:
    # neighbors in both directions; connect every strictly-larger neighbor to
    # the min of the closed neighborhood
    nbrs = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = nbrs.groupBy("src").agg(F.min("dst").alias("mn"))
    m = m.select("src", F.least("src", "mn").alias("m"))
    return (
        nbrs.join(m, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # orient u -> v with u > v; connect all smaller neighbors (and u) to min
    e = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    m = e.groupBy("src").agg(F.min("dst").alias("m"))
    out = (
        e.join(m, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .union(m.select(F.col("src"), F.col("m").alias("dst")))
    )
    return out.where(F.col("src") != F.col("dst")).distinct()


def _signature(edges: DataFrame) -> int:
    row = edges.select(
        F.count("*").alias("n"),
        F.coalesce(  # decimal sum: ANSI-safe (no long overflow) order-free digest
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")), F.lit(0)
        ).cast("string").alias("h"),
    ).collect()[0]
    return hash((row["n"], row["h"]))


def _driver_union_find(edge_rows) -> list[tuple]:
    """Union-find with path compression; labels every node with the MIN id of
    its component (same contract as the distributed fixpoint)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for src, dst in edge_rows:
        ra, rb = find(src), find(dst)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {v for e in edge_rows for v in e}
    return [(x, find(x)) for x in nodes]


def _driver_components_np(src, dst):
    """Vectorized min-label components over driver-collected edge arrays —
    identical labels to :func:`_driver_union_find` (min id per component;
    np.unique sorts, so min index == min id for strings and ints alike), at
    numpy speed instead of ~1-2 us/dict-op Python (measured ~3 s -> ~0.1 s
    on the 480k-edge transcript graph, r06).

    Hook-and-compress label propagation: scatter the min of each edge's two
    current labels onto the max (np.minimum.at), pointer-double to a fixed
    point, repeat until no label moves.  Labels only ever decrease, so the
    fixed point is the component-min relabeling.
    """
    import numpy as np

    both = np.concatenate([np.asarray(src), np.asarray(dst)])
    nodes, inv = np.unique(both, return_inverse=True)
    a, b = inv[: len(src)], inv[len(src):]
    parent = np.arange(nodes.shape[0], dtype=np.int64)
    while True:
        before = parent.copy()
        lo = np.minimum(parent[a], parent[b])
        np.minimum.at(parent, a, lo)
        np.minimum.at(parent, b, lo)
        while True:
            pp = parent[parent]
            if np.array_equal(pp, parent):
                break
            parent = pp
        if np.array_equal(parent, before):
            break
    # fixed point: no edge can lower either endpoint => parent[a]==parent[b]
    # on every edge, and a component's shared label can only be its min index
    return nodes, nodes[parent]


def connected_components(
    pairs: DataFrame,
    id_col_a: str = "id_a",
    id_col_b: str = "id_b",
    max_iterations: int = 20,
    driver_threshold: int | None = 500_000,
) -> DataFrame:
    """(conv_id, cluster_id): every node of the pair graph labeled with the
    min id of its component.  Nodes absent from ``pairs`` are not returned
    (callers union isolated ids as their own cluster).

    Adaptive execution: below ``driver_threshold`` edges the component
    computation runs as one driver-side union-find pass (the iterative
    large/small-star loop costs ~6 shuffle stages PER iteration in fixed
    scheduling latency — at millions of edges that latency is noise, at
    thousands it dominates).  The distributed fixpoint remains the path for
    big graphs and is equivalence-tested against the union-find on every CI
    run; ``driver_threshold=0`` forces it.  The default threshold is sized
    for the session factory's 8g driver (500k collected edges ≈ low hundreds
    of MB of Row/dict state); raise it only alongside driver memory."""
    edges = pairs.select(
        F.col(id_col_a).alias("src"), F.col(id_col_b).alias("dst")
    ).where(F.col("src") != F.col("dst")).distinct()

    if driver_threshold:
        # ONE action sizes the edge set AND fetches it: limit(threshold+1)
        # returns <= threshold rows iff the edge count is <= threshold, in
        # which case those rows ARE the complete edge set.  The previous
        # count-then-collect pair re-executed the entire upstream candidate/
        # verify chain twice — each action is a fresh AdaptiveSparkPlan
        # query, so nothing is shared between them (measured ~2x the full
        # dedup wall at sf1.0, r06).  Oversized graphs pay one truncated
        # collect (<= threshold+1 narrow rows) and fall through to the
        # distributed fixpoint, same as the old count probe did.
        # toPandas rides the Arrow path (sub-second at 500k rows vs several
        # seconds of Row materialization via collect)
        head = edges.limit(driver_threshold + 1).toPandas()
    else:
        head = None
    if head is not None and len(head) <= driver_threshold:
        spark = pairs.sparkSession
        schema = edges.select(
            F.col("src").alias("conv_id"), F.col("dst").alias("cluster_id")
        ).schema
        if len(head) == 0:
            return F.broadcast(spark.createDataFrame([], schema))
        nodes, labels = _driver_components_np(
            head["src"].to_numpy(), head["dst"].to_numpy()
        )
        import pandas as pd

        labeled = pd.DataFrame({"conv_id": nodes, "cluster_id": labels})
        # broadcast hint: this result is driver-bounded (<= driver_threshold
        # edges, already collected), and the caller's next step is a left
        # join against the corpus id list — a shuffle there would be a pure
        # scale-flat stage for data that provably fits on every executor
        return F.broadcast(spark.createDataFrame(labeled, schema))

    # iterative path: truncate lineage per iteration (plans stay bounded)
    edges = edges.localCheckpoint()
    prev_sig = None
    converged = False
    for _ in range(max_iterations):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        sig = _signature(edges)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # returning would silently mislabel components (the node->min
        # assumption below only holds at the fixpoint)
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations; raise max_iterations (expected O(log^2 n))"
        )

    # after convergence every edge points node -> component min
    members = edges.select(F.col("src").alias("conv_id"), F.col("dst").alias("cluster_id"))
    roots = edges.select(F.col("dst").alias("conv_id"), F.col("dst").alias("cluster_id"))
    return members.union(roots).groupBy("conv_id").agg(F.min("cluster_id").alias("cluster_id"))
