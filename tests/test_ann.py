"""IVF ANN: exactness at full probe, recall at partial probe."""

from __future__ import annotations

from minimizer_jaccard_estimator_spark.operators.ann import (
    brute_force_topk,
    build_ivf,
    ivf_topk,
)


def _emb(spark, sf="/root/testdata/sf0.01"):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def test_ivf_full_probe_equals_brute_force(spark):
    emb = _emb(spark)
    query = emb.where("vec_id = 0").head()["embedding"]
    query = [float(x) for x in query]
    corpus = emb.where("vec_id <> 0")
    bf = brute_force_topk(corpus, query, k=10).collect()
    idx = build_ivf(corpus, n_cells=8, seed=42)
    full = ivf_topk(idx, query, k=10, nprobe=8).collect()
    assert [(r.vec_id, round(r.cosine, 9)) for r in full] == [
        (r.vec_id, round(r.cosine, 9)) for r in bf
    ]


def test_ivf_partial_probe_recall(spark):
    emb = _emb(spark)
    query = emb.where("vec_id = 1").head()["embedding"]
    query = [float(x) for x in query]
    corpus = emb.where("vec_id <> 1")
    truth = {r.vec_id for r in brute_force_topk(corpus, query, k=10).collect()}
    idx = build_ivf(corpus, n_cells=8, seed=42)
    got = {r.vec_id for r in ivf_topk(idx, query, k=10, nprobe=4).collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.7, recall
    # candidate scan shrinks: probed cells hold a strict subset of the corpus
    probed = ivf_topk(idx, query, k=10**6, nprobe=1).count()
    assert probed < corpus.count()
