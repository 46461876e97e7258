"""Multimodal binary-column plumbing (stubbed decode, real Spark shapes)."""

from __future__ import annotations

import hashlib

import pytest

import pyspark.sql.functions as F

from minimizer_jaccard_estimator_spark.operators.multimodal import (
    MEDIA_KINDS,
    exact_media_dup_pairs,
    extract_features,
    frame_sample,
    media_neardup_pairs,
    synthetic_media,
    _stub_features,
)


def _docs(spark, n=30):
    rows = [(i, f"payload {i % 10} " * (20 + i % 5), "en", "web") for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_extract_features_schema_and_determinism(spark):
    media = synthetic_media(_docs(spark))
    feats = extract_features(media, dim=32)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert set(r["kind"] for r in rows.values()) == set(MEDIA_KINDS)
    # deterministic across runs
    rows2 = {r["media_id"]: r for r in extract_features(media, dim=32).collect()}
    for mid, r in rows.items():
        assert rows2[mid]["features"] == r["features"]
        assert len(r["features"]) == 32
        assert rows2[mid]["digest"] == r["digest"]
    # digest matches local sha256 of the payload
    payload = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    for mid, r in rows.items():
        assert r["digest"] == hashlib.sha256(payload[mid]).hexdigest()
        assert r["n_bytes"] == len(payload[mid])


def test_extract_features_real_decoder_is_stubbed(spark):
    media = synthetic_media(_docs(spark, 3))
    with pytest.raises(NotImplementedError):
        extract_features(media, decoder="pillow").collect()


def test_stub_features_unit_norm_and_empty():
    import numpy as np

    v = _stub_features(b"hello world" * 100, 64)
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
    z = _stub_features(b"", 64)
    assert (z == 0).all()


def test_frame_sample_shapes(spark):
    media = synthetic_media(_docs(spark, 12))
    frames = frame_sample(media, frame_bytes=64, every_n=2).collect()
    assert frames, "video rows must yield frames"
    by_media = {}
    for r in frames:
        assert len(bytes(r["frame"])) <= 64
        assert r["frame_idx"] % 2 == 0
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    # only 'video' kind media produce frames
    kinds = {r["media_id"]: r["kind"] for r in media.collect()}
    assert all(kinds[m] == "video" for m in by_media)


def test_exact_and_near_dup_pairs(spark):
    # docs repeat every 10 ids => exact binary dup groups of 3
    media = synthetic_media(_docs(spark, 30))
    feats = extract_features(media, dim=32).cache()
    exact = exact_media_dup_pairs(feats).collect()
    got = {(r.id_a, r.id_b) for r in exact}
    # id i and i+10 share text when (20 + i%5) matches => i%10 equal AND i%5 equal
    assert ("m0", "m10") in got or ("m0", "m20") in got
    near = media_neardup_pairs(feats, threshold=0.999999).collect()
    near_ids = {(r.id_a, r.id_b) for r in near}
    # exact dups are cosine 1.0 => must appear in the near-dup pairs too
    assert got <= near_ids
    for r in near:
        assert r.cosine >= 0.999


def test_media_neardup_recall_vs_brute_force(spark):
    """media_neardup_pairs (delegating to the Gaussian-hyperplane LSH) must
    recover every brute-force cosine>=threshold pair of the stub features —
    the recall evidence for the one-implementation routing (VERDICT r02 #4)."""
    import pyspark.sql.functions as F

    feats = extract_features(synthetic_media(_docs(spark, 60)), dim=32).cache()
    thr = 0.95
    # brute-force truth: all-pairs cosine on the (unit-norm) stub features
    a = feats.select(F.col("media_id").alias("id_a"), F.col("features").alias("fa"))
    b = feats.select(F.col("media_id").alias("id_b"), F.col("features").alias("fb"))
    dot = F.aggregate(F.zip_with("fa", "fb", lambda x, y: x * y), F.lit(0.0),
                      lambda s, x: s + x)
    truth = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot.alias("cosine"))
        .where(F.col("cosine") >= thr).collect()
    }
    assert truth, "fixture must contain planted near-dups"
    got = {(r.id_a, r.id_b)
           for r in media_neardup_pairs(feats, threshold=thr).collect()}
    # exact-copy features collide in every table (p=1); sub-1.0 pairs rely on
    # the 12x8 hyperplane design => demand full recovery on this fixture
    assert truth <= got, f"missing pairs: {truth - got}"
    # and no false accepts below the threshold (exact verify)
    assert got <= truth
