"""Structured Streaming assembly/sketch: streaming == batch invariant.

Turns arrive across multiple files (simulating out-of-order, multi-batch
arrival); after the stream drains, the latest emission per conversation must
equal the batch pipeline's assemble+sketch output on the same rows.
"""

from __future__ import annotations


from minimizer_jaccard_estimator_spark.functions.sketch import SketchConfig, add_full_sketch
from minimizer_jaccard_estimator_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    assemble_conversations,
    synthetic_transcripts,
)

CFG = SketchConfig(k=6, w=5, num_perm=16, lsh_bands=8)



def test_stream_matches_batch(spark, tmp_path):
    from minimizer_jaccard_estimator_spark.streaming.sketch_stream import (
        latest_sketches,
        start_sketch_stream,
    )

    src = str(tmp_path / "turns_in")
    sink = str(tmp_path / "sketch_out")
    ckpt = str(tmp_path / "ckpt")

    turns = synthetic_transcripts(spark, n_base=12, dup_factor=1, seed=7).cache()
    # split the corpus into 3 arrival waves; shuffle turn order inside waves
    # (turn_idx % 3 != arrival order => out-of-order arrival per conv)
    for wave in range(3):
        part = turns.where(turns.turn_idx % 3 == wave)
        part.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = start_sketch_stream(spark, stream, CFG, sink, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["conv_id"]: r for r in latest_sketches(spark, sink).collect()}

    batch = add_full_sketch(assemble_conversations(turns), CFG).drop("text")
    want = {r["conv_id"]: r for r in batch.collect()}

    assert got.keys() == want.keys()
    for cid, wr in want.items():
        gr = got[cid]
        assert gr["n_turns"] == wr["n_turns"], cid
        assert gr["text_len"] == wr["text_len"], cid
        for col in ("minimizers", "n_shingles", "n_dups", "minhash", "simhash"):
            assert gr[col] == wr[col], (cid, col)



def test_stream_incremental_updates_grow(spark, tmp_path):
    """A conversation's sketch refreshes as more of its turns arrive."""
    import pyspark.sql.functions as F

    from minimizer_jaccard_estimator_spark.streaming.sketch_stream import (
        start_sketch_stream,
    )

    src = str(tmp_path / "turns_in")
    sink = str(tmp_path / "sketch_out")
    ckpt = str(tmp_path / "ckpt")

    rows1 = [("c1", 0, "user", "alpha beta gamma delta epsilon", None, None)]
    rows2 = [("c1", 1, "assistant", "zeta eta theta iota kappa lambda", None, None)]
    spark.createDataFrame(rows1, TRANSCRIPT_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows2, TRANSCRIPT_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = start_sketch_stream(spark, stream, CFG, sink, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    hist = (
        spark.read.parquet(sink)
        .where(F.col("conv_id") == "c1")
        .orderBy("batch_id")
        .collect()
    )
    assert len(hist) == 2
    assert hist[0]["n_turns"] == 1 and hist[1]["n_turns"] == 2
    assert hist[1]["n_shingles"] > hist[0]["n_shingles"]
