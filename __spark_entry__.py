"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship near-dup clustering query on sf0.001.
``queries()`` exposes one callable per implemented operator from SURVEY.md §2
(plus the training-data-pipeline operators); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible one.  Column names and value
determinism are aligned between both sides (decimal-sum for money, round()
for divisions) so the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from minimizer_jaccard_estimator_spark.functions.sketch import SketchConfig, add_signature, add_sketch
from minimizer_jaccard_estimator_spark.operators.dedup import DedupConfig, run_dedup
from minimizer_jaccard_estimator_spark.operators.lsh import lsh_candidate_pairs
from minimizer_jaccard_estimator_spark.operators.pairwise_analytics import pairwise_report
from minimizer_jaccard_estimator_spark.operators.sliding import sliding_jaccard
from minimizer_jaccard_estimator_spark.operators.verify import verify_pairs

_SKETCH = SketchConfig(k=8, w=10, hash_type="splitmix64", hash_seed=0, num_perm=64, lsh_bands=32)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_as_transcripts(docs: DataFrame) -> DataFrame:
    """documents table viewed as single-turn conversations."""
    return docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: near-dup clustering of the documents corpus at sf0.001."""
    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    res = run_dedup(spark, _docs_as_transcripts(docs), DedupConfig(sketch=_SKETCH))
    sizes = res.clusters.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return res.clusters.join(sizes, "cluster_id").select("conv_id", "cluster_id", "cluster_size")


# ---------------------------------------------------------------------------
# SQL-expressible operators (Spark + DuckDB oracle)
# ---------------------------------------------------------------------------

def q_a1_multiset_count(spark, sf):
    """A1 group-by-key multiset count (+ exact decimal money sum)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_a2_distinct_count(spark, sf):
    """A2 distinct-count per group."""
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n_parts"),
             F.countDistinct("l_suppkey").alias("n_supps"))
        .orderBy("l_returnflag")
    )


def q_a3_duplicate_count(spark, sf):
    """A3 duplicate count: sum(count-1) over key groups (reference
    count_duplicates, jaccard_correction_test.py:770-778)."""
    o = _t(spark, sf, "orders")
    per = o.groupBy("o_custkey").agg(F.count("*").alias("c"))
    return per.agg(
        F.sum(F.col("c") - F.lit(1)).alias("n_dups"),
        F.count("*").alias("n_keys"),
    )


def q_a5_histogram(spark, sf):
    """A5 histogram agg with the reference bucket rule floor((v+d/2)/d)
    (sliding_jaccard.py:683-687), d=5.0, center = bucket*d."""
    li = _t(spark, sf, "lineitem")
    b = F.floor((F.col("l_quantity") + F.lit(2.5)) / F.lit(5.0)).cast("long")
    return (
        li.select(b.alias("bucket"))
        .groupBy("bucket").agg(F.count("*").alias("cnt"))
        .withColumn("center", (F.col("bucket") * F.lit(5.0)).cast("double"))
        .orderBy("bucket")
    )


def q_j1_pair_zip_join(spark, sf):
    """J1 consecutive pairing within one ordered stream (fasta_pairs chunk
    mode, jaccard_correction_test.py:857-895) — production form: range
    repartition + per-partition row numbers + O(#partitions) driver offsets
    (operators/pairing.py).  Size-gated: below 1M rows (all test SFs) the
    single-window form wins — one job instead of four; at scale the ranged
    plan has no SinglePartition exchange (both pytest-asserted)."""
    from minimizer_jaccard_estimator_spark.operators.pairing import (
        consecutive_pairs_ranged,
    )

    o = _t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    pairs = consecutive_pairs_ranged(o, "o_orderkey")
    return (
        pairs.select(
            "pair_id", "key_a", "key_b",
            F.round(F.abs(F.col("o_totalprice_a") - F.col("o_totalprice_b")), 2)
            .alias("price_gap"),
        )
        .orderBy("pair_id")
    )


def q_j3_word_jaccard(spark, sf):
    """J3 set-intersection join: word-set Jaccard of consecutive documents
    (I, U = |A|+|B|-I, J = I/U — jaccard_by_kmers semantics)."""
    d = _t(spark, sf, "documents")
    words = F.array_distinct(F.split("text", " "))
    a = d.select(F.col("doc_id").alias("id_a"), words.alias("wa"))
    b = d.select((F.col("doc_id") - 1).alias("id_a"), words.alias("wb"))
    j = a.join(b, "id_a")
    i = F.size(F.array_intersect("wa", "wb")).cast("long")
    u = (F.size("wa") + F.size("wb")).cast("long") - i
    return j.select(
        "id_a", i.alias("i_words"), u.alias("u_words"),
        F.round(i / u, 6).alias("jaccard"),
    ).orderBy("id_a")


def q_ngram_jaccard(spark, sf):
    """Character 8-gram Jaccard between consecutive documents (n-gram
    near-dup scoring, SQL-expressible shingle path of H1+J3).

    r06 plan: the original a⋈b self-join computed the gram arrays TWICE
    (once per branch) and the planner broadcast the whole right-hand gram
    table (50k × ~292 8-char strings at sf1.0 — a driver-side build of
    hundreds of MB).  This form computes grams ONCE, ships each doc's gram
    set to its two pair keys (doc_id as the A side, doc_id-1 as the B side)
    and reassembles pairs with one hash aggregation — one scan, one
    shuffle, no driver-side broadcast build; doc_id is unique so
    first(ignorenulls) per side is deterministic and the inner-join
    semantics (both sides present) are reproduced by the two IS NOT NULL
    filters.  Result rows are bit-identical to the join form (equality
    A/B-checked at sf0.1/sf1.0, and the DuckDB oracle is unchanged).

    The documents parquet is a few MB, so the scan yields 1-2 input splits —
    but the gram transform behind it is ~0.4 ms/doc (measured 21 CPU-s at
    50k docs running in 2 tasks).  The round-robin repartition spreads that
    compute across the cluster for the cost of re-shuffling the (10x
    smaller) raw text (guide §2.5 input skew / §6 small-files)."""
    d = _t(spark, sf, "documents").where(F.length("text") >= 8)
    d = d.repartition(spark.sparkContext.defaultParallelism)
    grams = F.array_distinct(
        F.expr("transform(sequence(1, length(text) - 7), i -> substring(text, i, 8))")
    )
    g = d.select("doc_id", grams.alias("gs"))
    sides = g.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_id").alias("id_a"), F.lit(0).alias("side")),
                F.struct((F.col("doc_id") - 1).alias("id_a"), F.lit(1).alias("side")),
            )
        ).alias("k"),
        "gs",
    )
    paired = (
        sides.groupBy(F.col("k.id_a").alias("id_a"))
        .agg(
            F.first(F.when(F.col("k.side") == 0, F.col("gs")), ignorenulls=True).alias("ga"),
            F.first(F.when(F.col("k.side") == 1, F.col("gs")), ignorenulls=True).alias("gb"),
        )
        .where(F.col("ga").isNotNull() & F.col("gb").isNotNull())
    )
    # project the intersection size once (the join form re-evaluated
    # array_intersect three times in the output projection)
    sized = paired.select(
        "id_a",
        F.size(F.array_intersect("ga", "gb")).cast("long").alias("i_grams"),
        (F.size("ga") + F.size("gb")).cast("long").alias("_s"),
    )
    u = F.col("_s") - F.col("i_grams")
    return sized.select(
        "id_a", "i_grams", u.alias("u_grams"),
        F.round(F.col("i_grams") / u, 6).alias("jaccard"),
    ).orderBy("id_a")


def q_exact_dedup(spark, sf):
    """Exact dedup: duplicate-text groups, keeper = min doc_id.

    The documents fixture has no natural duplicate texts (a 0-row result
    proves nothing — VERDICT r02 #5), so the query SELF-SEEDS: it unions a
    doc_id+1000000 copy of every 50th document inside the query, and the
    oracle SQL seeds identically, so both engines must recover the same
    planted groups."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    seeded = d.unionByName(
        d.where(F.col("doc_id") % 50 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return (
        seeded.groupBy("text")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
        .where(F.col("n_copies") > 1)
        .select("keeper_id", "n_copies")
        .orderBy("keeper_id")
    )


def q_doc_fingerprint(spark, sf):
    """Document fingerprinting: md5 content fingerprint, distinct count per
    source (portable digest stand-in for the rolling-hash fingerprint)."""
    d = _t(spark, sf, "documents")
    return (
        d.select("source", F.md5(F.col("text")).alias("fp"))
        .groupBy("source")
        .agg(F.countDistinct("fp").alias("n_unique"), F.count("*").alias("n_docs"))
        .orderBy("source")
    )


def q_token_count(spark, sf):
    """Token counting per doc, aggregated per lang (whitespace tokens)."""
    d = _t(spark, sf, "documents")
    toks = F.size(F.split("text", " ")).cast("long")
    return (
        d.select("lang", toks.alias("toks"))
        .groupBy("lang")
        .agg(F.sum("toks").alias("total_tokens"),
             F.count("*").alias("n_docs"),
             F.max("toks").alias("max_tokens"))
        .orderBy("lang")
    )


def q_bpe_token_count(spark, sf):
    """BPE-ish regex tokenization (word pieces + punctuation runs, the
    GPT-2-style pre-tokenizer shape) — token totals per lang."""
    d = _t(spark, sf, "documents")
    toks = F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]+"), 0)).cast("long")
    return (
        d.select("lang", toks.alias("toks"))
        .groupBy("lang")
        .agg(F.sum("toks").alias("total_tokens"),
             F.round(F.avg("toks"), 6).alias("avg_tokens"),
             F.count("*").alias("n_docs"))
        .orderBy("lang")
    )


def q_quality_score(spark, sf):
    """Quality scoring: length, word count, avg word length, stopword ratio."""
    d = _t(spark, sf, "documents")
    n_words = F.size(F.split("text", " ")).cast("long")
    n_chars = F.length("text").cast("long")
    n_the = F.size(F.split("text", " the ")).cast("long") - 1
    return d.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_words.alias("n_words"),
        F.round(n_chars / n_words, 6).alias("avg_word_len"),
        F.round(n_the / n_words, 6).alias("the_ratio"),
    ).orderBy("doc_id")


def q_lang_quality(spark, sf):
    """Language-ID heuristic scoring: per lang, mean 'the'-stopword ratio
    (rounded) — an n-gram language signal aggregated."""
    d = _t(spark, sf, "documents")
    n_words = F.size(F.split("text", " ")).cast("long")
    n_the = F.size(F.split("text", " the ")).cast("long") - 1
    per = d.select("lang", F.round(n_the / n_words, 6).alias("r"))
    return (
        per.groupBy("lang")
        .agg(F.round(F.sum(F.col("r").cast("decimal(18,6)")).cast("double"), 6).alias("sum_ratio"),
             F.count("*").alias("n_docs"))
        .orderBy("lang")
    )


def q_o1_topk(spark, sf):
    """O1/O2 limit + deterministic top-k sort."""
    o = _t(spark, sf, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .limit(10)
    )


def q_join_agg_revenue(spark, sf):
    """Broadcast-dim join + agg: order count and exact decimal revenue per
    nation (customer ⋈ orders ⋈ nation ⋈ region)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_orders"),
             F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"))
        .orderBy("r_name", "n_name")
    )


def q_events_window(spark, sf):
    """Event-time tumbling window agg (streaming-shaped, batch executed):
    hourly counts + exact value sums per event_type."""
    e = _t(spark, sf, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    return (
        e.groupBy(hour.alias("hour"), "event_type")
        .agg(F.count("*").alias("cnt"),
             F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"))
        .orderBy("hour", "event_type")
    )


def q_events_session_window(spark, sf):
    """Session-window aggregation (30-minute inactivity gap) per event_type —
    the streaming stateful-window operator executed in batch; oracle is the
    classic gaps-and-islands SQL."""
    e = _t(spark, sf, "events")
    s = (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"),
             F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"))
    )
    return s.select(
        "event_type",
        F.col("w.start").alias("session_start"),
        "cnt",
        "sum_value",
    ).orderBy("event_type", "session_start")


def q_w1_window_min(spark, sf):
    """W1 winnower semantics as a driver-checked query: per event_type, the
    sliding window-min over w=10 consecutive values, complete windows only,
    first-occurrence dedup of consecutive equal minima — the declarative twin
    of the O(n) winnow kernel (kernels.winnow_minimizers; reference
    ``winnowed_minimizers.py:18-53``, whose deque the kernel is parity-tested
    against).  Gives the winnower an oracle-checked entry on driver data."""
    w = 10
    e = _t(spark, sf, "events").select("event_type", "event_id", "value")
    part = Window.partitionBy("event_type").orderBy("event_id")
    d = e.select(
        "event_type", "value",
        F.row_number().over(part).alias("rn"),
        F.min("value").over(part.rowsBetween(-(w - 1), 0)).alias("m"),
    )
    d = d.select("*", F.lag("m").over(
        Window.partitionBy("event_type").orderBy("rn")).alias("pm"))
    return (
        d.where((F.col("rn") >= w) & ((F.col("rn") == w) | (F.col("m") != F.col("pm"))))
        .select("event_type", F.col("rn").cast("long").alias("win_pos"),
                F.round("m", 6).alias("win_min"))
        .orderBy("event_type", "win_pos")
    )


def q_pairwise_report_exact(spark, sf):
    """The pairwise_report operator itself (mapInPandas over the numpy
    shingle kernels) driver-checked end-to-end: consecutive documents scored
    in text mode at k=8 with the exact-I/U/J columns exposed; a pure-SQL
    8-gram set computation reproduces the values (the 64-bit shingle
    fingerprints are injective at this scale, text is ASCII so byte==char)."""
    d = _t(spark, sf, "documents").where(F.length("text") >= 8)
    a = d.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a"))
    b = d.select((F.col("doc_id") - 1).alias("id_a"), F.col("text").alias("text_b"))
    pairs = a.join(b, "id_a").select(
        F.col("id_a").cast("string").alias("name_a"), "text_a",
        (F.col("id_a") + 1).cast("string").alias("name_b"), "text_b",
    )
    cfg = SketchConfig(k=8, w=10, hash_type="splitmix64", hash_seed=0,
                       mode="text", num_perm=1, lsh_bands=1)
    rep = pairwise_report(pairs, cfg, correction="off")
    return (
        rep.select(
            F.col("name_a").cast("long").alias("id_a"),
            F.col("i_exact").alias("i_grams"),
            F.col("u_exact").alias("u_grams"),
            F.round("j_exact", 6).alias("jaccard"),
        )
        .orderBy("id_a")
    )


def q_shingle_profile(spark, sf):
    """H2 kmer/shingle-profile operator (functions.sketch.shingle_profile —
    exploded (id, fingerprint, cnt) multiset rows) summarized per document;
    a pure-SQL 8-gram multiset reproduces the counts."""
    from minimizer_jaccard_estimator_spark.functions.sketch import shingle_profile

    d = _t(spark, sf, "documents").where(F.length("text") >= 8)
    cfg = SketchConfig(k=8, w=10, hash_type="splitmix64", hash_seed=0,
                       mode="text", num_perm=1, lsh_bands=1)
    prof = shingle_profile(d, cfg, id_col="doc_id", text_col="text")
    return (
        prof.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_distinct"),
            F.sum("cnt").cast("long").alias("n_shingles"),
            F.max("cnt").cast("long").alias("max_mult"),
        )
        .orderBy("doc_id")
    )


def q_ann_cosine_topk(spark, sf):
    """Brute-force cosine top-k similarity search against query vec_id=0."""
    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") == 0).select(F.col("v").alias("q"))
    j = emb.where(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    dot = F.aggregate(F.zip_with("v", "q", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(F.transform("v", lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x))
    nq = F.sqrt(F.aggregate(F.transform("q", lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x))
    return (
        j.select("vec_id", F.round(dot / (nv * nq), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# sketch-kernel operators (not ANSI-SQL-expressible -> rows-only check;
# their numeric parity is covered by tests/ against the reference)
# ---------------------------------------------------------------------------

def q_minimizer_sketch(spark, sf):
    """H5+W1: per-doc sketch stats through the Arrow sketch UDF.

    n_shingles (= max(0, len-k+1)) and n_dups (= shingles whose hash was
    seen before, reference count_duplicates) ARE SQL-expressible under the
    same two assumptions pairwise_report_exact/ngram_jaccard already rely
    on: fingerprint injectivity, and ASCII fixtures (the kernel shingles
    UTF-8 BYTES while SQL substring/length count CHARACTERS — equal only
    when every char is one byte, which the generated documents tables are).
    The minimizer count itself is not SQL-expressible; it is pinned by
    kernel parity tests (tests/test_kernels.py) and the w1_window_min
    oracle."""
    d = _t(spark, sf, "documents").select(F.col("doc_id").cast("string").alias("conv_id"), "text")
    sk = add_sketch(d, _SKETCH)
    return sk.select("conv_id", "n_shingles", "n_dups").orderBy("conv_id")


def q_minimizer_sketch_full(spark, sf):
    """Rows-only companion to minimizer_sketch that KEEPS the minimizer
    count, so the full sketch struct — including the (w,k) window-min
    winnower itself — stays exercised end-to-end in the bench/correctness
    path (ADVICE r03; the oracle-checked minimizer_sketch had to drop
    n_minimizers to stay SQL-expressible)."""
    d = _t(spark, sf, "documents").select(F.col("doc_id").cast("string").alias("conv_id"), "text")
    sk = add_sketch(d, _SKETCH)
    return sk.select(
        "conv_id", "n_shingles", "n_dups",
        F.size(F.array_distinct("minimizers")).alias("n_minimizers"),
    ).orderBy("conv_id")


def q_simhash_invariant(spark, sf):
    """Partial oracle for the SimHash kernel (VERDICT r03 #4): the query
    self-seeds a byte-identical copy (doc_id+1000000) of every 50th document
    through the REAL Arrow signature UDF; identical text must produce an
    identical 64-bit SimHash, so the (orig, copy) hamming distance is
    SQL-derivable: exactly 0 for every planted pair.  A kernel that were
    text-order-, partition-, or batch-dependent would break this."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    seeded = d.unionByName(
        d.where(F.col("doc_id") % 50 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    sig = add_signature(
        seeded.select(F.col("doc_id").cast("string").alias("conv_id"), "text"), _SKETCH
    ).select(F.col("conv_id").cast("long").alias("doc_id"), "simhash")
    a = sig.where(F.col("doc_id") < 1000000).select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a")
    )
    b = sig.where(F.col("doc_id") >= 1000000).select(
        (F.col("doc_id") - 1000000).alias("id_a"), F.col("simhash").alias("sh_b")
    )
    return (
        a.join(b, "id_a")
        .select("id_a", (F.col("id_a") + 1000000).alias("id_b"),
                F.bit_count(F.expr("sh_a ^ sh_b")).alias("hamming"))
        .orderBy("id_a")
    )


def q_media_neardup_invariant(spark, sf):
    """Partial oracle for the media near-dup path (VERDICT r03 #4): planted
    byte-identical media payloads (doc_id+1000000 copies of every 50th doc)
    get identical stub features, so the LSH operator MUST recover every
    planted pair with cosine 1.0 — identical vectors collide in every
    hyperplane table (p=1), making the probabilistic operator exact on this
    subset.  The query filters to the planted pairs; recall on non-identical
    pairs stays pytest-covered (tests/test_multimodal.py)."""
    from minimizer_jaccard_estimator_spark.operators.multimodal import (
        extract_features,
        media_neardup_pairs,
        synthetic_media,
    )

    d = _t(spark, sf, "documents")
    seeded = d.unionByName(
        d.where(F.col("doc_id") % 50 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    feats = extract_features(synthetic_media(seeded), dim=32)
    pairs = media_neardup_pairs(feats, threshold=0.9999, n_tables=16,
                                max_bucket_size=None, dim=32)
    na = F.substring("id_a", 2, 20).cast("long")
    nb = F.substring("id_b", 2, 20).cast("long")
    orig = F.least(na, nb)
    return (
        pairs.where(F.abs(na - nb) == 1000000)
        .select(
            F.concat(F.lit("m"), orig.cast("string")).alias("id_a"),
            F.concat(F.lit("m"), (orig + 1000000).cast("string")).alias("id_b"),
            F.round("cosine", 4).alias("cosine"),
        )
        .orderBy("id_a")
    )


def q_lsh_candidates_invariant(spark, sf):
    """Partial oracle for LSH candidate generation: planted byte-identical
    copies have identical MinHash signatures, so EVERY band bucket pairs
    them — the candidate set must contain every planted pair regardless of
    banding config.  Filtered to the planted pairs (the rest of the
    candidate set is kernel-dependent and stays rows-only via
    minhash_lsh_candidates); bucket cap disabled so no planted bucket can
    be audited away (the fixture has no natural exact-dup groups)."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    seeded = d.unionByName(
        d.where(F.col("doc_id") % 50 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    sig = add_signature(
        seeded.select(F.col("doc_id").cast("string").alias("conv_id"), "text"), _SKETCH
    )
    pairs = lsh_candidate_pairs(sig.select("conv_id", "minhash"), _SKETCH,
                                max_bucket_size=None)
    na = F.col("id_a").cast("long")
    nb = F.col("id_b").cast("long")
    orig = F.least(na, nb)
    return (
        pairs.where(F.abs(na - nb) == 1000000)
        .select(orig.alias("id_a"), (orig + 1000000).alias("id_b"))
        .orderBy("id_a")
    )


def q_verified_pairs_invariant(spark, sf):
    """Partial oracle for the exact minimizer-Jaccard verify: planted
    byte-identical copies have identical minimizer sets, so verify_pairs
    must score exactly j_mini = 1.0 on every planted pair.  Docs shorter
    than k are excluded (empty minimizer sets verify to 0 by the zero-union
    convention) — the oracle applies the same length filter."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    planted = d.where((F.col("doc_id") % 50 == 0) & (F.length("text") >= _SKETCH.k))
    seeded = d.unionByName(
        planted.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    sk = add_sketch(
        seeded.select(F.col("doc_id").cast("string").alias("conv_id"), "text"), _SKETCH
    )
    cand = planted.select(
        F.col("doc_id").cast("string").alias("id_a"),
        (F.col("doc_id") + 1000000).cast("string").alias("id_b"),
    )
    out = verify_pairs(cand, sk.select("conv_id", "minimizers"))
    return (
        out.select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            F.round("j_mini", 6).alias("j_mini"),
        )
        .orderBy("id_a")
    )


def q_substring_spans_invariant(spark, sf):
    """Partial oracle for the suffix-array substring pass: a planted
    byte-identical copy shares its ENTIRE text with the original, so
    duplicate_spans must recover a maximal span of the full byte length
    with full coverage on both sides — all SQL-derivable from octet_length.
    (The span COUNT is deliberately not asserted: byte-identity implies the
    full-length span and total coverage, but a text whose tail repeats an
    internal >=min_len block can legitimately report a second maximal span
    — review r04.)  Filtered to the planted pairs; general span geometry
    stays rows-only via substring_dup_spans + tests/test_suffix.py."""
    from minimizer_jaccard_estimator_spark.operators.substring import duplicate_spans

    d = _t(spark, sf, "documents").select("doc_id", "text")
    planted = d.where((F.col("doc_id") % 50 == 0) & (F.octet_length("text") >= 64))
    seeded = d.unionByName(
        planted.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    sp = duplicate_spans(
        seeded.select(F.col("doc_id").cast("string").alias("conv_id"), "text"),
        min_len=32, max_bucket_size=None,
    )
    na = F.col("id_a").cast("long")
    nb = F.col("id_b").cast("long")
    orig = F.least(na, nb)
    return (
        sp.where(F.abs(na - nb) == 1000000)
        .select(
            orig.alias("id_a"), (orig + 1000000).alias("id_b"),
            F.col("longest").cast("long").alias("longest"),
            F.col("cov_a").cast("long").alias("covered_a"),
            F.col("cov_b").cast("long").alias("covered_b"),
        )
        .orderBy("id_a")
    )


def q_dedup_clusters_invariant(spark, sf):
    """Driver-checked invariant over the FULL dedup pipeline (VERDICT r03
    #7): the query self-seeds a NEAR-duplicate (first 10 characters dropped,
    so NOT byte-identical — the exact-digest bypass cannot link it) of every
    50th sufficiently-long document, runs the whole sketch → MinHash/LSH →
    exact-verify → connected-components pipeline, and emits one SQL-derivable
    row per planted pair: the copy must land in the SAME cluster as its
    original (shingle Jaccard ~0.9 >> threshold 0.5; P[all 32 bands miss] <
    1e-20 at r=2, and the pipeline is deterministic given the fixture)."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    planted = d.where((F.col("doc_id") % 50 == 0) & (F.length("text") >= 200))
    mutated = planted.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.expr("substring(text, 11)").alias("text"),
    )
    seeded = d.unionByName(mutated)
    # max_bucket_size=None (ADVICE r04): like the other invariant oracles, no
    # planted pair may be capped away by a naturally hot bucket at larger sf —
    # a dropped bucket would fail the oracle with no kernel bug present
    res = run_dedup(spark, _docs_as_transcripts(seeded),
                    DedupConfig(sketch=_SKETCH, max_bucket_size=None))
    c = res.clusters.select(F.col("conv_id").cast("long").alias("doc_id"), "cluster_id")
    orig = c.where(F.col("doc_id") < 1000000).select(
        F.col("doc_id").alias("orig_id"), F.col("cluster_id").alias("c_orig")
    )
    copy = c.where(F.col("doc_id") >= 1000000).select(
        (F.col("doc_id") - 1000000).alias("orig_id"), F.col("cluster_id").alias("c_copy")
    )
    return (
        orig.join(copy, "orig_id")
        .select("orig_id", (F.col("c_orig") == F.col("c_copy")).alias("same_cluster"))
        .orderBy("orig_id")
    )


def q_minhash_lsh_candidates(spark, sf):
    """H10+LSH: banded-MinHash candidate pairs over documents."""
    d = _t(spark, sf, "documents").select(F.col("doc_id").cast("string").alias("conv_id"), "text")
    sig = add_signature(d, _SKETCH)
    return lsh_candidate_pairs(sig.select("conv_id", "minhash"), _SKETCH).orderBy("id_a", "id_b")


def q_dedup_clusters(spark, sf):
    """Full dedup pipeline over documents-as-conversations."""
    docs = _t(spark, sf, "documents")
    res = run_dedup(spark, _docs_as_transcripts(docs), DedupConfig(sketch=_SKETCH))
    return res.clusters.orderBy("conv_id")


def q_verified_pairs(spark, sf):
    """J4 minimizer-Jaccard verification of LSH candidates."""
    docs = _t(spark, sf, "documents")
    res = run_dedup(spark, _docs_as_transcripts(docs), DedupConfig(sketch=_SKETCH))
    return res.verified.select("id_a", "id_b", "i_mini", "u_mini",
                               F.round("j_mini", 6).alias("j_mini")).orderBy("id_a", "id_b")


def q_simhash_hamming(spark, sf):
    """SimHash signatures + hamming distance of consecutive docs."""
    d = _t(spark, sf, "documents").select(F.col("doc_id").cast("string").alias("conv_id"), "text")
    sig = add_signature(d, _SKETCH).select(F.col("conv_id").cast("long").alias("doc_id"), "simhash")
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sig.select((F.col("doc_id") - 1).alias("id_a"), F.col("simhash").alias("sh_b"))
    return (
        a.join(b, "id_a")
        .select("id_a", F.bit_count(F.expr("sh_a ^ sh_b")).alias("hamming"))
        .orderBy("id_a")
    )


def q_pairwise_report(spark, sf):
    """Reference CLI #2 as a Spark operator: exact J + replicate-averaged
    minimizer estimate + bias correction over consecutive-document pairs."""
    d = _t(spark, sf, "documents")
    a = d.select(F.col("doc_id").alias("id"), F.col("doc_id").cast("string").alias("name_a"),
                 F.col("text").alias("text_a"))
    b = d.select((F.col("doc_id") - 1).alias("id"), F.col("doc_id").cast("string").alias("name_b"),
                 F.col("text").alias("text_b"))
    pairs = a.join(b, "id").where(F.col("id") % 10 == 0)  # sample 1/10 of pairs
    rep = pairwise_report(pairs, _SKETCH)
    return rep.select(
        "name_a", "name_b", "i_exact", "u_exact",
        F.round("j_exact", 6).alias("j_exact"),
        F.round("j_mini_avg", 6).alias("j_mini_avg"),
    ).orderBy("name_a")


def q_sliding_best_window(spark, sf):
    """Reference CLI #1 as a Spark operator: best-matching query-length window
    per document (max sliding minimizer-Jaccard), a substring similarity scan."""
    d = _t(spark, sf, "documents")
    q_text = d.where(F.col("doc_id") == 0).select("text").head()["text"][:120]
    details = sliding_jaccard(
        d.select(F.col("doc_id").cast("string").alias("name"), F.col("text").alias("seq")),
        "q0", q_text, _SKETCH, minimizer_mode="global",
    )
    return (
        details.groupBy("ref_name")
        .agg(F.max("j_kmer").alias("best_j_kmer"), F.max("j_mini").alias("best_j_mini"),
             F.count("*").alias("n_windows"))
        .orderBy("ref_name")
    )


def q_pairwise_report_invariant(spark, sf):
    """Invariant-oracle companion to pairwise_report (VERDICT r04 #6): every
    25th document is paired with a byte-identical copy of itself through the
    FULL operator (replicate-averaged minimizer estimate included).
    Identical texts make the exact intersection and union both equal the
    distinct 8-gram count (SQL-countable under the fingerprint-injectivity +
    ASCII assumptions pairwise_report_exact already relies on), and every
    replicate's minimizer sets are identical, so J = Jhat = 1 exactly.
    The length guard is >= 64, not >= 8: j_mini_avg = 1.0 additionally
    needs a NON-EMPTY minimizer set (length >= k + w - 1 = 17 at this
    config; 64 matches verified_pairs_invariant's margin), else the
    replicate estimate is 0/0 while the SQL side hardcodes 1.0."""
    d = _t(spark, sf, "documents").where(
        (F.col("doc_id") % 25 == 0) & (F.length("text") >= 64)
    )
    pairs = d.select(
        F.col("doc_id").cast("string").alias("name_a"),
        F.col("text").alias("text_a"),
        (F.col("doc_id") + 1000000).cast("string").alias("name_b"),
        F.col("text").alias("text_b"),
    )
    rep = pairwise_report(pairs, _SKETCH)
    return rep.select(
        F.col("name_a").cast("long").alias("id_a"),
        F.col("i_exact").alias("i_grams"),
        F.col("u_exact").alias("u_grams"),
        F.round("j_exact", 6).alias("j_exact"),
        F.round("j_mini_avg", 6).alias("j_mini_avg"),
    ).orderBy("id_a")


def q_sliding_best_window_invariant(spark, sf):
    """Invariant-oracle companion to sliding_best_window (VERDICT r04 #6):
    every 100th document gets the query text (doc 0's first 120 chars)
    planted VERBATIM between two pads cut from its own text; the window
    exactly covering the plant has an identical character sequence, hence
    identical k-gram and (local-mode) minimizer sets — best J = best Jhat =
    1.0, the first perfect window sits at the plant offset (SQL: strpos),
    and the window count is length(seq) - |q| + 1."""
    docs = _t(spark, sf, "documents")
    q_text = docs.where(F.col("doc_id") == 0).head()["text"][:120]
    planted = (
        docs.where((F.col("doc_id") % 100 == 0) & (F.length("text") >= 180))
        .select(
            F.col("doc_id").cast("string").alias("name"),
            F.concat(F.substring("text", 1, 40), F.lit(q_text),
                     F.substring("text", 41, 20)).alias("seq"),
        )
    )
    details = sliding_jaccard(planted, "q0", q_text, _SKETCH,
                              minimizer_mode="local")
    # I == U makes j_kmer exactly 1.0 in IEEE terms — float equality is safe
    exact_pos = F.min(F.when(F.col("j_kmer") == 1.0, F.col("ref_start")))
    return (
        details.groupBy(F.col("ref_name").cast("long").alias("doc_id"))
        .agg(
            F.count("*").alias("n_windows"),
            F.round(F.max("j_kmer"), 6).alias("best_j_kmer"),
            F.round(F.max("j_mini"), 6).alias("best_j_mini"),
            exact_pos.cast("long").alias("first_exact_pos"),
        )
        .orderBy("doc_id")
    )


def q_ann_ivf_topk(spark, sf):
    """IVF ANN at full probe == exact brute force (same DuckDB oracle as
    ann_cosine_topk); partial-probe recall is covered by tests/test_ann.py."""
    from minimizer_jaccard_estimator_spark.operators.ann import build_ivf, ivf_topk

    emb = _t(spark, sf, "embeddings")
    query = [float(x) for x in emb.where("vec_id = 0").head()["embedding"]]
    corpus = emb.where("vec_id <> 0")
    n_cells = 8
    idx = build_ivf(corpus, n_cells=n_cells, seed=42)
    # over-fetch, then re-rank by the ROUNDED cosine with vec_id tiebreak so
    # boundary ties resolve exactly like the oracle's ORDER BY round(...)
    out = ivf_topk(idx, query, k=50, nprobe=n_cells)
    return (
        out.select("vec_id", F.round("cosine", 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


def q_lang_id(spark, sf):
    """Language-ID n-gram/stopword-profile heuristic (argmax of marker-word
    hits per language, deterministic tie-break), aggregated per prediction."""
    from minimizer_jaccard_estimator_spark.operators.text_analysis import language_id

    d = _t(spark, sf, "documents")
    per = language_id(d)
    return (
        per.groupBy("lang_pred")
        .agg(F.count("*").alias("n_docs"),
             F.sum("hits").alias("total_hits"),
             F.max("n_words").alias("max_words"))
        .orderBy("lang_pred")
    )


def _seeded_embeddings(spark, sf) -> DataFrame:
    """embeddings ∪ a vec_id+1000000 copy of every 100th vector — planted
    exact near-dups (cosine 1.0) so the near-dup oracles compare non-empty
    results (VERDICT r02 #5: a 0-row match can't distinguish a correct
    operator from one that drops everything).  The oracle SQL seeds
    identically."""
    emb = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    return emb.unionByName(
        emb.where(F.col("vec_id") % 100 == 0)
        .select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    )


def q_embedding_neardup(spark, sf):
    """Embedding-cosine near-dup pairs: all (i < j) vector pairs with cosine
    >= 0.99 — the brute-force oracle path of similarity dedup (JVM-side
    higher-order array functions, no Python).  Self-seeded with planted
    exact duplicates (see _seeded_embeddings)."""
    emb = _seeded_embeddings(spark, sf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    norm = F.sqrt(F.aggregate(F.transform("v", lambda a: a * a), F.lit(0.0), lambda s, x: s + x))
    e = emb.select("vec_id", F.transform("v", lambda a: a / norm).alias("u"))
    a = e.select(F.col("vec_id").alias("id_a"), F.col("u").alias("ua"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("u").alias("ub"))
    j = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    cos = F.aggregate(F.zip_with("ua", "ub", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    return (
        j.select("id_a", "id_b", F.round(cos, 4).alias("cosine"))
        .where(F.col("cosine") >= 0.99)
        .orderBy("id_a", "id_b")
    )


def q_embedding_neardup_lsh(spark, sf):
    """Embedding near-dup pairs via seeded random-hyperplane LSH + exact
    cosine verify (operators/ann.py:embedding_neardup_pairs) — the SCALE path
    the crossJoin query above oracles: bucketed candidates, never all-pairs.
    Same oracle SQL; recall >= 0.95 vs brute force is pytest-verified on
    planted near-dups (tests/test_ann.py).

    FIXTURE DEPENDENCE (ADVICE r02): this query demands exact equality with
    the brute-force oracle, which a probabilistic LSH can only promise when
    every >=threshold pair collides with probability ~1.  That holds here:
    the planted near-dups are IDENTICAL copies (hyperplane collision p=1 in
    every table) and the natural fixture has no 0.99-boundary pairs; the
    bucket cap is disabled and n_tables raised so no bucket is silently
    dropped.  Statistical (not exact) recall lives in tests/test_ann.py."""
    from minimizer_jaccard_estimator_spark.operators.ann import embedding_neardup_pairs

    emb = _seeded_embeddings(spark, sf)
    # operator threshold sits just below the oracle's ROUNDED >= 0.99 cut so
    # boundary pairs (exact 0.98995..0.99) survive to the rounded filter
    pairs = embedding_neardup_pairs(emb, threshold=0.9899, n_tables=16,
                                    max_bucket_size=None)
    return (
        pairs.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
        .where(F.col("cosine") >= 0.99)
        .orderBy("id_a", "id_b")
    )


def q_media_digest(spark, sf):
    """Multimodal plumbing: documents-as-binary media with typed kind and
    content digest (decode itself is stubbed; the binary column, schema and
    digest path are real)."""
    from minimizer_jaccard_estimator_spark.operators.multimodal import synthetic_media

    d = _t(spark, sf, "documents")
    m = synthetic_media(d)
    return (
        m.select(
            "media_id", "kind",
            F.length("content").cast("long").alias("n_bytes"),
            F.sha2("content", 256).alias("digest"),
        )
        .orderBy("media_id")
    )


def q_media_neardup(spark, sf):
    """Near-dup media pairs: stub features -> hyperplane bucket -> cosine."""
    from minimizer_jaccard_estimator_spark.operators.multimodal import (
        extract_features,
        media_neardup_pairs,
        synthetic_media,
    )

    d = _t(spark, sf, "documents")
    feats = extract_features(synthetic_media(d), dim=32)
    return (
        media_neardup_pairs(feats, threshold=0.9999, dim=32)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


def q_substring_dup_spans(spark, sf):
    """Suffix-array pass: exact duplicate spans >= 32 bytes between docs."""
    from minimizer_jaccard_estimator_spark.operators.substring import duplicate_spans

    d = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("conv_id"), "text"
    )
    sp = duplicate_spans(d, min_len=32)
    return sp.select(
        "id_a", "id_b", "len_a", "len_b", "cov_a", "cov_b", "longest", "n_spans"
    ).orderBy("id_a", "id_b")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "a1_multiset_count": q_a1_multiset_count,
        "a2_distinct_count": q_a2_distinct_count,
        "a3_duplicate_count": q_a3_duplicate_count,
        "a5_histogram": q_a5_histogram,
        "j1_pair_zip_join": q_j1_pair_zip_join,
        "j3_word_jaccard": q_j3_word_jaccard,
        "ngram_jaccard": q_ngram_jaccard,
        "exact_dedup": q_exact_dedup,
        "doc_fingerprint": q_doc_fingerprint,
        "token_count": q_token_count,
        "bpe_token_count": q_bpe_token_count,
        "quality_score": q_quality_score,
        "lang_quality": q_lang_quality,
        "o1_topk": q_o1_topk,
        "join_agg_revenue": q_join_agg_revenue,
        "events_window": q_events_window,
        "w1_window_min": q_w1_window_min,
        "pairwise_report_exact": q_pairwise_report_exact,
        "shingle_profile": q_shingle_profile,
        "events_session_window": q_events_session_window,
        "ann_cosine_topk": q_ann_cosine_topk,
        "minimizer_sketch": q_minimizer_sketch,
        # self-seeded invariant oracles over kernel-backed pipelines
        "simhash_invariant": q_simhash_invariant,
        "media_neardup_invariant": q_media_neardup_invariant,
        "dedup_clusters_invariant": q_dedup_clusters_invariant,
        "lsh_candidates_invariant": q_lsh_candidates_invariant,
        "verified_pairs_invariant": q_verified_pairs_invariant,
        "substring_spans_invariant": q_substring_spans_invariant,
        "pairwise_report_invariant": q_pairwise_report_invariant,
        "sliding_best_window_invariant": q_sliding_best_window_invariant,
        # kernel-backed (rows-only checks)
        "minimizer_sketch_full": q_minimizer_sketch_full,
        "minhash_lsh_candidates": q_minhash_lsh_candidates,
        "dedup_clusters": q_dedup_clusters,
        "verified_pairs": q_verified_pairs,
        "simhash_hamming": q_simhash_hamming,
        "pairwise_report": q_pairwise_report,
        "sliding_best_window": q_sliding_best_window,
        "ann_ivf_topk": q_ann_ivf_topk,
        "lang_id": q_lang_id,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "media_digest": q_media_digest,
        "media_neardup": q_media_neardup,
        "substring_dup_spans": q_substring_dup_spans,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "a1_multiset_count": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS cnt,
                   CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "a2_distinct_count": """
            SELECT l_returnflag,
                   count(DISTINCT l_partkey) AS n_parts,
                   count(DISTINCT l_suppkey) AS n_supps
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "a3_duplicate_count": """
            WITH per AS (SELECT o_custkey, count(*) AS c FROM orders GROUP BY o_custkey)
            SELECT CAST(sum(c - 1) AS BIGINT) AS n_dups, count(*) AS n_keys FROM per
        """,
        "a5_histogram": """
            WITH b AS (SELECT CAST(floor((l_quantity + 2.5) / 5.0) AS BIGINT) AS bucket FROM lineitem)
            SELECT bucket, count(*) AS cnt, CAST(bucket * 5.0 AS DOUBLE) AS center
            FROM b GROUP BY bucket ORDER BY bucket
        """,
        "j1_pair_zip_join": """
            WITH rn AS (
              SELECT o_orderkey, o_totalprice,
                     row_number() OVER (ORDER BY o_orderkey) AS rn
              FROM orders
            ),
            a AS (SELECT CAST(rn/2 + 0.5 AS BIGINT) AS pair_id, o_orderkey AS key_a,
                         o_totalprice AS price_a FROM rn WHERE rn % 2 = 1),
            b AS (SELECT CAST(rn/2 AS BIGINT) AS pair_id, o_orderkey AS key_b,
                         o_totalprice AS price_b FROM rn WHERE rn % 2 = 0)
            SELECT a.pair_id, key_a, key_b, round(abs(price_a - price_b), 2) AS price_gap
            FROM a JOIN b ON a.pair_id = b.pair_id ORDER BY a.pair_id
        """,
        "j3_word_jaccard": """
            WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents)
            SELECT a.doc_id AS id_a,
                   len(list_intersect(a.ws, b.ws)) AS i_words,
                   len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws)) AS u_words,
                   round(len(list_intersect(a.ws, b.ws)) /
                         (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))), 6) AS jaccard
            FROM w a JOIN w b ON b.doc_id = a.doc_id + 1
            ORDER BY id_a
        """,
        "ngram_jaccard": """
            WITH g AS (
              SELECT doc_id,
                     list_distinct([substring(text, i, 8) for i in generate_series(1, length(text) - 7)]) AS gs
              FROM documents WHERE length(text) >= 8
            )
            SELECT a.doc_id AS id_a,
                   len(list_intersect(a.gs, b.gs)) AS i_grams,
                   len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs)) AS u_grams,
                   round(len(list_intersect(a.gs, b.gs)) /
                         (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))), 6) AS jaccard
            FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
            ORDER BY id_a
        """,
        "exact_dedup": """
            WITH seeded AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text FROM documents
              WHERE doc_id % 50 = 0
            )
            SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
            FROM seeded GROUP BY text HAVING count(*) > 1 ORDER BY keeper_id
        """,
        "doc_fingerprint": """
            SELECT source, count(DISTINCT md5(text)) AS n_unique, count(*) AS n_docs
            FROM documents GROUP BY source ORDER BY source
        """,
        "token_count": """
            WITH t AS (SELECT lang, len(string_split(text, ' ')) AS toks FROM documents)
            SELECT lang, CAST(sum(toks) AS BIGINT) AS total_tokens, count(*) AS n_docs, max(toks) AS max_tokens
            FROM t GROUP BY lang ORDER BY lang
        """,
        "bpe_token_count": r"""
            WITH t AS (
              SELECT lang,
                     len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]+')) AS toks
              FROM documents
            )
            SELECT lang, CAST(sum(toks) AS BIGINT) AS total_tokens,
                   round(avg(toks), 6) AS avg_tokens, count(*) AS n_docs
            FROM t GROUP BY lang ORDER BY lang
        """,
        "quality_score": """
            SELECT doc_id,
                   length(text) AS n_chars_m,
                   len(string_split(text, ' ')) AS n_words,
                   round(length(text) / len(string_split(text, ' ')), 6) AS avg_word_len,
                   round((len(string_split(text, ' the ')) - 1) /
                         len(string_split(text, ' ')), 6) AS the_ratio
            FROM documents ORDER BY doc_id
        """,
        "lang_quality": """
            WITH per AS (
              SELECT lang,
                     round((len(string_split(text, ' the ')) - 1) /
                           len(string_split(text, ' ')), 6) AS r
              FROM documents
            )
            SELECT lang, round(CAST(sum(CAST(r AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_ratio,
                   count(*) AS n_docs
            FROM per GROUP BY lang ORDER BY lang
        """,
        "o1_topk": """
            SELECT o_orderkey, o_totalprice, o_orderpriority
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "join_agg_revenue": """
            SELECT r_name, n_name, count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name ORDER BY r_name, n_name
        """,
        "events_window": """
            SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS cnt,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY hour, event_type
        """,
        "w1_window_min": """
            WITH d AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn,
                     min(value) OVER (PARTITION BY event_type ORDER BY event_id
                                      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS m
              FROM events
            ),
            l AS (
              SELECT *, lag(m) OVER (PARTITION BY event_type ORDER BY rn) AS pm
              FROM d
            )
            SELECT event_type, rn AS win_pos, round(m, 6) AS win_min
            FROM l
            WHERE rn >= 10 AND (rn = 10 OR m != pm)
            ORDER BY event_type, win_pos
        """,
        "pairwise_report_exact": """
            WITH g AS (
              SELECT doc_id,
                     list_distinct([substring(text, i, 8) for i in generate_series(1, length(text) - 7)]) AS gs
              FROM documents WHERE length(text) >= 8
            )
            SELECT a.doc_id AS id_a,
                   len(list_intersect(a.gs, b.gs)) AS i_grams,
                   len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs)) AS u_grams,
                   round(len(list_intersect(a.gs, b.gs)) /
                         (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))), 6) AS jaccard
            FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
            ORDER BY id_a
        """,
        "shingle_profile": """
            WITH g AS (
              SELECT doc_id,
                     unnest([substring(text, i, 8) for i in generate_series(1, length(text) - 7)]) AS sh
              FROM documents WHERE length(text) >= 8
            ),
            per AS (SELECT doc_id, sh, count(*) AS c FROM g GROUP BY doc_id, sh)
            SELECT doc_id, count(*) AS n_distinct,
                   CAST(sum(c) AS BIGINT) AS n_shingles,
                   CAST(max(c) AS BIGINT) AS max_mult
            FROM per GROUP BY doc_id ORDER BY doc_id
        """,
        "events_session_window": """
            WITH o AS (
              SELECT event_type, ts, value,
                     lag(ts) OVER (PARTITION BY event_type ORDER BY ts) AS prev_ts
              FROM events
            ),
            flagged AS (
              SELECT event_type, ts, value,
                     -- strict > matches Spark session_window semantics: an
                     -- event at EXACTLY prev_ts+gap still merges (verified
                     -- and pinned by test_session_window_exact_gap_boundary)
                     CASE WHEN prev_ts IS NULL
                               OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1
                          ELSE 0 END AS new_session
              FROM o
            ),
            sess AS (
              SELECT event_type, ts, value,
                     sum(new_session) OVER (PARTITION BY event_type ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM flagged
            )
            SELECT event_type, min(ts) AS session_start, count(*) AS cnt,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM sess GROUP BY event_type, sid
            ORDER BY event_type, session_start
        """,
        "ann_cosine_topk": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_dot_product(e.v, q.qv) /
                         (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 4)
                     AS cosine
            FROM e, q WHERE e.vec_id <> 0
            ORDER BY cosine DESC, e.vec_id ASC LIMIT 10
        """,
        "ann_ivf_topk": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_dot_product(e.v, q.qv) /
                         (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 4)
                     AS cosine
            FROM e, q WHERE e.vec_id <> 0
            ORDER BY cosine DESC, e.vec_id ASC LIMIT 10
        """,
        "lang_id": """
            WITH w AS (
              SELECT doc_id,
                     len(string_split(coalesce(text, ''), ' ')) AS n_words,
                     list_distinct(string_split(lower(coalesce(text, '')), ' ')) AS ws
              FROM documents
            ),
            h AS (
              SELECT doc_id, n_words,
                     len(list_intersect(ws, ['der','die','und','das','ist','nicht','ein','mit','zu','den'])) AS h_de,
                     len(list_intersect(ws, ['the','and','of','to','a','in','is','that','it','for'])) AS h_en,
                     len(list_intersect(ws, ['el','la','que','los','una','por','con','para','las','es'])) AS h_es,
                     len(list_intersect(ws, ['le','la','et','les','des','un','une','est','que','pour'])) AS h_fr
              FROM w
            ),
            p AS (
              SELECT doc_id, n_words,
                     greatest(h_de, h_en, h_es, h_fr) AS hits,
                     CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                          WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
                          WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                          WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                          ELSE 'fr' END AS lang_pred
              FROM h
            )
            SELECT lang_pred, count(*) AS n_docs, CAST(sum(hits) AS BIGINT) AS total_hits,
                   max(n_words) AS max_words
            FROM p GROUP BY lang_pred ORDER BY lang_pred
        """,
        "embedding_neardup_lsh": """
            WITH seeded AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
              WHERE vec_id % 100 = 0
            ),
            e AS (
              SELECT vec_id,
                     list_transform(CAST(embedding AS DOUBLE[]),
                                    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                                   CAST(embedding AS DOUBLE[])))) AS u
              FROM seeded
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.u, b.u), 4) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.u, b.u), 4) >= 0.99
            ORDER BY id_a, id_b
        """,
        "embedding_neardup": """
            WITH seeded AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
              WHERE vec_id % 100 = 0
            ),
            e AS (
              SELECT vec_id,
                     list_transform(CAST(embedding AS DOUBLE[]),
                                    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                                   CAST(embedding AS DOUBLE[])))) AS u
              FROM seeded
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.u, b.u), 4) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.u, b.u), 4) >= 0.99
            ORDER BY id_a, id_b
        """,
        "minimizer_sketch": """
            WITH g AS (
              SELECT doc_id,
                     unnest([substring(text, i, 8) for i in generate_series(1, length(text) - 7)]) AS sh
              FROM documents WHERE length(text) >= 8
            ),
            per AS (
              SELECT doc_id, count(*) AS n_sh, count(DISTINCT sh) AS n_distinct
              FROM g GROUP BY doc_id
            )
            SELECT CAST(d.doc_id AS VARCHAR) AS conv_id,
                   CAST(coalesce(per.n_sh, 0) AS BIGINT) AS n_shingles,
                   CAST(coalesce(per.n_sh - per.n_distinct, 0) AS BIGINT) AS n_dups
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            ORDER BY conv_id
        """,
        "simhash_invariant": """
            SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
                   CAST(0 AS INT) AS hamming
            FROM documents WHERE doc_id % 50 = 0 ORDER BY id_a
        """,
        "media_neardup_invariant": """
            SELECT 'm' || CAST(doc_id AS VARCHAR) AS id_a,
                   'm' || CAST(doc_id + 1000000 AS VARCHAR) AS id_b,
                   CAST(1.0 AS DOUBLE) AS cosine
            FROM documents WHERE doc_id % 50 = 0 ORDER BY id_a
        """,
        "dedup_clusters_invariant": """
            SELECT doc_id AS orig_id, CAST(true AS BOOLEAN) AS same_cluster
            FROM documents WHERE doc_id % 50 = 0 AND length(text) >= 200
            ORDER BY orig_id
        """,
        "lsh_candidates_invariant": """
            SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
            FROM documents WHERE doc_id % 50 = 0 ORDER BY id_a
        """,
        "verified_pairs_invariant": """
            SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
                   CAST(1.0 AS DOUBLE) AS j_mini
            FROM documents WHERE doc_id % 50 = 0 AND length(text) >= 8
            ORDER BY id_a
        """,
        "substring_spans_invariant": """
            SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
                   CAST(octet_length(encode(text)) AS BIGINT) AS longest,
                   CAST(octet_length(encode(text)) AS BIGINT) AS covered_a,
                   CAST(octet_length(encode(text)) AS BIGINT) AS covered_b
            FROM documents
            WHERE doc_id % 50 = 0 AND octet_length(encode(text)) >= 64
            ORDER BY id_a
        """,
        "pairwise_report_invariant": """
            WITH s AS (
              SELECT doc_id,
                     list_distinct([substring(text, i, 8) for i in generate_series(1, length(text) - 7)]) AS gs
              FROM documents WHERE doc_id % 25 = 0 AND length(text) >= 64
            )
            SELECT doc_id AS id_a,
                   len(gs) AS i_grams, len(gs) AS u_grams,
                   CAST(1.0 AS DOUBLE) AS j_exact,
                   CAST(1.0 AS DOUBLE) AS j_mini_avg
            FROM s ORDER BY id_a
        """,
        "sliding_best_window_invariant": """
            WITH q AS (
              SELECT substring(text, 1, 120) AS qt FROM documents WHERE doc_id = 0
            ),
            d AS (
              SELECT doc_id,
                     substring(text, 1, 40) || (SELECT qt FROM q)
                       || substring(text, 41, 20) AS seq
              FROM documents WHERE doc_id % 100 = 0 AND length(text) >= 180
            )
            SELECT doc_id,
                   CAST(length(seq) - length((SELECT qt FROM q)) + 1 AS BIGINT) AS n_windows,
                   CAST(1.0 AS DOUBLE) AS best_j_kmer,
                   CAST(1.0 AS DOUBLE) AS best_j_mini,
                   CAST(strpos(seq, (SELECT qt FROM q)) - 1 AS BIGINT) AS first_exact_pos
            FROM d ORDER BY doc_id
        """,
        "media_digest": """
            SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
                   CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                        WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                   octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS digest
            FROM documents ORDER BY media_id
        """,
    }
