"""Sliding-window Jaccard: a query vs every window of each reference sequence.

Spark-native re-expression of the reference's first CLI
(``sliding_jaccard.py``): for a single query Q and a stream of reference
sequences, report — for every query-length sliding window of each reference —
the true k-mer-set Jaccard J(Q,R) and the winnowed-minimizer Jaccard J(Q,R;w),
in either minimizer mode:

- ``local``  (reference default): minimizers recomputed fresh per window
  (``sliding_jaccard.py:396-411``);
- ``global``: whole-reference minimizers intersected with the window
  (``sliding_jaccard.py:293-319,342-381``).

Distributed axis: reference sequences (``mapInPandas``; the query is tiny and
broadcast by closure).  Each reference is scored by ONE O(n) vectorized pass —
NOT the reference's per-window rescans:

- distinct-in-window counts use a previous-occurrence + difference-array
  sweep (an occurrence at position p with previous same-value occurrence p'
  is the window's first occurrence exactly for window starts
  s ∈ [p'+1, p] ∩ [p−B+1, p]);
- LOCAL-mode minimizer sets need no per-window re-winnowing: the winnow of
  slice [s, s+B) emits exactly the values hashR[argmin(hashR[t:t+w])] for
  t ∈ [s, s+B−w] (every w-window of the slice is a w-window of the whole
  sequence, and the deque's leftmost-min tie rule equals argmin's), so local
  mode is the same distinct-count sweep over the per-w-window argmin
  sequence.  This replaces the reference's O(n·B) re-winnow
  (``sliding_jaccard.py:396-411``) with O(n).

Per-window semantics match ``SlidingProfile`` (``sliding_jaccard.py:504-545``):
I = |static ∩ distinct(window)|, U = |static| + |distinct(window) \\ static|.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import kernels as K
from ..functions.sketch import SketchConfig

SLIDING_SCHEMA = StructType(
    [
        StructField("query_name", StringType()),
        StructField("query_len", LongType()),
        StructField("ref_name", StringType()),
        StructField("ref_start", LongType()),
        StructField("ref_end", LongType()),
        StructField("w", IntegerType()),
        StructField("k", IntegerType()),
        StructField("i_kmer", LongType()),
        StructField("u_kmer", LongType()),
        StructField("j_kmer", DoubleType()),
        StructField("i_mini", LongType()),
        StructField("u_mini", LongType()),
        StructField("j_mini", DoubleType()),
    ]
)


def _prev_occurrence(values: np.ndarray) -> np.ndarray:
    """prev[i] = largest j<i with values[j]==values[i], else -1."""
    n = values.shape[0]
    prev = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return prev
    order = np.argsort(values, kind="stable")
    sv = values[order]
    same = sv[1:] == sv[:-1]
    prev[order[1:][same]] = order[:-1][same]
    return prev


def _window_distinct_counts(
    pos: np.ndarray, prev_pos: np.ndarray, member: np.ndarray, B: int, n_windows: int
) -> tuple[np.ndarray, np.ndarray]:
    """(#distinct member values, #distinct non-member values) per window
    [s, s+B-1], s in [0, n_windows)."""
    lo = np.maximum(np.maximum(prev_pos + 1, pos - B + 1), 0)
    hi = np.minimum(pos, n_windows - 1)
    ok = lo <= hi
    out = []
    for sel in (member, ~member):
        diff = np.zeros(n_windows + 1, dtype=np.int64)
        m = ok & sel
        np.add.at(diff, lo[m], 1)
        np.add.at(diff, hi[m] + 1, -1)
        out.append(np.cumsum(diff[:-1]))
    return out[0], out[1]


def sliding_jaccard_kernel(
    fp_r: np.ndarray,
    hash_r: np.ndarray,
    q_fp_set: np.ndarray,
    q_mini_set: np.ndarray,
    B: int,
    w: int,
    minimizer_mode: str = "local",
) -> tuple[np.ndarray, ...]:
    """Score all sliding windows of one reference.  Returns
    (i_kmer, u_kmer, j_kmer, i_mini, u_mini, j_mini) arrays of length
    Lr - B + 1 (empty when the reference is shorter than the query)."""
    Lr = fp_r.shape[0]
    n_win = Lr - B + 1
    if n_win <= 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e.astype(float), e, e, e.astype(float)

    # --- true k-mer-set Jaccard ------------------------------------------
    member_k = np.isin(fp_r, q_fp_set)
    pos_all = np.arange(Lr, dtype=np.int64)
    i_k, x_k = _window_distinct_counts(
        pos_all, _prev_occurrence(fp_r), member_k, B, n_win
    )
    u_k = int(q_fp_set.shape[0]) + x_k
    j_k = np.where(u_k > 0, i_k / np.maximum(u_k, 1), 0.0)

    # --- winnowed-minimizer Jaccard --------------------------------------
    nq = int(q_mini_set.shape[0])
    if minimizer_mode == "global":
        vals, poss = K.winnow_minimizers(hash_r, w)
        member_m = np.isin(vals, q_mini_set)
        i_m, x_m = _window_distinct_counts(
            poss, _prev_pos_of(vals, poss), member_m, B, n_win
        )
    elif Lr >= w and B >= w:
        # local mode: distinct argmin values over w-window starts t∈[s, s+B-w]
        windows = np.lib.stride_tricks.sliding_window_view(hash_r, w)
        am = (windows.argmin(axis=1) + np.arange(Lr - w + 1, dtype=np.int64))
        v_t = hash_r[am]
        member_m = np.isin(v_t, q_mini_set)
        t_pos = np.arange(v_t.shape[0], dtype=np.int64)
        i_m, x_m = _window_distinct_counts(
            t_pos, _prev_occurrence(v_t), member_m, B - w + 1, n_win
        )
    else:
        # query (or reference) shorter than w: every window winnows to nothing
        i_m = np.zeros(n_win, dtype=np.int64)
        x_m = np.zeros(n_win, dtype=np.int64)
    u_m = nq + x_m
    j_m = np.where(u_m > 0, i_m / np.maximum(u_m, 1), 0.0)
    return i_k, u_k, j_k, i_m, u_m, j_m


def _prev_pos_of(vals: np.ndarray, poss: np.ndarray) -> np.ndarray:
    """prev same-value POSITION (not index) for global-mode minimizers."""
    prev_idx = _prev_occurrence(vals)
    out = np.full(vals.shape[0], -1, dtype=np.int64)
    has = prev_idx >= 0
    out[has] = poss[prev_idx[has]]
    return out


def sliding_jaccard(
    refs: DataFrame,
    query_name: str,
    query_text: str,
    cfg: SketchConfig,
    minimizer_mode: str = "local",
    name_col: str = "name",
    seq_col: str = "seq",
    max_length: int | None = None,
) -> DataFrame:
    """Per-window report rows for every reference sequence in ``refs``.

    References shorter than the query yield no rows (the reference CLI warns
    and skips them, ``sliding_jaccard.py:261-263``).  ``max_length``
    replicates the undocumented ``--maxlength`` truncation
    (``sliding_jaccard.py:255-260``): sequences are cut to ``max_length``
    AFTER the shorter-than-query check, which uses the original length —
    the reference checks ``seqLen`` captured before truncation.
    """
    assert minimizer_mode in ("local", "global")
    import dataclasses

    # reference CLI semantics for non-ACGT input (sliding_jaccard.py:265-267,
    # 609-611): warn-and-continue, substituting the sentinel in the HASH path
    # only.  The true-kmer profile counts kmer STRINGS (:551-566), so the
    # exact-Jaccard fingerprints must keep distinct non-ACGT kmers distinct —
    # byte-shingle fingerprints give that string identity; 2-bit packing
    # would collapse every bad kmer into one sentinel value.
    if cfg.mode == "dna":
        hash_cfg = dataclasses.replace(cfg, on_invalid="sentinel")
        profile_fp = lambda t: K.shingle_fingerprints(t, cfg.k)  # noqa: E731
        if cfg.canonical:
            profile_fp = cfg.fingerprints  # canonical mode requires ACGT
    else:
        hash_cfg = cfg
        profile_fp = cfg.fingerprints
    if max_length is not None:
        refs = refs.withColumn(
            "_orig_len", F.length(F.col(seq_col))
        ).withColumn(seq_col, F.substring(F.col(seq_col), 1, max_length))
        refs = refs.where(F.col("_orig_len") >= F.lit(len(query_text))).drop("_orig_len")
    q_fp = profile_fp(query_text)
    B = int(q_fp.shape[0])
    if B <= 0:
        raise ValueError("query has no k-mers at this k")
    q_fp_set = np.unique(q_fp)
    q_hash = hash_cfg.hash_sequence(query_text)
    q_mini_set = np.unique(K.winnow_minimizers(q_hash, cfg.w)[0])
    q_len = len(query_text)
    k, w = cfg.k, cfg.w

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for r in pdf.itertuples(index=False):
                name, seq = getattr(r, name_col), getattr(r, seq_col) or ""
                fp_r = profile_fp(seq)
                hash_r = hash_cfg.hash_sequence(seq)
                i_k, u_k, j_k, i_m, u_m, j_m = sliding_jaccard_kernel(
                    fp_r, hash_r, q_fp_set, q_mini_set, B, w, minimizer_mode
                )
                n = i_k.shape[0]
                if n == 0:
                    continue
                s = np.arange(n, dtype=np.int64)
                frames.append(pd.DataFrame({
                    "query_name": query_name,
                    "query_len": q_len,
                    "ref_name": name,
                    "ref_start": s,
                    "ref_end": s + B - 1 + k,
                    "w": w,
                    "k": k,
                    "i_kmer": i_k, "u_kmer": u_k, "j_kmer": j_k,
                    "i_mini": i_m, "u_mini": u_m, "j_mini": j_m,
                }))
            cols = [f.name for f in SLIDING_SCHEMA.fields]
            yield pd.concat(frames)[cols] if frames else pd.DataFrame(columns=cols)

    # the per-reference sliding scan is the heavy axis; don't let a 1-2
    # split fixture scan serialize it (r06; no-op on well-partitioned input)
    from ..util import spread_small_input

    return spread_small_input(
        refs.select(F.col(name_col), F.col(seq_col))
    ).mapInPandas(run, schema=SLIDING_SCHEMA)


def jaccard_distribution(
    details: DataFrame, value_col: str, bucket_size: float = 0.01,
    group_cols: tuple[str, ...] = ("ref_name",),
) -> DataFrame:
    """Histogram of a sliding-report column with the reference bucket rule
    ``floor((v + Δ/2)/Δ)``, center = bucket·Δ (``sliding_jaccard.py:683-687``)
    — the ``--distribution:<value>`` sinks (S6/A5).

    One distribution PER REFERENCE sequence, like the reference sink (it is
    invoked once per reference and stamps rName/rLen on every row,
    ``sliding_jaccard.py:650-674``); pass ``group_cols=()`` for a merged
    corpus-wide histogram."""
    b = F.floor((F.col(value_col) + F.lit(bucket_size / 2)) / F.lit(bucket_size)).cast("long")
    keys = [F.col(c) for c in group_cols]
    return (
        details.select(*keys, b.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count("*").alias("cnt"))
        .withColumn("center", (F.col("bucket") * F.lit(bucket_size)).cast("double"))
        .orderBy(*group_cols, "bucket")
    )
