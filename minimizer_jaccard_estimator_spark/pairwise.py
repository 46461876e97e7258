"""Per-pair Jaccard kernels (exact and minimizer-estimated).

Numpy equivalents of reference ``jaccard_by_kmers``
(``jaccard_correction_test.py:786-805``) and ``jaccard_by_minimizers``
(``:834-852``).  Used both by the grouped-UDF verify stage and directly by
the parity tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .kernels import winnow_minimizers


@dataclass
class JaccardStats:
    n_intersection: int
    n_union: int
    jaccard: float
    n_a: int = 0
    n_b: int = 0


def jaccard_exact(fp_a: np.ndarray, fp_b: np.ndarray) -> JaccardStats:
    """Jaccard over DISTINCT elements of the two multisets
    (reference ``jaccard_by_kmers``: I, U = |A|+|B|−I, J = I/U)."""
    a = np.unique(np.asarray(fp_a, dtype=np.uint64))
    b = np.unique(np.asarray(fp_b, dtype=np.uint64))
    inter = int(np.intersect1d(a, b, assume_unique=True).shape[0])
    union = int(a.shape[0] + b.shape[0] - inter)
    j = 0.0 if union == 0 else inter / union
    return JaccardStats(inter, union, j, int(a.shape[0]), int(b.shape[0]))


def jaccard_minimizers(hash_a: np.ndarray, hash_b: np.ndarray, w: int) -> JaccardStats:
    """Minimizer-estimated Jaccard (reference ``jaccard_by_minimizers``,
    ``jaccard_correction_test.py:834-852``): winnow both hash sequences,
    Jaccard of the distinct minimizer VALUE sets; zero union → J = 0."""
    va, _ = winnow_minimizers(np.asarray(hash_a, dtype=np.uint64), w)
    vb, _ = winnow_minimizers(np.asarray(hash_b, dtype=np.uint64), w)
    a = np.unique(va)
    b = np.unique(vb)
    inter = int(np.intersect1d(a, b, assume_unique=True).shape[0])
    union = int(a.shape[0] + b.shape[0] - inter)
    j = 0.0 if union == 0 else inter / union
    return JaccardStats(inter, union, j, int(a.shape[0]), int(b.shape[0]))


def jaccard_minimizers_replicates(
    fp_a: np.ndarray,
    fp_b: np.ndarray,
    seeds: np.ndarray,
    hash_type: str,
    k: int,
    w: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-replicate minimizer Jaccard over a seed family — the reference's
    replicate loop (``jaccard_correction_test.py:310-331``) vectorized per
    seed: hash the SAME fingerprints under each replicate seed, winnow, and
    Jaccard the distinct minimizer value sets.

    Returns (I, U, J) arrays of shape (len(seeds),).
    """
    from .kernels import apply_hash

    fa = np.asarray(fp_a, dtype=np.uint64)
    fb = np.asarray(fp_b, dtype=np.uint64)
    n = len(seeds)
    i_arr = np.zeros(n, dtype=np.int64)
    u_arr = np.zeros(n, dtype=np.int64)
    j_arr = np.zeros(n, dtype=np.float64)
    for r, s in enumerate(np.asarray(seeds, dtype=np.uint64)):
        ha = apply_hash(hash_type, int(s), fa, k)
        hb = apply_hash(hash_type, int(s), fb, k)
        st = jaccard_minimizers(ha, hb, w)
        i_arr[r], u_arr[r], j_arr[r] = st.n_intersection, st.n_union, st.jaccard
    return i_arr, u_arr, j_arr
