"""Bias-correction parity: our vectorized correction kernel vs the reference
``jaccard_correction`` run directly on the same hash sequences."""

from __future__ import annotations

import random

import numpy as np
import pytest

import jaccard_correction_test as ref_mod
from minimizer_jaccard_estimator_spark import correction as C
from minimizer_jaccard_estimator_spark import kernels as K
from minimizer_jaccard_estimator_spark import pairwise as P
from tests.conftest import mutate_dna, random_dna

ref_mod.debug = []  # module global normally set in main()


def _ref_correction(hash_a, hash_b, w):
    ref_mod.tVal = None  # reference caches tVal per w; reset between configs
    return ref_mod.jaccard_correction("A", tuple(int(x) for x in hash_a),
                                      "B", tuple(int(x) for x in hash_b), w)


def _dupfree_pair(seed: int, n: int, k: int, rate: float):
    """Random DNA pair (mutated copy) whose hash sequences are duplicate-free
    under minimap2 seed 0 (rejection-sampled), same length."""
    rng = random.Random(seed)
    while True:
        a = random_dna(rng, n)
        b = mutate_dna(rng, a, rate)
        ha = K.hash_dna_sequence(a, k, "minimap2", 0)
        hb = K.hash_dna_sequence(b, k, "minimap2", 0)
        if (np.unique(ha).size == ha.size) and (np.unique(hb).size == hb.size):
            return a, b, ha, hb


@pytest.mark.parametrize("w,n,rate", [(5, 80, 0.05), (8, 200, 0.02), (20, 400, 0.1), (12, 300, 0.0)])
def test_correction_parity_random_pairs(w, n, rate):
    a, b, ha, hb = _dupfree_pair(1000 + w, n, 16, rate)
    ours = C.jaccard_correction(ha, hb, w)
    ref = _ref_correction(ha, hb, w)
    assert ours.script_d == ref.scriptD
    assert ours.jaccard_from_d == pytest.approx(ref.jaccardFromD, abs=1e-12)
    assert ours.script_c == pytest.approx(ref.scriptC, rel=1e-9)
    assert ours.bias == pytest.approx(ref.bias, rel=1e-9, abs=1e-12)


@pytest.mark.parametrize("w", [4, 7])
def test_configuration_counts_parity_full_tensor(w):
    a, b, ha, hb = _dupfree_pair(77 + w, 120, 12, 0.08)
    ours = C.configuration_counts(ha, hb, w)
    ref = _ref_correction(ha, hb, w)
    ref_counts = {}
    for s, per in ref.nConfigurations.items():
        for cfg, cnt in per.items():
            if cnt:
                ref_counts[(s, *cfg)] = cnt
    assert ours == ref_counts


def test_position_map_parity_and_duplicate_detection():
    a, b, ha, hb = _dupfree_pair(5, 150, 14, 0.05)
    ours = C.position_map(ha, hb)
    ref_map = ref_mod.shared_hash_positions(tuple(int(x) for x in ha), tuple(int(x) for x in hb))
    expect = np.full(ha.size, -1, dtype=np.int64)
    for ap, bp in ref_map.items():
        expect[ap] = bp
    assert np.array_equal(ours, expect)
    with pytest.raises(C.DuplicateHashError):
        C.position_map(np.array([1, 2, 1], dtype=np.uint64), np.array([3], dtype=np.uint64))


def test_identical_pair_bias_zero_ish():
    """A vs A: every window pair on the diagonal shares everything; sanity
    bounds rather than exact values."""
    _, _, ha, _ = _dupfree_pair(9, 150, 16, 0.0)
    ours = C.jaccard_correction(ha, ha, 10)
    ref = _ref_correction(ha, ha, 10)
    # A vs A: car==0 & cbr==0 only on the diagonal -> scriptD = L - w
    assert ours.script_d == ref.scriptD == ha.size - 10
    assert ours.script_c == pytest.approx(ref.scriptC, rel=1e-9)


def test_pairwise_jaccard_matches_reference_functions():
    rng = random.Random(11)
    a = random_dna(rng, 500)
    b = mutate_dna(rng, a, 0.05)
    k, w = 16, 10
    kd = ref_mod.jaccard_by_kmers(a, b, k)
    ours = P.jaccard_exact(K.pack_kmers_2bit(a, k), K.pack_kmers_2bit(b, k))
    assert (ours.n_intersection, ours.n_union) == (kd.nIntersection, kd.nUnion)
    assert ours.jaccard == pytest.approx(kd.jaccard)

    ha = K.hash_dna_sequence(a, k, "minimap2", 0)
    hb = K.hash_dna_sequence(b, k, "minimap2", 0)
    md = ref_mod.jaccard_by_minimizers(
        tuple(int(x) for x in ha), tuple(int(x) for x in hb), w, ref_mod.winnowed_minimizers_linear
    )
    ours_m = P.jaccard_minimizers(ha, hb, w)
    assert (ours_m.n_intersection, ours_m.n_union) == (md.nIntersection, md.nUnion)
    assert ours_m.jaccard == pytest.approx(md.jaccard)
    assert (ours_m.n_a, ours_m.n_b) == (md.nMinimizersA, md.nMinimizersB)
