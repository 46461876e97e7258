"""Golden parity: our Spark pairwise-analytics operator vs the reference's
PUBLISHED output table (``/root/reference/reproduce/README.md:20-27``) on the
reference's own shipped fixture (``reproduce/sequences/lemon.K=16.R=10%.fa.gz``)
at the exact published config: k=16, w=100, 50 replicates, prng=20210908A,
default minimap2.0 hash.

This pins the whole parity chain end-to-end — FASTA scan, consecutive
pairing, 2-bit packing, seeded minimap2 hashing, seed-family generation,
winnowing, per-replicate averaging, and the D/Jd/C/Bias correction — to the
numbers pasted in the reference repo by its authors.
"""

from __future__ import annotations

import os

import pytest

from minimizer_jaccard_estimator_spark.functions.sketch import SketchConfig
from minimizer_jaccard_estimator_spark.operators.pairwise_analytics import pairwise_report
from minimizer_jaccard_estimator_spark.sources.fasta import consecutive_pairs, read_fasta

LEMON = "/root/reference/reproduce/sequences/lemon.K=16.R=10%.fa.gz"

# reproduce/README.md:22-27 — columns: nameA nameB replicates w k length.nt |a|
# I(A,B) U(A,B) J(A,B)  I(A,B;w) U(A,B;w) J(A,B;w)  D Jd C Bias  J-J  I-C
GOLDEN = [
    # name_a suffix, I, U, J, Ihat, Uhat, Jbar, D, Jd, C, Bias, est_err, corr_err
    ("1", 1714, 18286, 0.093733, 23.160, 373.420, 0.062117, 1687, 0.092120, 22.612257, -0.031567, -0.031616, 0.547743),
    ("2", 1805, 18195, 0.099203, 23.160, 371.780, 0.062371, 1802, 0.099022, 24.096816, -0.034236, -0.036832, -0.936816),
    ("3", 1945, 18055, 0.107726, 25.620, 368.860, 0.069591, 1919, 0.106134, 26.194298, -0.035308, -0.038135, -0.574298),
    ("4", 1921, 18079, 0.106256, 23.960, 369.240, 0.065008, 1901, 0.105033, 25.798101, -0.035354, -0.041248, -1.838101),
    ("5", 1936, 18064, 0.107174, 26.780, 370.340, 0.072444, 1903, 0.105156, 25.606760, -0.036029, -0.034731, 1.173240),
]

CFG = SketchConfig(
    k=16, w=100, hash_type="minimap2", hash_seed=0, mode="dna",
    num_perm=50, prng_seed="20210908A",
    lsh_bands=50,  # unused here; must divide num_perm
)


@pytest.mark.skipif(not os.path.exists(LEMON), reason="reference fixtures absent")
def test_lemon_pairs_match_published_table(spark):
    # the published table shows the first 5 pairs of the 550-pair fixture
    fasta = read_fasta(spark, LEMON).where("seq_idx < 10")
    rows = fasta.orderBy("seq_idx").select("seq_idx", "name").collect()
    assert len(rows) == 10
    assert rows[0]["name"] == "LEMON_L10015_K16_R10%_1_0"
    assert rows[9]["name"] == "LEMON_L10015_K16_R10%_5_1"

    pairs = consecutive_pairs(fasta)
    report = {
        r["name_a"].rsplit("_", 2)[-2]: r
        for r in pairwise_report(pairs, CFG).collect()
    }
    assert len(report) == 5

    for pair_no, i, u, j, ih, uh, jb, d, jd, c, bias, est_err, corr_err in GOLDEN:
        r = report[pair_no]
        assert r["replicates"] == 50 and r["w"] == 100 and r["k"] == 16
        assert r["len_nt"] == 10015 and r["n_hashes"] == 10000
        assert (r["i_exact"], r["u_exact"]) == (i, u)
        assert r["j_exact"] == pytest.approx(j, abs=5e-7)
        # averages printed at 3dp (I, U) and 6dp (J) in the reference report
        assert r["i_mini_avg"] == pytest.approx(ih, abs=5e-4)
        assert r["u_mini_avg"] == pytest.approx(uh, abs=5e-4)
        assert r["j_mini_avg"] == pytest.approx(jb, abs=5e-7)
        assert r["script_d"] == d
        assert r["jaccard_from_d"] == pytest.approx(jd, abs=5e-7)
        assert r["script_c"] == pytest.approx(c, abs=5e-7)
        assert r["bias"] == pytest.approx(bias, abs=5e-7)
        assert r["est_error"] == pytest.approx(est_err, abs=5e-7)
        assert r["corr_error"] == pytest.approx(corr_err, abs=5e-7)
