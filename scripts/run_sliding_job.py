#!/usr/bin/env python3
"""Spark equivalent of the reference's ``sliding_jaccard.py`` CLI.

Scores one query sequence against every sliding query-length window of every
reference sequence: true k-mer Jaccard and winnowed-minimizer Jaccard per
window (parity tested against the reference CLI in tests/test_sliding.py).

  spark-submit --py-files dist/minimizer_jaccard_estimator_spark.zip \
    scripts/run_sliding_job.py query.fa refs.fa[.gz] \
      [--k 16] [--window 100] [--hash minimap2.0] \
      [--minimizers local|global] [--maxlength N] [--head N] \
      [--distribution j_kmer|j_mini] [--out out_dir] [--format tsv|parquet]

--distribution replaces the per-window report with the reference's bucketed
histogram of the chosen column (Δ=0.01 bucket rule).
"""

from __future__ import annotations

import argparse
import os
import sys

# local-run convenience: put the repo root on sys.path (spark-submit users
# get the package from --py-files instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))




def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("refs")
    ap.add_argument("--k", default="16")
    ap.add_argument("--window", "-w", default="100")
    ap.add_argument("--hash", dest="hash_spec", default="minimap2.0")
    ap.add_argument("--minimizers", default="local", choices=["local", "global"])
    ap.add_argument("--maxlength", default=None)
    ap.add_argument("--head", default=None)
    ap.add_argument("--distribution", default=None, choices=[None, "j_kmer", "j_mini"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--format", default="tsv", choices=["tsv", "parquet"])
    args = ap.parse_args()

    from minimizer_jaccard_estimator_spark.functions.sketch import SketchConfig
    from minimizer_jaccard_estimator_spark.operators.sliding import (
        jaccard_distribution,
        sliding_jaccard,
    )
    from minimizer_jaccard_estimator_spark.sources.fasta import read_fasta
    from minimizer_jaccard_estimator_spark.util import int_with_unit, parse_hash_spec, write_report

    from minimizer_jaccard_estimator_spark.plans.session import get_spark
    spark = get_spark(app_name="mje-sliding")
    hash_type, seed = parse_hash_spec(args.hash_spec)
    cfg = SketchConfig(
        k=int_with_unit(args.k), w=int_with_unit(args.window),
        hash_type=hash_type, hash_seed=seed, mode="dna",
        num_perm=1, lsh_bands=1,
    )

    q = read_fasta(spark, args.query).collect()
    assert len(q) == 1, "query file must contain exactly one sequence"
    refs = read_fasta(spark, args.refs)
    if args.head:
        refs = refs.orderBy("seq_idx").limit(int_with_unit(args.head))

    details = sliding_jaccard(
        refs, q[0]["name"], q[0]["seq"], cfg,
        minimizer_mode=args.minimizers,
        max_length=int_with_unit(args.maxlength) if args.maxlength else None,
    )
    report = (
        jaccard_distribution(details, args.distribution)
        if args.distribution
        else details
    )

    write_report(report, args.out, args.format)


if __name__ == "__main__":
    sys.exit(main())
