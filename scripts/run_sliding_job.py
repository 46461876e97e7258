#!/usr/bin/env python3
"""Spark equivalent of the reference's ``sliding_jaccard.py`` CLI.

Scores one query sequence against every sliding query-length window of every
reference sequence: true k-mer Jaccard and winnowed-minimizer Jaccard per
window (parity tested against the reference CLI in tests/test_sliding.py).

  spark-submit --py-files dist/minimizer_jaccard_estimator_spark.zip \
    scripts/run_sliding_job.py query.fa refs.fa[.gz] \
      [--k 16] [--window 100] [--hash minimap2.0] [--canonical] \
      [--minimizers local|global] [--maxlength N] [--head N] \
      [--distribution j_kmer|j_mini] [--inhibit-details] \
      [--out out_dir] [--format tsv|parquet]

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
    # reference sliding_jaccard.py --canonical/--canonicalize/--canon
    ap.add_argument("--canonical", "--canonicalize", "--canon",
                    dest="canonical", action="store_true")
    ap.add_argument("--minimizers", default="local", choices=["local", "global"])
    ap.add_argument("--maxlength", default=None)
    ap.add_argument("--head", default=None)
    ap.add_argument("--distribution", default=None, choices=[None, "j_kmer", "j_mini"])
    # reference --inhibit:details: suppress the per-window J(Q,R)/J(Q,R;w)
    # table, leaving only the --distribution report (the reference then
    # prints nothing to stdout; we do the same when no distribution is asked)
    ap.add_argument("--inhibit-details", "--inhibit:details",
                    dest="inhibit_details", action="store_true")
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
        canonical=args.canonical,
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
    if args.distribution:
        report = jaccard_distribution(details, args.distribution)
    elif args.inhibit_details:
        # reference parity: --inhibit:details with no distribution request
        # reports nothing (the flag exists to silence the big per-window
        # table when only distribution files are wanted)
        print("nothing to report: --inhibit-details without --distribution",
              file=sys.stderr)
        return
    else:
        report = details

    write_report(report, args.out, args.format)


if __name__ == "__main__":
    sys.exit(main())
