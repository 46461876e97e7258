#!/usr/bin/env python3
"""Spark equivalent of the reference's ``jaccard_correction_test.py`` CLI.

Scores FASTA sequence pairs: exact Jaccard, replicate-averaged minimizer
estimate, and (invertible, duplicate-free hash configs) the D/C/Bias
correction analytics — same numbers as the reference at the same
k/w/hash/seed/prng config (golden-parity tested in tests/).

  spark-submit --py-files dist/minimizer_jaccard_estimator_spark.zip \
    scripts/run_pairwise_job.py seqs.fa[.gz] \
      [--pairs other.fa]        # zip two files positionally (reference 2-file mode)
      [--k 16] [--window 100] [--hash minimap2.0] [--canonical] \
      [--replicates 50] [--prng 20210908A] \
      [--inhibit-correction] [--report-replicates] [--report-configs] \
      [--check-duplicates] [--correction-version v0.6|v0.4] [--debug-0.3.0] \
      [--head N] [--out out_dir] [--format tsv|parquet]

One-file mode pairs consecutive sequences (1,2),(3,4),… like the reference.
Output goes to --out as TSV (tab-separated, header) or parquet; without
--out the report prints to stdout.

Reference-flag mapping: --report-configs = --report:configs (long-form
config-count rows; add -wide for the reference's 17x(w+1) column layout);
--check-duplicates = --debug=checkduplicates (corpus
duplicate-freeness validation, one row per sequence); --correction-version
v0.4 = the frozen ``jaccard_correction_test_v_0_4.py`` scriptC formulas;
--debug-0.3.0 = its --debug=0.3.0 omitted-term toggle.
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
    ap.add_argument("fasta")
    ap.add_argument("--pairs", default=None, help="second FASTA for zipped pairing")
    ap.add_argument("--k", default="16")
    ap.add_argument("--window", "-w", default="100")
    ap.add_argument("--hash", dest="hash_spec", default="minimap2.0")
    # reference jaccard_correction_test.py --canonical/--canonicalize/--canon:
    # treat reverse-complemented kmers as equivalent (min of the two 2-bit
    # packings); accepted under all three reference spellings
    ap.add_argument("--canonical", "--canonicalize", "--canon",
                    dest="canonical", action="store_true")
    ap.add_argument("--replicates", default="1")
    ap.add_argument("--prng", default="20210908A")
    ap.add_argument("--inhibit-correction", action="store_true")
    ap.add_argument("--report-replicates", action="store_true")
    ap.add_argument("--report-duplicates", action="store_true",
                    help="reference --report:duplicates (n_dups_a/n_dups_b columns)")
    ap.add_argument("--report-configs", action="store_true",
                    help="reference --report:configs (long-form rows)")
    ap.add_argument("--report-configs-wide", action="store_true",
                    help="reference --report:configs WIDE layout: 17x(w+1) "
                         "N(cal,car;cbl,cbr;s) columns in the reference's "
                         "exact header order")
    ap.add_argument("--check-duplicates", action="store_true",
                    help="reference --debug=checkduplicates: per-sequence "
                         "duplicate-freeness report instead of pair scoring")
    ap.add_argument("--correction-version", default="v0.6", choices=["v0.6", "v0.4"])
    ap.add_argument("--debug-0.3.0", dest="debug_030", action="store_true",
                    help="v0.4's --debug=0.3.0 omitted-term toggle")
    ap.add_argument("--head", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--format", default="tsv", choices=["tsv", "parquet"])
    args = ap.parse_args()

    from minimizer_jaccard_estimator_spark.functions.sketch import SketchConfig
    from minimizer_jaccard_estimator_spark.operators.pairwise_analytics import (
        check_duplicates,
        config_report,
        config_report_wide,
        pairwise_report,
        replicate_report,
    )
    from minimizer_jaccard_estimator_spark.sources.fasta import (
        consecutive_pairs,
        read_fasta,
        zipped_pairs,
    )
    from minimizer_jaccard_estimator_spark.util import int_with_unit, parse_hash_spec, write_report

    from minimizer_jaccard_estimator_spark.plans.session import get_spark
    spark = get_spark(app_name="mje-pairwise")
    hash_type, seed = parse_hash_spec(args.hash_spec)
    cfg = SketchConfig(
        k=int_with_unit(args.k), w=int_with_unit(args.window),
        hash_type=hash_type, hash_seed=seed, mode="dna",
        canonical=args.canonical,
        num_perm=int_with_unit(args.replicates), prng_seed=args.prng,
        lsh_bands=1,
    )

    fa = read_fasta(spark, args.fasta)
    if args.check_duplicates:
        docs = fa.select("name", fa["seq"].alias("text"))
        if args.head:
            docs = docs.limit(int_with_unit(args.head) * 2)
        write_report(check_duplicates(docs, cfg), args.out, args.format)
        return

    if args.pairs:
        pairs = zipped_pairs(fa, read_fasta(spark, args.pairs))
    else:
        pairs = consecutive_pairs(fa)
    if args.head:
        pairs = pairs.orderBy("pair_id").limit(int_with_unit(args.head))

    if args.report_replicates:
        report = replicate_report(pairs, cfg)
    elif args.report_configs_wide:
        report = config_report_wide(pairs, cfg)
    elif args.report_configs:
        report = config_report(pairs, cfg)
    else:
        report = pairwise_report(
            pairs, cfg,
            correction="off" if args.inhibit_correction else "auto",
            correction_version=args.correction_version,
            omit_0_3_0_term=args.debug_030,
            report_duplicates=args.report_duplicates,
        )

    write_report(report, args.out, args.format)


if __name__ == "__main__":
    sys.exit(main())
