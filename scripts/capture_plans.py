#!/usr/bin/env python3
"""Dump .explain('formatted') for declared queries into plans/r06/.

Usage: python scripts/capture_plans.py <suffix> [query,query,...]
e.g.   python scripts/capture_plans.py before ngram_jaccard,j1_pair_zip_join
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from minimizer_jaccard_estimator_spark.plans.session import get_spark  # noqa: E402

DEFAULT = [
    "ngram_jaccard", "j1_pair_zip_join", "j3_word_jaccard",
    "a1_multiset_count", "join_agg_revenue", "token_count",
    "events_window", "minhash_lsh_candidates",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="mje-capture-plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entry_mod.queries()
    for name in names:
        df = qmap[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
