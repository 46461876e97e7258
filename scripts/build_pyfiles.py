#!/usr/bin/env python3
"""Package the engine for ``spark-submit --py-files``.

Produces ``dist/minimizer_jaccard_estimator_spark.zip`` containing the
library package (no tests, no caches).  Cluster usage:

  spark-submit \
    --py-files dist/minimizer_jaccard_estimator_spark.zip \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.adaptive.skewJoin.enabled=true \
    scripts/run_dedup_job.py --input <iceberg-or-parquet> --output <dir>

The zip import path is identical to the repo layout, so driver scripts only
``import minimizer_jaccard_estimator_spark`` — nothing else changes between
local[32] and a 1000-executor cluster.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "minimizer_jaccard_estimator_spark"


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build())
