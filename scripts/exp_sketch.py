#!/usr/bin/env python3
"""One-off experiment: sketch-stage wall at one parallelism level with
tunable partition multiple / Arrow batch size (tail-quantization study)."""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cpus = int(sys.argv[1])
partmult = int(sys.argv[2]) if len(sys.argv) > 2 else 2
batch = int(sys.argv[3]) if len(sys.argv) > 3 else 2048

workers = max(cpus // 4, 1)
os.environ["PYSPARK_SUBMIT_ARGS"] = (
    f"--master local-cluster[{workers},4,6144] pyspark-shell")

import pyspark.sql.functions as F  # noqa: E402
from minimizer_jaccard_estimator_spark.functions.sketch import (  # noqa: E402
    SketchConfig, add_full_sketch)
from minimizer_jaccard_estimator_spark.plans.session import get_spark  # noqa: E402
from minimizer_jaccard_estimator_spark.sources.transcripts import (  # noqa: E402
    assemble_conversations, synthetic_transcripts)

cfg = SketchConfig(k=12, w=20, hash_type="splitmix64", hash_seed=0,
                   num_perm=128, lsh_bands=32, minhash_scheme="seeded")
spark = get_spark(app_name=f"exp-{cpus}", cpus=cpus, extra_conf={
    "spark.executor.memory": "5120m",
    "spark.executorEnv.PYTHONPATH": REPO,
    "spark.sql.execution.arrow.maxRecordsPerBatch": str(batch),
})
spark.sparkContext.setLogLevel("ERROR")
tr = synthetic_transcripts(spark, n_base=20000, dup_factor=2, seed=42,
                           turns_min=4, turns_max=16, words_per_turn=80,
                           partitions=cpus * 4).persist()
tr.count()
conv = assemble_conversations(tr).select("conv_id", "text") \
    .repartition(cpus * partmult).persist()
conv.count()
walls = []
for rep in range(3):
    t0 = time.monotonic()
    sk = add_full_sketch(conv, cfg)
    n = sk.agg(F.sum(F.size("minimizers"))).collect()[0][0]
    walls.append(round(time.monotonic() - t0, 2))
print(json.dumps({"cpus": cpus, "partmult": partmult, "batch": batch,
                  "walls": walls, "min": min(walls), "n_minis": int(n)}))
spark.stop()
