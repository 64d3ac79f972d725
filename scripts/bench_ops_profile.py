"""Per-op profiling harness for the optimization round (guide §1).

Times individual bench ops in isolation (same .count() methodology as
bench.py) at an arbitrary SF dir, prints one JSON line per op, and can
dump .explain('formatted') per op. Does NOT replace bench.py (frozen);
numbers here are for optimization work, cited in OPTIMIZATION_r06.md.

Usage:
  python scripts/bench_ops_profile.py [op ...]        # default: all
  HUNT_PROFILE_EXPLAIN=1 ... to dump plans to plans/r06/<op>_profile.txt
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from hunt_spark.operators import textops, urlops
from hunt_spark.operators.similarity import cosine_topk
from hunt_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("HUNT_PROFILE_REPS", "1"))
EXPLAIN = os.environ.get("HUNT_PROFILE_EXPLAIN", "")


def main() -> None:
    spark = get_spark("hunt_profile", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    ops = {
        "op_dedup_ngram": lambda: textops.ngram_jaccard_pairs(docs, 0.8),
        "op_dedup_minhash": lambda: textops.minhash_lsh_pairs(docs, 0.8),
        "op_simhash_pairs": lambda: textops.simhash_pairs(docs, 3),
        "op_quality": lambda: textops.quality_stats(docs),
        "op_pii_scan": lambda: textops.pii_scan(docs),
        "op_ann_cosine": lambda: cosine_topk(
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), [0, 1, 2, 3, 4], 5
        ),
        "op_repetition": lambda: textops.repetition_stats(docs),
        "op_contamination": lambda: textops.contamination(
            docs, docs.filter(F.col("doc_id") % 97 == 0)
        ),
        "op_curate": lambda: textops.curate(
            docs, rates={"en": 0.5, "zh": 0.1}, default_rate=0.25
        ),
        "op_dup_spans": lambda: textops.dup_spans(docs, k=20),
        "op_line_dedup": lambda: textops.line_dedup(
            entry_mod._multiline_docs(docs), min_dup_count=4
        ),
        "op_domain_cap": lambda: urlops.domain_cap(
            docs.select(
                "doc_id",
                F.concat(
                    F.lit("HTTP://WWW.h"),
                    (F.col("doc_id") % 199).cast("string"),
                    F.lit(".Example.COM:80/p/"),
                    F.col("doc_id").cast("string"),
                    F.lit("?utm_s=1&k=2#f"),
                ).alias("url"),
            ),
            cap=10,
        ),
    }
    wanted = sys.argv[1:] or list(ops)
    for name in wanted:
        fn = ops[name]
        if EXPLAIN:
            os.makedirs("plans/r06", exist_ok=True)
            plan = fn()._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(f"plans/r06/{name}_profile.txt", "w") as fh:
                fh.write(plan)
        for rep in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t = time.time()
            n = fn().count()
            dt = time.time() - t
            print(json.dumps({"op": name, "rep": rep, "sec": round(dt, 3), "rows": n}), flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
