"""Capture .explain('formatted') for the bench ops (and the engine
queries) into plans/<outdir>/<name>_<tag>.txt.

Usage:
  PYTHONPATH=<repo-root> python scripts/capture_plans.py <outdir> <tag> [name ...]

Run once with the round-start tree on PYTHONPATH (tag=before) and once
with the current tree (tag=after); the judge compares plan shapes
against OPTIMIZATION_r06.md claims.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F


def main() -> None:
    outdir, tag = sys.argv[1], sys.argv[2]
    wanted = sys.argv[3:] or None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from hunt_spark.operators import textops, urlops
    from hunt_spark.operators.similarity import cosine_topk
    from hunt_spark.session import get_spark

    spark = get_spark("plan_capture", shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    ops = {
        "op_dedup_ngram": lambda: textops.ngram_jaccard_pairs(docs, 0.8),
        "op_dedup_minhash": lambda: textops.minhash_lsh_pairs(docs, 0.8),
        "op_simhash_pairs": lambda: textops.simhash_pairs(docs, 3),
        "op_quality": lambda: textops.quality_stats(docs),
        "op_pii_scan": lambda: textops.pii_scan(docs),
        "op_ann_cosine": lambda: cosine_topk(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"), [0, 1, 2, 3, 4], 5
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
        "txt_langid": lambda: textops.langid(docs),
    }
    os.makedirs(outdir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, fn in ops.items():
        if wanted and name not in wanted:
            continue
        df = fn()
        plan = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{tag}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
