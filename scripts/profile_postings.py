"""Decompose the postings stage's N-vs-4N scaling (spark-submit entry).

Sub-phases, each timed separately on the same corpus:

  scan      — parquet scan + JVM tokenize + F.size filter, count() only
  invert    — scan + mapInArrow inversion kernel, count() only
  shuffle   — invert + repartition(context, shard, salt), count()
  write     — full stage: shuffle + sortWithinPartitions + parquet write

    spark-submit --master local[N] scripts/profile_postings.py \
        --input /tmp/hunt_bench_corpus --cores N [--from-html]
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--n-shards", type=int, default=32)
    ap.add_argument("--salt-buckets", type=int, default=4)
    ap.add_argument("--from-html", action="store_true")
    ap.add_argument("--phases", default="scan,invert,shuffle,write")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("profile_postings")
        .config("spark.sql.shuffle.partitions", str(2 * args.cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from hunt_spark.functions.analysis import extract_text_udf, tokenize_col
    from hunt_spark.operators.build import BuildConfig, _invert_arrow

    cfg = BuildConfig(
        n_shards=args.n_shards,
        salt_buckets=args.salt_buckets,
        extract_html=args.from_html,
    )
    docs = spark.read.parquet(args.input).withColumn(
        "doc_id", F.xxhash64("url")
    )
    src = docs.select(
        "doc_id",
        F.lit("text").alias("context"),
        (F.col("html") if args.from_html else F.col("text")).alias("text"),
    )
    if args.from_html:
        src = src.withColumn("text", extract_text_udf("text"))

    tokenized = (
        src.withColumn("toks", tokenize_col(F.col("text")))
        .withColumn("dl", F.size("toks").cast("int"))
        .filter(F.col("dl") > 0)
        .select("doc_id", "context", "toks", "dl")
    )

    out: dict[str, float] = {"cores": args.cores}
    phases = args.phases.split(",")

    def timed(name, fn):
        # a trailing digit repeats a phase: "invert,invert2" runs the
        # same job twice to expose JVM warm-up (JIT/heap growth) costs
        base = name.rstrip("0123456789")
        for p in phases:
            if p.rstrip("0123456789") != base:
                continue
            t0 = time.time()
            fn()
            out[p] = round(time.time() - t0, 2)
            print(f"  {p}: {out[p]}s", flush=True)

    timed("scan", lambda: tokenized.count())

    inv = _invert_arrow(tokenized)
    timed("invert", lambda: inv.count())

    posted = inv.withColumn("term_lc", F.lower("term")).withColumn(
        "shard", F.pmod(F.xxhash64("term_lc"), F.lit(cfg.n_shards)).cast("int")
    )
    salt = F.pmod(F.col("doc_id"), F.lit(cfg.salt_buckets))
    laid = posted.repartition(F.col("context"), F.col("shard"), salt)
    timed("shuffle", lambda: laid.count())

    def do_write():
        d = tempfile.mkdtemp(prefix=f"prof_post_{args.cores}_", dir="/dev/shm")
        (
            laid.sortWithinPartitions("term_lc", "doc_id")
            .write.mode("overwrite")
            .partitionBy("context", "shard")
            .parquet(d + "/postings")
        )

    timed("write", do_write)

    print("PROFILE " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
