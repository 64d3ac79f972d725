"""Query-latency decomposition on a built catalog (spark-submit entry):
per-query cold + warm timings, WAND vs full plan, and the knobs that
matter for a serving process.

    spark-submit --master local[N] scripts/profile_queries.py \
        --catalog /path/idx [--explain q_and]
"""

from __future__ import annotations

import argparse
import json
import statistics
import time

from pyspark.sql import SparkSession


QSET = {
    "q_and": "'the' 'new'",
    "q_or": "'cat' OR 'dog'",
    "q_hot": "'the'",
    "q_phrase": '"new york"',
    "q_prefix": "bra",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-wand", action="store_true")
    ap.add_argument("--cache", action="store_true")
    ap.add_argument("--explain", default=None)
    args = ap.parse_args()

    b = (
        SparkSession.builder.appName("profile_queries")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from hunt_spark.engine import HuntEngine

    eng = HuntEngine(spark, args.catalog)
    out: dict = {"cores": args.cores}
    use_wand = False if args.no_wand else "auto"

    t0 = time.time()
    eng.compiler()
    out["compiler_init"] = round(time.time() - t0, 2)
    if args.cache:
        t0 = time.time()
        eng.cache()
        out["cache_pin"] = round(time.time() - t0, 2)

    cold, warm = {}, {}
    for name, q in QSET.items():
        t0 = time.time()
        eng.search(q, k=10, use_wand=use_wand).collect()
        cold[name] = round(time.time() - t0, 3)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            eng.search(q, k=10, use_wand=use_wand).collect()
            ts.append(time.time() - t0)
        warm[name] = round(statistics.median(ts), 3)
        print(f"  {name}: cold {cold[name]} warm {warm[name]}", flush=True)
    out["cold"], out["warm"] = cold, warm

    if args.explain:
        eng.search(QSET[args.explain], k=10, use_wand=use_wand).explain(
            "formatted"
        )

    print("QPROFILE " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
