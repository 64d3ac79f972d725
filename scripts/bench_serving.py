"""Serving-throughput benchmark: concurrent HTTP queries against a
built catalog through hunt_spark.server (spark-submit entry).

Measures QPS + latency percentiles at increasing client concurrency —
the serving dimension of the north rule's query criterion (a deployed
frontend answers many BM25 top-k queries at once; Spark's scheduler
interleaves the per-query jobs across executor slots).

    spark-submit --master local[N] scripts/bench_serving.py \
        --catalog /path/idx [--concurrency 1,4,16] [--n-queries 64]
"""

from __future__ import annotations

import argparse
import itertools
import json
import statistics
import time
import urllib.parse
import urllib.request
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import SparkSession

QUERIES = [
    "'the' 'new'",
    "'cat' OR 'dog'",
    "'the'",
    '"new york"',
    "bra",
    "'spark' OR 'table'",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--concurrency", default="1,4,16")
    ap.add_argument("--n-queries", type=int, default=64)
    ap.add_argument("--cache", action="store_true")
    ap.add_argument(
        "--start-at", type=float, default=0.0,
        help="epoch seconds to wait for before the measured loop — the "
        "fleet orchestrator (bench_serving_fleet.py) aligns several "
        "frontends on one barrier so their throughputs overlap and sum",
    )
    ap.add_argument(
        "--record", default=None,
        help="write the result JSON here (e.g. BENCH/serving_single.json) "
        "so bench_scaling.py renders it into BENCH/BASELINE.md",
    )
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("bench_serving")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.python.worker.reuse", "true")
        # FAIR scheduling: concurrent query jobs share executor slots
        # instead of queueing FIFO behind each other's full stages
        .config("spark.scheduler.mode", "FAIR")
        # top-k queries shuffle tiny aggregates; the 200-partition
        # default just multiplies per-task scheduling overhead
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hunt_spark.engine import HuntEngine
    from hunt_spark.server import HuntServer

    eng = HuntEngine(spark, args.catalog)
    if args.cache:
        eng.cache()
    srv = HuntServer(eng).start()
    base = f"http://127.0.0.1:{srv.port}"

    def one(q: str) -> float:
        t0 = time.time()
        with urllib.request.urlopen(
            f"{base}/search/{urllib.parse.quote(q, safe='')}?limit=10"
        ) as r:
            r.read()
        return time.time() - t0

    one(QUERIES[0])  # warm: engine caches stats, JIT, page cache
    if args.start_at:
        delay = args.start_at - time.time()
        if delay > 0:
            time.sleep(delay)

    out = {"levels": {}}
    for c in (int(x) for x in args.concurrency.split(",")):
        qs = list(itertools.islice(itertools.cycle(QUERIES), args.n_queries))
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=c) as ex:
            lats = list(ex.map(one, qs))
        wall = time.time() - t0
        lats.sort()
        out["levels"][str(c)] = {
            "qps": round(len(qs) / wall, 2),
            "p50_s": round(statistics.median(lats), 3),
            "p95_s": round(lats[max(0, int(0.95 * len(lats)) - 1)], 3),
            "wall_s": round(wall, 2),
        }
        print(f"  c={c}: qps={out['levels'][str(c)]['qps']} "
              f"p50={out['levels'][str(c)]['p50_s']} "
              f"p95={out['levels'][str(c)]['p95_s']}", flush=True)

    print("SERVING " + json.dumps(out))
    if args.record:
        with open(args.record, "w") as f:
            json.dump(out, f)
    srv.shutdown()
    spark.stop()


if __name__ == "__main__":
    main()
