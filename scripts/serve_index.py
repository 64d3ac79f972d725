"""Standalone query server (spark-submit entry): open an index catalog
and serve hunt-api's HTTP surface — the deployment shape of
hunt-server's `hunt-server -i index` (hunt-cli/src/Hunt/CLI/Command/
Server.hs), with Spark executors fanning out under the driver-side
HTTP frontend.

    spark-submit --master local[N] --py-files hunt_spark.zip \
        scripts/serve_index.py --catalog /path/to/index \
        [--host 127.0.0.1] [--port 3000] [--cache]
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=3000)
    ap.add_argument("--word-limit", type=int, default=0)
    ap.add_argument("--doc-limit", type=int, default=0)
    ap.add_argument(
        "--cache", action="store_true",
        help="pin query-side tables in executor memory (serving mode)",
    )
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("hunt_spark_serve")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # serving: long-lived workers amortize fork+import per query
        .config("spark.python.worker.reuse", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from hunt_spark.engine import HuntEngine
    from hunt_spark.server import HuntServer

    eng = HuntEngine(
        spark, args.catalog,
        word_limit=args.word_limit, doc_limit=args.doc_limit,
    )
    if args.cache:
        eng.cache()
    srv = HuntServer(eng, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{srv.port}", flush=True)
    try:
        srv.httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.httpd.shutdown()
        spark.stop()


if __name__ == "__main__":
    main()
