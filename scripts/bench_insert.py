"""Micro-bench: insert-time stats maintenance, incremental vs full,
as a function of CORPUS size.

The incremental path's claim is asymptotic: a full `_refresh_stats()`
rescans ALL postings (O(corpus)) on every insert, while the merge path
touches only the batch plus the vocab-sized stats artifacts
(O(batch + vocab)). This bench isolates the REFRESH STEP (the rest of
insert — URI validation + the batch postings/meta commits — is common
to both paths) and drives the corpus axis: the same BATCH-doc insert
is timed on a 1x corpus and on a Kx replicated corpus (same text under
fresh doc ids — vocabulary constant, postings volume Kx). The full
path must grow roughly with K; the incremental path must stay ~flat.
That slope pair — not a single-point speedup — is the 10^12-doc
evidence.

Runs are interleaved inc/full x N_REPS (this box's throughput drifts
several x between minutes; medians of interleaved reps are the house
protocol, BENCH/BASELINE.md). Prints one JSON line per corpus size and
appends each to BENCH/insert_runs.jsonl.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hunt_spark.engine import HuntEngine  # noqa: E402
from hunt_spark.operators.build import BuildConfig  # noqa: E402
from hunt_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
BATCH = int(os.environ.get("HUNT_INSERT_BATCH", "100"))
MULTS = [int(x) for x in os.environ.get("HUNT_INSERT_MULTS", "1,10").split(",")]
N_REPS = int(os.environ.get("HUNT_INSERT_REPS", "3"))


def main() -> None:
    spark = get_spark(
        "hunt_insert_bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ledger = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "insert_runs.jsonl",
    )
    for mult in MULTS:
        docs = base
        if mult > 1:
            # replicate by doc_id shift: same text (vocab constant),
            # distinct doc identities (postings volume x mult)
            docs = base.crossJoin(
                spark.range(mult).select(F.col("id").alias("rep"))
            ).select(
                (F.col("doc_id") + F.col("rep") * 100_000_000).alias("doc_id"),
                "text",
            )
        n_docs = docs.count()
        root = tempfile.mkdtemp(prefix=f"hunt_insert_bench_x{mult}_")
        eng = HuntEngine(
            spark, root, BuildConfig(n_shards=max(8, CPUS), salt_buckets=4)
        )
        eng.build(docs, {"text": F.col("text")}, build_id="ib", resume=False)

        refresh_t = {"inc": [], "full": []}
        orig_inc = HuntEngine._refresh_stats_incremental
        orig_full = HuntEngine._refresh_stats

        def timed_inc(self, p):
            t = time.time()
            orig_inc(self, p)
            refresh_t["inc"].append(time.time() - t)

        def timed_full(self):
            t = time.time()
            orig_full(self)
            refresh_t["full"].append(time.time() - t)

        HuntEngine._refresh_stats_incremental = timed_inc
        HuntEngine._refresh_stats = timed_full
        try:
            seq = 0
            for _rep in range(N_REPS):
                for mode in ("inc", "full"):
                    batch = (
                        base.orderBy("doc_id")
                        .limit(BATCH)
                        .select(
                            F.concat(
                                F.lit(f"https://bench.invalid/{mult}/{seq}/"),
                                F.col("doc_id"),
                            ).alias("url"),
                            "text",
                        )
                    )
                    seq += 1
                    if mode == "full":
                        real = eng._stats_fresh
                        eng._stats_fresh = lambda: False
                        eng.insert(batch, {"text": F.col("text")})
                        eng._stats_fresh = real
                    else:
                        eng.insert(batch, {"text": F.col("text")})
        finally:
            HuntEngine._refresh_stats_incremental = orig_inc
            HuntEngine._refresh_stats = orig_full

        out = {
            "metric": "insert_stats_refresh",
            "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
            "cpus": CPUS,
            "corpus_mult": mult,
            "corpus_docs": n_docs,
            "batch_docs": BATCH,
            "reps": N_REPS,
            "incremental_sec": round(statistics.median(refresh_t["inc"]), 3),
            "full_sec": round(statistics.median(refresh_t["full"]), 3),
            "inc_all": [round(x, 3) for x in refresh_t["inc"]],
            "full_all": [round(x, 3) for x in refresh_t["full"]],
            "speedup": round(
                statistics.median(refresh_t["full"])
                / statistics.median(refresh_t["inc"]),
                2,
            ),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        print(json.dumps(out))
        with open(ledger, "a") as f:
            f.write(json.dumps(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
