"""One-cold-pass scale smoke for the urlops surface at 200k docs —
the same protocol as the r5 pipeline-op smoke (BENCH/BASELINE.md):
confirm the operator shapes hold two orders of magnitude above the
sf0.1 gate corpus and that the hot-host claims are evidenced, not
asserted.

Layout is deliberately adversarial for the domain cap: 50% of all
rows land on ONE host (example.org), the rest spread over 997 hosts —
the map-side top-k combiner must prune the 100k-row hot host to
<= cap rows per partition before the exact window ever sees it.
url_dedup gets 4 messy spellings per canonical URL (50k groups).

    python scripts/bench_urlops_smoke.py [--n 200000] [--cpus 32]

Appends one JSON line to BENCH/urlops_smoke.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=os.cpu_count() or 8)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from hunt_spark.operators import urlops
    from hunt_spark.session import get_spark
    from hunt_spark.sources.corpus import corpus_df

    spark = get_spark(
        "urlops_smoke", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    base = corpus_df(spark, args.n).select(
        F.xxhash64("url").alias("doc_id"),
        F.length("text").alias("n_chars"),
        F.monotonically_increasing_id().alias("seq"),
    )
    i = F.crc32(F.col("doc_id").cast("string"))  # spread derivation key
    host = F.when(i % 2 == 0, F.lit("example.org")).otherwise(
        F.concat(F.lit("h"), (i % 997).cast("string"), F.lit(".example.org"))
    )
    messy = F.concat(
        F.when(i % 3 == 0, F.lit("HTTP://WWW.")).otherwise(F.lit("http://")),
        host,
        F.when(i % 5 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/p/"),
        (i % 50_000).cast("string"),
        F.when(i % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(i % 11 == 0, F.lit("?utm_s=1&k=2")).otherwise(F.lit("")),
        F.when(i % 13 == 0, F.lit("#f")).otherwise(F.lit("")),
    )
    docs = base.select("doc_id", "n_chars", messy.alias("url")).cache()
    n = docs.count()

    results: dict[str, dict[str, float | int]] = {}

    def run(name: str, fn) -> None:
        t0 = time.time()
        rows = fn()
        wall = time.time() - t0
        results[name] = {
            "rows_out": rows,
            "wall_s": round(wall, 2),
            "docs_per_s": round(n / wall),
        }
        print(f"{name}: {rows} rows, {wall:.2f}s, {round(n / wall)} docs/s")

    run(
        "canonicalize",
        lambda: docs.select(
            urlops.canonicalize_url(F.col("url")).alias("c")
        ).count(),
    )
    run("url_dedup", lambda: urlops.url_dedup(docs, quality_col="n_chars").count())
    run(
        "url_filter",
        lambda: urlops.url_filter(
            docs,
            blocked_hosts=[f"h{k}.example.org" for k in range(0, 997, 2)],
            banned_patterns=["utm_s", "/p/1[0-9]{3}$"],
            max_score=0,
        ).count(),
    )
    cap = 100
    run("domain_cap", lambda: urlops.domain_cap(docs, cap=cap).count())
    # hot-host evidence: the 50%-of-corpus host kept exactly cap rows
    kept_hot = (
        urlops.domain_cap(docs, cap=cap)
        .filter(F.col("host") == "example.org")
        .count()
    )
    hot_rows = docs.filter(
        urlops.host_of(F.col("url")) == "example.org"
    ).count()
    assert kept_hot == cap, (kept_hot, cap)
    print(f"hot host: {hot_rows} rows in -> {kept_hot} kept (cap {cap})")

    out = {
        "n_docs": n,
        "cpus": args.cpus,
        "cap": cap,
        "hot_host_rows_in": hot_rows,
        "hot_host_rows_kept": kept_hot,
        "ops": results,
    }
    with open(os.path.join(REPO, "BENCH", "urlops_smoke.json"), "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
