"""Paired interleaved micro-bench for individual training-data ops —
the adjudication protocol for cross-round bench regressions on this
drifting-throughput VM (BENCH/BASELINE.md measurement validity note):
each rep times every op back-to-back so all ops in a rep see the same
substrate; the verdict is the median of per-rep RATIOS to a control op,
which cancels the drift.

    python scripts/bench_op_paired.py [--reps 5] [--sf /root/testdata/sf0.1]

Appends one JSON line to BENCH/op_paired_runs.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time

from pyspark.sql import functions as F  # noqa: F401  (parity with bench.py)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=os.cpu_count() or 8)
    args = ap.parse_args()

    import sys

    sys.path.insert(0, REPO)
    from hunt_spark.operators import textops
    from hunt_spark.operators.similarity import cosine_topk
    from hunt_spark.session import get_spark

    spark = get_spark(
        "op_paired", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    docs = spark.read.parquet(f"{args.sf}/documents.parquet").cache()
    docs.count()
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet").cache()
    emb.count()

    ops = {
        # ops under adjudication: simhash (r1 2.20s -> r2 3.22s,
        # r3 1.47s), ngram (r2 7.07s -> r3 9.79s), ann_cosine
        "op_simhash_pairs": lambda: textops.simhash_pairs(docs, 3).count(),
        "op_dedup_ngram": lambda: textops.ngram_jaccard_pairs(docs, 0.8).count(),
        "op_ann_cosine": lambda: cosine_topk(emb, [0, 1, 2, 3, 4], 5).count(),
        # controls: same input frame, same era of code
        "op_dedup_minhash": lambda: textops.minhash_lsh_pairs(docs, 0.8).count(),
        "op_quality": lambda: textops.quality_stats(docs).count(),
    }
    # one untimed warm-up pass (JIT, python workers, shuffle dirs)
    for fn in ops.values():
        fn()

    reps: list[dict[str, float]] = []
    for r in range(args.reps):
        rep = {}
        for name, fn in ops.items():
            t = time.time()
            fn()
            rep[name] = round(time.time() - t, 4)
        reps.append(rep)
        print(f"rep {r + 1}/{args.reps}: {rep}", flush=True)

    med = {k: statistics.median(r[k] for r in reps) for k in ops}
    control = "op_dedup_minhash"
    ratio_med = {
        k: round(
            statistics.median(r[k] / r[control] for r in reps), 3
        )
        for k in ops
        if k != control
    }
    out = {
        "sf": args.sf,
        "cpus": args.cpus,
        "reps": reps,
        "medians": med,
        "control": control,
        "ratio_to_control_median": ratio_med,
        # legacy field kept so earlier ledger lines stay comparable
        "simhash_over_minhash_ratio_median": ratio_med["op_simhash_pairs"],
    }
    print(json.dumps(out))
    ledger = os.path.join(REPO, "BENCH", "op_paired_runs.jsonl")
    os.makedirs(os.path.dirname(ledger), exist_ok=True)
    with open(ledger, "a") as f:
        f.write(json.dumps(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
