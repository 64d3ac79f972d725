"""Micro-probes isolating WHERE the Python/Arrow boundary loses
scaling on this box (spark-submit entry; run at two --master sizes and
compare per-probe walls).

  alu     mapInArrow kernel doing pure numpy ALU on tiny rows
          -> measures worker infrastructure (spawn, socket, loop)
  ship    JVM tokenizes, ships list<string> to Python, kernel counts
          -> measures JVM->Arrow serialize + Python parse
  kernel  ship + the full inversion kernel, returns 1 row per batch
          -> adds kernel compute, no output shipping
  out     full inversion shipped back to the JVM, count()
          -> adds Python->JVM Arrow output path
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import pyarrow as pa

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--probes", default="alu,ship,kernel,out")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("probe_scaling")
        .config("spark.sql.shuffle.partitions", str(2 * args.cores))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hunt_spark.functions.analysis import tokenize_col
    from hunt_spark.operators.build import _invert_arrow

    out: dict = {"cores": args.cores}
    probes = args.probes.split(",")

    def timed(name, fn):
        if name not in probes:
            return
        t0 = time.time()
        fn()
        out[name] = round(time.time() - t0, 2)
        print(f"  {name}: {out[name]}s", flush=True)

    # --- alu: tiny data, fixed compute per row ------------------------
    def alu_kernel(batches):
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
        x = np.arange(1_000_000, dtype=np.int64)
        for b in batches:
            acc = 0
            for _ in range(b.num_rows):
                acc = (acc + int((x * x).sum())) % (1 << 62)  # ~1M int mults/row
            yield pa.RecordBatch.from_arrays(
                [pa.array([acc], type=pa.int64())], names=["v"]
            )

    ncores = args.cores
    alu_rows = 32 * 40  # fixed total work regardless of cores
    base = spark.range(alu_rows, numPartitions=4 * ncores)
    timed("alu", lambda: base.mapInArrow(alu_kernel, "v long").count())

    docs = spark.read.parquet(args.input).withColumn("doc_id", F.xxhash64("url"))
    tokenized = (
        docs.select("doc_id", F.lit("text").alias("context"), "text")
        .withColumn("toks", tokenize_col(F.col("text")))
        .withColumn("dl", F.size("toks").cast("int"))
        .filter(F.col("dl") > 0)
        .select("doc_id", "context", "toks", "dl")
    )

    # --- ship: serialize token arrays into Python, count only --------
    def ship_kernel(batches):
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [pa.array([b.num_rows], type=pa.int64())], names=["v"]
            )

    timed("ship", lambda: tokenized.mapInArrow(ship_kernel, "v long").count())

    # --- kernel: inversion compute, outputs one row per batch --------
    def invert_count_kernel(batches):
        import pyarrow.compute as pc

        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            toks = b.column("toks")
            lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
            flat = pc.list_flatten(toks)
            total = len(flat)
            if total == 0:
                continue
            enc = pc.dictionary_encode(flat)
            codes = enc.indices.to_numpy()
            doc_idx = np.repeat(np.arange(n), lens)
            order = np.lexsort((codes, doc_idx))
            d_s, c_s = doc_idx[order], codes[order]
            brk = np.flatnonzero((d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1]))
            yield pa.RecordBatch.from_arrays(
                [pa.array([len(brk) + 1], type=pa.int64())], names=["v"]
            )

    timed(
        "kernel",
        lambda: tokenized.mapInArrow(invert_count_kernel, "v long").count(),
    )

    # --- out: the real inversion incl. Python->JVM output ------------
    timed("out", lambda: _invert_arrow(tokenized).count())

    print("PROBE " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
