"""Materialize the deterministic synthetic Common-Crawl-style corpus
(FIXTURES.md §1, hunt_spark.sources.corpus) as parquet for the
spark-submit bench jobs.

    python scripts/make_corpus.py --n 200000 --out /tmp/corpus_200k
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hunt_spark.session import get_spark
from hunt_spark.sources.corpus import corpus_df


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark("make_corpus")
    df = corpus_df(spark, args.n, partitions=args.partitions)
    df.write.mode("overwrite").parquet(args.out)
    print(f"wrote {args.n} docs to {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
