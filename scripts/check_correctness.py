"""Simulate the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf dir; compare row
count, schema (sorted column names) and a value hash.

Usage: python scripts/check_correctness.py [sf_dir] [query_name ...]
(with query names given, only those gates run)
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from hunt_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(str(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for r in canon:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("correctness_check")
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        except duckdb.Error:
            pass

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    n_pass = n_fail = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            rel = con.execute(oracles[name])
            ocols = sorted(d[0] for d in rel.description)
            # fetch via pandas (.df()), NOT fetchall(): the driver's
            # hasher uses the pandas path, where e.g. a DuckDB HUGEINT
            # becomes float64 ("3.0") while fetchall() yields a Python
            # int ("3") — hashing the same bytes as the driver is the
            # whole point of this checker (the r2-r4 evt_sessionize
            # local-pass/driver-fail split was exactly this divergence)
            odf = rel.df()
            orows = list(odf.itertuples(index=False, name=None))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        if len(srows) != len(orows):
            print(f"FAIL {name}: row count spark={len(srows)} duckdb={len(orows)}")
            ok = False
        elif scols != ocols:
            print(f"FAIL {name}: schema spark={scols} duckdb={ocols}")
            ok = False
        else:
            sh = value_hash(srows, sdf.columns)
            oh = value_hash(orows, [d[0] for d in rel.description])
            if sh != oh:
                print(f"FAIL {name}: value hash mismatch {sh} != {oh}")
                svals = sorted(map(str, srows))[:5]
                ovals = sorted(map(str, orows))[:5]
                print(f"     spark sample:  {svals}")
                print(f"     duckdb sample: {ovals}")
                ok = False
        if ok:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
