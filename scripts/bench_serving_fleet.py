"""Multi-frontend serving scale-out: N independent spark-submit driver
frontends over the SAME catalog, all firing on one start barrier —
combined QPS vs a single frontend.

This is the serving tier's actual scaling axis: a frontend holds no
index state (the catalog is immutable shared storage), so deployments
add replicas exactly like hunt-server instances over one store. A
single driver is capped by its Python plan/collect path; replicas
multiply it.

    python scripts/bench_serving_fleet.py --catalog /path/idx \
        [--frontends 1,2,4] [--concurrency 8] [--n-queries 48]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def run_fleet(catalog: str, m: int, concurrency: int, n_queries: int,
              cores_total: int) -> dict:
    cores_each = max(2, cores_total // m)
    start_at = time.time() + 45 + 15 * m  # JVM + engine warm-up per frontend
    procs = []
    for _ in range(m):
        cmd = [
            SPARK_SUBMIT, "--master", f"local[{cores_each}]",
            "--driver-memory", f"{max(4, cores_each)}g",
            os.path.join(REPO, "scripts", "bench_serving.py"),
            "--catalog", catalog,
            "--concurrency", str(concurrency),
            "--n-queries", str(n_queries),
            "--start-at", str(start_at),
        ]
        env = dict(os.environ, PYTHONPATH=REPO)
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, env=env,
        ))
    per = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        for line in out.splitlines():
            if line.startswith("SERVING "):
                per.append(json.loads(line[len("SERVING "):]))
    lv = str(concurrency)
    qps = [x["levels"][lv]["qps"] for x in per]
    p50 = [x["levels"][lv]["p50_s"] for x in per]
    return {
        "frontends": m,
        "cores_each": cores_each,
        "combined_qps": round(sum(qps), 2),
        "per_frontend_qps": qps,
        "p50_s": round(sum(p50) / len(p50), 3) if p50 else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--frontends", default="1,2,4")
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--n-queries", type=int, default=48)
    ap.add_argument("--cores-total", type=int, default=os.cpu_count() or 32)
    args = ap.parse_args()

    results = []
    for m in (int(x) for x in args.frontends.split(",")):
        r = run_fleet(args.catalog, m, args.concurrency, args.n_queries,
                      args.cores_total)
        results.append(r)
        print(f"  frontends={m}: combined_qps={r['combined_qps']} "
              f"(per: {r['per_frontend_qps']}) p50={r['p50_s']}",
              flush=True)
    print("FLEET " + json.dumps(results))
    # persist for bench_scaling.py's BASELINE.md serving section
    with open(os.path.join(REPO, "BENCH", "serving_fleet.json"), "w") as f:
        json.dump({"concurrency": args.concurrency, "runs": results}, f)


if __name__ == "__main__":
    sys.exit(main())
