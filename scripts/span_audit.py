"""Critical-path audit of a scaling-ladder pair from the ledger spans.

Reads BENCH/scaling_runs.jsonl (or a file given as argv[1]), takes the
requested run (argv[2], 1-based; default last) and prints, per pair:

  - the stage Gantt at N and 4N (t0..t1 offsets from build start),
  - per-stage wall speedup vs the ideal 4x,
  - the two core-invariant residuals the efficiency ratio pays for:
    head (build start -> first stage start) and tail (last stage end ->
    build end), plus any gap where NO stage is in flight.

Pure JSON analysis — no Spark; safe to run while a ladder holds the
substrate lock.
"""

from __future__ import annotations

import json
import sys


def _gaps(spans: dict[str, list[float]], build_sec: float) -> dict:
    ivs = sorted(spans.values())
    head = ivs[0][0] if ivs else 0.0
    end = max(t1 for _t0, t1 in ivs) if ivs else 0.0
    tail = max(0.0, build_sec - end)
    # merged coverage -> idle time where no stage is in flight
    idle, cur = 0.0, None
    for t0, t1 in ivs:
        if cur is None or t0 > cur:
            if cur is not None:
                idle += t0 - cur
            cur = t1
        else:
            cur = max(cur, t1)
    return {"head_s": round(head, 2), "tail_s": round(tail, 2),
            "mid_idle_s": round(idle, 2)}


def audit_pair(p: dict) -> None:
    sn, s4 = p.get("stage_span_n"), p.get("stage_span_4n")
    bn, b4 = p.get("build_sec_n"), p.get("build_sec_4n")
    print(f"  eff={p.get('eff')} clean={p.get('clean')} "
          f"T_N={bn}s T_4N={b4}s")
    if not (sn and s4):
        print("  (no spans recorded — pre-d8eb950 entry)")
        return
    print(f"  {'stage':<14} {'N span':>16} {'4N span':>16} "
          f"{'wall N':>7} {'4N':>7} {'x':>5} {'eff':>5}")
    for k in sorted(sn, key=lambda k: sn[k][0]):
        a, b = sn[k], s4.get(k)
        wn = a[1] - a[0]
        if b:
            w4 = b[1] - b[0]
            x = wn / w4 if w4 else float("inf")
            print(f"  {k:<14} {a[0]:7.1f}-{a[1]:7.1f} "
                  f"{b[0]:7.1f}-{b[1]:7.1f} {wn:7.1f} {w4:7.1f} "
                  f"{x:5.2f} {x / 4:5.2f}")
        else:
            print(f"  {k:<14} {a[0]:7.1f}-{a[1]:7.1f} {'—':>16} {wn:7.1f}")
    for label, spans, b in (("N", sn, bn), ("4N", s4, b4)):
        if b is not None:
            print(f"  residuals {label:>2}: {_gaps(spans, b)}")


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/scaling_runs.jsonl"
    runs = [json.loads(line) for line in open(path)]
    idx = int(sys.argv[2]) - 1 if len(sys.argv) > 2 else len(runs) - 1
    run = runs[idx]
    print(f"run {idx + 1}: n={run.get('n')} n_docs={run.get('n_docs')} "
          f"raw_median={run.get('raw_median')}")
    for i, p in enumerate(run.get("pairs", []), 1):
        print(f" pair {i}:")
        audit_pair(p)


if __name__ == "__main__":
    main()
