#!/usr/bin/env python3
"""Aggregate N full-suite graft.Bench JSON artifacts into the cross-run
median table (SCALE.md "Bench variance": the trustworthy per-query number
is the cross-run median, never a single run's sample).

Usage: python3 scripts/bench_medians.py OUT.json RUN1.json RUN2.json ...

Each RUNi.json is the one-line artifact Bench writes to
$SPARK_GRAFT_BENCH_OUT (default /tmp/graft_bench.json). Output schema:
  {"runs": N, "sum_of_medians": S, "run_totals": [...],
   "max_spread": {"query": q, "ratio": r},
   "queries": {name: {"median": m, "min": lo, "max": hi}}}
"""
import json
import statistics
import sys


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__, file=sys.stderr)
        return 2
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p))["queries"] for p in run_paths]
    names = sorted(set.intersection(*(set(r) for r in runs)))
    queries = {}
    for name in names:
        xs = [r[name] for r in runs]
        queries[name] = {"median": round(statistics.median(xs), 3),
                         "min": round(min(xs), 3), "max": round(max(xs), 3)}
    spread_q = max((n for n in names if queries[n]["min"] > 0),
                   key=lambda n: queries[n]["max"] / queries[n]["min"])
    result = {
        "runs": len(runs),
        "sum_of_medians": round(sum(q["median"] for q in queries.values()), 3),
        "run_totals": [round(sum(r[n] for n in names), 3) for r in runs],
        "max_spread": {
            "query": spread_q,
            "ratio": round(queries[spread_q]["max"] /
                           queries[spread_q]["min"], 2)},
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"{out_path}: {len(runs)} runs over {len(names)} queries, "
          f"sum_of_medians={result['sum_of_medians']}s, "
          f"totals={result['run_totals']}, "
          f"max spread {spread_q} x{result['max_spread']['ratio']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
