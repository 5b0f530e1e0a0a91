#!/usr/bin/env python3
"""Rebuild BENCH_MEDIANS.json from a set of full-suite bench detail lines.

Usage: bench_medians.py OUT LOG [LOG...]

Each LOG is a bench run's stdout (or a saved copy of the one-line JSON
detail); the FIRST line containing `"queries"` is taken as that run's
detail. Per-query min/median/max are computed over the runs in which the
query appears (the suite grows within a round, so late additions have
fewer samples — recorded in `n_runs`). `sum_of_medians` covers the most
recent run's query set: the cross-run-median total is the trustworthy
headline (single runs swing ±10%; see SCALE.md "Bench variance").
"""
import json
import statistics
import sys


def detail(path):
    with open(path, errors="replace") as f:
        for line in f:
            if '"queries"' in line and '"metric"' in line:
                return json.loads(line[line.index("{"):])
    raise SystemExit(f"no bench detail line in {path}")


def main():
    out, logs = sys.argv[1], sys.argv[2:]
    runs = [detail(p) for p in logs]
    latest = runs[-1]["queries"]
    samples = {}
    for r in runs:
        for q, t in r["queries"].items():
            samples.setdefault(q, []).append(t)
    queries = {
        q: {
            "min": min(v),
            "median": round(statistics.median(v), 3),
            "max": max(v),
            "n_runs": len(v),
        }
        for q, v in sorted(samples.items())
    }
    spread = max(
        ((q, s["max"] / s["min"]) for q, s in queries.items() if s["min"] > 0),
        key=lambda x: x[1],
    )
    # machine calibration anchors (r12): medians of the fixed splitmix64
    # loop timings across the envelope runs — a later round divides its
    # own calib by these to separate machine drift from code change
    calib = {
        k: round(statistics.median([r[k] for r in runs if k in r]), 3)
        for k in sorted({k for r in runs for k in r if k.startswith("calib_")})
    }
    doc = {
        "runs": len(runs),
        "run_totals": [round(r["value"], 3) for r in runs],
        **({"calib": calib} if calib else {}),
        "sum_of_medians": round(
            sum(queries[q]["median"] for q in latest), 3
        ),
        "latest_query_count": len(latest),
        "max_spread": {"query": spread[0], "ratio": round(spread[1], 2)},
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out}: {len(runs)} runs, {len(queries)} queries, "
          f"sum_of_medians={doc['sum_of_medians']}")


if __name__ == "__main__":
    main()
