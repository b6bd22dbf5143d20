#!/usr/bin/env python3
"""Merge N consecutive graft.Bench runs into a conservative baseline.

Usage: python3 tools/merge_baseline.py <bench3.log> <out_baseline.json>

Reads every JSON line ({"metric": "total", ...}) from the log, DROPS the
first run (cold page cache / codegen first-touch: a 52s cold read of a
3.9s-steady-state query would make any 2x gate vacuous), then takes the
WORST (max) per-query time across the remaining runs — so single-run JVM
noise (GC, state-store cache residency, suite ordering) cannot
manufacture phantom 2x regressions against the baseline, while the
baseline still reflects steady state. Dev tool only; the shipped engine
never depends on it.
"""
import json
import sys

def main() -> None:
    log, out = sys.argv[1], sys.argv[2]
    runs = []
    with open(log) as f:
        for line in f:
            line = line.strip()
            i = line.find('{"metric"')
            if i >= 0:
                runs.append(json.loads(line[i:]))
    if len(runs) < 3:
        sys.exit(f"expected >=3 bench lines in {log}, found {len(runs)}")
    warmup, runs = runs[0], runs[1:]
    queries = {}
    for name in runs[0]["queries"]:
        vals = [r["queries"].get(name, -1.0) for r in runs]
        if any(v < 0 for v in vals):
            sys.exit(f"query {name} failed in at least one run: {vals}")
        queries[name] = max(vals)
    merged = {
        "metric": "total",
        "value": sum(queries.values()),
        "unit": "sec",
        "queries": queries,
        "failed": [],
        "sf": runs[0]["sf"],
        "runs": len(runs),
        "protocol": "worst-per-query over consecutive same-session runs, first run discarded as cold-cache warm-up",
        "run_totals": [r["value"] for r in runs],
        "warmup_total": warmup["value"],
    }
    with open(out, "w") as f:
        json.dump(merged, f)
        f.write("\n")
    print(f"merged {len(runs)} runs -> {out}; totals per run: "
          + ", ".join(f"{r['value']:.1f}s" for r in runs)
          + f"; merged (worst) total {merged['value']:.1f}s")

if __name__ == "__main__":
    main()
