#!/usr/bin/env python3
"""Merge graft.Bench runs into a conservative baseline.

Usage: python3 tools/merge_baseline.py <bench1.log> [bench2.log ...] <out_baseline.json>

Reads every JSON line ({"metric": "total", ...}) from the given logs.
Pass SEVERAL logs, one per SEPARATE sbt invocation: a single warm sbt
session systematically understates cross-session variance (page cache,
JIT residency), which is exactly the dispute a baseline exists to
settle. Within the FIRST log, the first run is dropped as cold-cache
warm-up (a 52s cold read of a 3.9s-steady-state query would make any 2x
gate vacuous); every run from later logs is kept (their first runs ARE
the cross-session signal). The baseline is the WORST (max) per-query
time across all kept runs — single-run JVM noise (GC, state-store cache
residency, suite ordering) cannot manufacture phantom 2x regressions,
while the baseline still reflects achievable steady state. Dev tool
only; the shipped engine never depends on it.
"""
import json
import sys


def read_runs(log: str):
    runs = []
    with open(log) as f:
        for line in f:
            line = line.strip()
            i = line.find('{"metric"')
            if i >= 0:
                runs.append(json.loads(line[i:]))
    return runs


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    logs, out = sys.argv[1:-1], sys.argv[-1]
    first = read_runs(logs[0])
    if not first:
        sys.exit(f"no bench lines in {logs[0]}")
    warmup, runs = first[0], first[1:]
    for log in logs[1:]:
        runs.extend(read_runs(log))
    if len(runs) < 2:
        sys.exit(f"expected >=3 total bench lines (>=2 after warm-up drop), found {len(runs) + 1}")
    queries = {}
    # union across runs: a query present in only SOME runs (added
    # between recording sessions) must not silently vanish from the
    # baseline — it gets the worst of the runs that did execute it
    names = sorted({n for r in runs for n in r["queries"]})
    for name in names:
        vals = [r["queries"][name] for r in runs if name in r["queries"]]
        if any(v < 0 for v in vals):
            sys.exit(f"query {name} failed in at least one run: {vals}")
        if len(vals) < len(runs):
            print(f"note: {name} present in only {len(vals)}/{len(runs)} runs")
        queries[name] = max(vals)
    merged = {
        "metric": "total",
        "value": sum(queries.values()),
        "unit": "sec",
        "queries": queries,
        "failed": [],
        "sf": runs[0]["sf"],
        "runs": len(runs),
        "sessions": len(logs),
        "protocol": "worst-per-query across runs from separate sbt sessions, "
                    "first run of the first session discarded as cold-cache warm-up",
        "run_totals": [r["value"] for r in runs],
        "warmup_total": warmup["value"],
    }
    with open(out, "w") as f:
        json.dump(merged, f)
        f.write("\n")
    print(f"merged {len(runs)} runs ({len(logs)} sessions) -> {out}; totals per run: "
          + ", ".join(f"{r['value']:.1f}s" for r in runs)
          + f"; merged (worst) total {merged['value']:.1f}s")


if __name__ == "__main__":
    main()
