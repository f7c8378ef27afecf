#!/usr/bin/env python3
"""Merge a runs>=3 tail re-measurement (BENCH_PARTIAL.json, produced by
SPARK_GRAFT_BENCH_ONLY) into a runs=1 100x artifact: the tail entries'
medians replace the single-sample values (total recomputed), their
triples land under "tail_triples", and "tail_runs" records the sample
count — so the committed BENCH_100X carries real spread evidence for
exactly the entries where runs=1 noise has been mis-read as regression
(VERDICT r15 what's-wrong #4).

Usage: merge_tail.py <BENCH_100X.json> <BENCH_PARTIAL.json>
"""
import json
import sys

base_path, partial_path = sys.argv[1], sys.argv[2]
base = json.load(open(base_path))
part = json.load(open(partial_path))

# A failed tail entry is -1 in part['queries'] but ABSENT from
# part['triples'] (no-sentinel convention) — merging it would either
# KeyError below or overwrite a valid base median with -1. Refuse.
bad = sorted(set(part.get("failed", [])) |
             {k for k, v in part["queries"].items() if v < 0})
if bad:
    sys.exit(f"refusing to merge: tail entries failed in the partial "
             f"run: {', '.join(bad)} — re-run them before merging")

tail = sorted(part["queries"])
# UNION into any prior merge (a second tail batch must not erase the
# first batch's triples)
base["tail_runs"] = part["runs"]
base["tail_load1"] = part["load1"]
base["tail_calib_sec"] = part["calib_sec"]
base.setdefault("tail_triples", {}).update(
    {k: part["triples"][k] for k in tail})
for k in tail:
    base["queries"][k] = part["queries"][k]
    # keep the main triples map coherent with the merged medians (the
    # runs=1 triple it replaces was degenerate [x,x,x] anyway)
    if "triples" in base:
        base["triples"][k] = part["triples"][k]
base["value"] = round(sum(v for v in base["queries"].values() if v >= 0), 4)
json.dump(base, open(base_path, "w"))
print(f"merged {len(tail)} tail entries at runs={part['runs']}; "
      f"new total {base['value']}")
