#!/usr/bin/env python3
"""Per-query-anchored bench comparison (the gate SCALING.md's "Gate note"
argues for): instead of total-vs-frozen-total — which measures suite
GROWTH once the query count moves past the baseline's 36 — anchor each
query to its own reference median and report

  - per-query ratio (current / reference) for every query present in
    both runs, worst offenders first;
  - the common-query normalized total: sum(current over common) /
    sum(reference over common) — the number that actually answers
    "did anything regress?";
  - queries only in current (suite growth — listed with their cost,
    NOT counted as regression).

Inputs are bench_detail.json files (written by graft.Bench every run:
{"queries": {name: median_sec, ...}, ...}). A driver BENCH_r*.json whose
per-query map survives only as a truncated "tail" string is also
accepted — whatever prefix of queries was cut off is simply absent from
the comparison.

Usage: bench_anchor.py <reference.json> <current.json> [threshold]
Exit code 1 if any common query exceeds `threshold` (default 1.5x) AND
the normalized total exceeds 1.10 — single-query noise on a loaded VM
does not fail the gate, a broad slowdown does.
"""
import json
import re
import sys


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d and isinstance(d["queries"], dict):
        return d["queries"]
    if "tail" in d:  # driver capture: recover what the truncation left
        pairs = re.findall(r'"(q[0-9][^"]*)":([0-9.]+)', d["tail"])
        return {k: float(v) for k, v in pairs}
    raise SystemExit(f"{path}: neither a bench_detail nor a driver BENCH file")


def main(ref_path, cur_path, threshold=1.5):
    ref, cur = load_queries(ref_path), load_queries(cur_path)
    common = sorted(set(ref) & set(cur))
    new = sorted(set(cur) - set(ref))
    if not common:
        raise SystemExit("no common queries between the two runs")
    ratios = {q: (cur[q] / ref[q] if ref[q] > 0 else float("inf"))
              for q in common}
    ref_sum = sum(ref[q] for q in common)
    cur_sum = sum(cur[q] for q in common)
    norm = cur_sum / ref_sum
    print(f"common queries: {len(common)}  "
          f"ref {ref_sum:.1f}s -> cur {cur_sum:.1f}s  "
          f"normalized total {norm:.3f}x")
    worst = sorted(common, key=lambda q: -ratios[q])[:15]
    print("worst per-query ratios (cur/ref, >0.3s lines only):")
    for q in worst:
        if cur[q] > 0.3 or ref[q] > 0.3:
            print(f"  {q:38s} {ref[q]:7.2f} -> {cur[q]:7.2f}  "
                  f"{ratios[q]:5.2f}x")
    if new:
        print(f"suite growth: {len(new)} new queries, "
              f"{sum(cur[q] for q in new):.1f}s total (not regressions)")
    offenders = [q for q in common if ratios[q] > threshold
                 and (cur[q] > 0.5)]  # sub-noise-floor lines never fail
    if offenders and norm > 1.10:
        print(f"REGRESSION: normalized total {norm:.2f}x with "
              f"{len(offenders)} queries over {threshold}x")
        return 1
    print("OK: no broad regression")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    try:
        sys.exit(main(sys.argv[1], sys.argv[2], t))
    except BrokenPipeError:  # | head; the consumer has what it wanted
        sys.exit(0)
