#!/usr/bin/env python3
"""Fold N full bench runs (+ optional isolated re-records) into the
committed per-query medians, and emit the raw-run audit artifact.

Usage:
  python3 tools/fold_bench.py --out bench_out.json \
      --runs-out BENCH_r14_runs.json runA.json runB.json [rerec.json ...]

Every input is a graft.Bench output line ({"queries": {name: sec}, ...}).
Full runs and isolated re-records are treated identically: a query's
committed number is the MEDIAN of every recorded sample for it across
all inputs. The runs-out artifact keeps every raw sample per query plus
the fold rule, so a judge can audit the median protocol without
reconstructing it from git (VERDICT r13 Next #6).

Rationale (bench quiet-box rule): the host drifts between rounds and
sub-second rows are bimodal across forks, so single-pass numbers
routinely disagree 2-3x on a handful of rows; the median over >= 2 full
passes plus isolated re-records of the disagreeing rows is the stable
protocol the committed medians follow.
"""
import json, statistics, sys


def main():
    argv = sys.argv[1:]
    out = runs_out = None
    if "--out" in argv:
        i = argv.index("--out"); out = argv[i + 1]; del argv[i:i + 2]
    if "--runs-out" in argv:
        i = argv.index("--runs-out"); runs_out = argv[i + 1]; del argv[i:i + 2]
    if not argv or not out:
        sys.exit("usage: fold_bench.py --out <medians.json> "
                 "[--runs-out <raw.json>] run1.json run2.json ...")
    runs = []
    for f in argv:
        with open(f) as fh:
            runs.append((f, json.load(fh)))
    samples, failed = {}, set()
    for _, r in runs:
        for name, sec in r.get("queries", {}).items():
            samples.setdefault(name, []).append(sec)
        failed.update(r.get("failed", []))
    medians = {n: statistics.median(v) for n, v in sorted(samples.items())}
    total = sum(medians.values())
    base = runs[0][1]
    folded = {
        "metric": "total", "value": total, "unit": "sec",
        "action": base.get("action", ""), "queries": medians,
        "failed": sorted(failed), "sf": base.get("sf", ""),
        "methodology": base.get("methodology", "") +
            f"; folded median over {len(runs)} recorded passes "
            "(full runs + isolated re-records), see tools/fold_bench.py",
    }
    with open(out, "w") as fh:
        json.dump(folded, fh)
        fh.write("\n")
    if runs_out:
        with open(runs_out, "w") as fh:
            json.dump({
                "fold_rule": "committed value = median of all samples "
                             "per query across the inputs below",
                "inputs": [f for f, _ in runs],
                "samples": {n: v for n, v in sorted(samples.items())},
                "medians": medians,
            }, fh, indent=1, sort_keys=True)
            fh.write("\n")
    print(f"folded {len(runs)} inputs -> {out} "
          f"({len(medians)} queries, total {total:.2f}s)")


main()
