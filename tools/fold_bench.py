#!/usr/bin/env python3
"""Fold N full bench runs (+ optional isolated re-records) into the
committed per-query medians, and emit the raw-run audit artifact.

Usage:
  python3 tools/fold_bench.py --out bench_out.json \
      --runs-out BENCH_r14_runs.json [--prior prior_bench_out.json] \
      [--calibration bench_calib.json] runA.json runB.json [rerec.json ...]

--prior enables the CROSS-ROUND quiet-box rule (VERDICT r16 Next #1):
every query whose folded median moved >= 1.25x in either direction vs
the prior round's committed median is listed in the runs-out artifact
under "cross_round_movers" and printed, so movers on UNTOUCHED
operators get isolated re-record sessions before the fold is final
(re-run this script with the iso inputs appended until the list holds
only rows whose code actually changed, or rows reconciled by the iso
samples). --calibration embeds a tools/BenchCalib table verbatim.

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
    prior = calib = None
    if "--prior" in argv:
        i = argv.index("--prior"); prior = argv[i + 1]; del argv[i:i + 2]
    if "--calibration" in argv:
        i = argv.index("--calibration"); calib = argv[i + 1]; del argv[i:i + 2]
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
    movers = {}
    if prior:
        with open(prior) as fh:
            prev = json.load(fh).get("queries", {})
        for n, m in medians.items():
            p = prev.get(n)
            if p and p > 0 and max(m / p, p / m) >= 1.25:
                movers[n] = {"prior": p, "folded": round(m, 6),
                             "ratio": round(m / p, 4),
                             "n_samples": len(samples[n])}
        if movers:
            print(f"cross-round movers >=1.25x vs {prior} "
                  f"({len(movers)}):")
            for n, v in sorted(movers.items(),
                               key=lambda kv: -max(kv[1]["ratio"],
                                                   1 / kv[1]["ratio"])):
                print(f"  {n}: {v['prior']:.3f}s -> {v['folded']:.3f}s "
                      f"(x{v['ratio']:.2f}, {v['n_samples']} samples)")
        else:
            print(f"cross-round check vs {prior}: no movers >=1.25x")
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
                "cross_round_rule": "any query whose folded median "
                    "moved >=1.25x vs the prior round's committed "
                    "median gets an isolated re-record session "
                    "(movers listed below reflect the FINAL fold, "
                    "iso inputs included)",
                "cross_round_prior": prior,
                "cross_round_movers": movers,
                "calibration": (json.load(open(calib)) if calib else None),
            }, fh, indent=1, sort_keys=True)
            fh.write("\n")
    print(f"folded {len(runs)} inputs -> {out} "
          f"({len(medians)} queries, total {total:.2f}s)")


main()
