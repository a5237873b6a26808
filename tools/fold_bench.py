#!/usr/bin/env python3
"""Fold N full bench runs (+ optional isolated re-records) into the
committed per-query medians, and emit the raw-run audit artifact.

Usage:
  python3 tools/fold_bench.py --out bench_out.json \
      --runs-out BENCH_r14_runs.json [--prior prior_bench_out.json] \
      [--driver BENCH_rN.json] [--calibration bench_calib.json] \
      runA.json runB.json [rerec.json ...]

--prior enables the CROSS-ROUND quiet-box rule (VERDICT r16 Next #1):
every query whose folded median moved >= 1.25x in either direction vs
the prior round's committed median is listed in the runs-out artifact
under "cross_round_movers" and printed, so movers on UNTOUCHED
operators get isolated re-record sessions before the fold is final
(re-run this script with the iso inputs appended until the list holds
only rows whose code actually changed, or rows reconciled by the iso
samples).

Host-speed normalization (VERDICT r17 Next #2): cross-round ratios are
divided by a HOST RATIO before the 1.25x rule. The host ratio is the
probe ratio — geomean of this fold's and the prior's "probe"
single_sec/multi_sec blocks (graft.Bench records a fixed-work
splitmix64 kernel per session) — when BOTH sides carry a probe; when
the prior predates the probe, the fallback is the median per-query
ratio over all common rows (self-normalizing: with most rows
untouched, the median ratio IS the host shift; code movers are the
tail the rule exists to catch). Raw ratios are kept alongside.

--driver reconciles an EXTERNAL single pass (the driver's committed
BENCH_rN.json) against this fold (VERDICT r17 Next #3): rows where the
driver pass and the folded median disagree >= 2x are listed under
"driver_vs_fold" and printed — each needs an isolated re-record
regardless of fold-vs-fold movement. Driver samples are NOT folded
into the medians (the driver pass may be a different code revision;
the table, not the fold, is the reconciliation).

--calibration embeds a tools/BenchCalib table verbatim.

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
import json, math, statistics, sys


def main():
    argv = sys.argv[1:]
    out = runs_out = None
    if "--out" in argv:
        i = argv.index("--out"); out = argv[i + 1]; del argv[i:i + 2]
    if "--runs-out" in argv:
        i = argv.index("--runs-out"); runs_out = argv[i + 1]; del argv[i:i + 2]
    prior = calib = driver = None
    if "--prior" in argv:
        i = argv.index("--prior"); prior = argv[i + 1]; del argv[i:i + 2]
    if "--driver" in argv:
        i = argv.index("--driver"); driver = argv[i + 1]; del argv[i:i + 2]
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

    # per-session probes: the fold's anchor is the median probe across
    # its inputs (iso re-record sessions carry probes too)
    probes = [r["probe"] for _, r in runs if isinstance(r.get("probe"), dict)]
    def probe_median(ps, key):
        vals = [p[key] for p in ps if isinstance(p.get(key), (int, float))]
        return statistics.median(vals) if vals else None
    fold_probe = None
    if probes:
        fold_probe = {"single_sec": probe_median(probes, "single_sec"),
                      "multi_sec": probe_median(probes, "multi_sec"),
                      "n_sessions": len(probes)}

    movers, host = {}, None
    set_diff = None
    if prior:
        with open(prior) as fh:
            prior_doc = json.load(fh)
        prev = prior_doc.get("queries", {})
        # symmetric difference of query sets (ADVICE r17): a dropped or
        # newly-added row must be visible in the audit, not silently
        # escape the quiet-box rule
        dropped = sorted(set(prev) - set(medians))
        added = sorted(set(medians) - set(prev))
        set_diff = {"dropped_vs_prior": dropped, "added_vs_prior": added}
        if dropped or added:
            print(f"query-set diff vs {prior}: "
                  f"+{len(added)} {added} / -{len(dropped)} {dropped}")
        # host ratio: probe-based when both sides have one, else the
        # median common-row ratio fallback
        pp = prior_doc.get("probe")
        if fold_probe and isinstance(pp, dict) and \
                all(isinstance(pp.get(k), (int, float))
                    for k in ("single_sec", "multi_sec")):
            rs = fold_probe["single_sec"] / pp["single_sec"]
            rm = fold_probe["multi_sec"] / pp["multi_sec"]
            host = {"method": "probe", "single_ratio": round(rs, 4),
                    "multi_ratio": round(rm, 4),
                    "ratio": round(math.sqrt(rs * rm), 4)}
        else:
            common = [medians[n] / prev[n] for n in medians
                      if n in prev and prev[n] > 0]
            host = {"method": "median-common-row (prior has no probe)",
                    "ratio": round(statistics.median(common), 4)
                    if common else 1.0}
        hr = host["ratio"]
        print(f"host ratio vs {prior}: {hr} ({host['method']})")
        for n, m in medians.items():
            p = prev.get(n)
            if not p or p <= 0:
                continue
            raw = m / p
            norm = raw / hr
            if max(norm, 1 / norm) >= 1.25:
                movers[n] = {"prior": p, "folded": round(m, 6),
                             "ratio_raw": round(raw, 4),
                             "ratio_norm": round(norm, 4),
                             "n_samples": len(samples[n])}
        if movers:
            print(f"cross-round movers >=1.25x (host-normalized) vs "
                  f"{prior} ({len(movers)}):")
            for n, v in sorted(movers.items(),
                               key=lambda kv: -max(kv[1]["ratio_norm"],
                                                   1 / kv[1]["ratio_norm"])):
                print(f"  {n}: {v['prior']:.3f}s -> {v['folded']:.3f}s "
                      f"(raw x{v['ratio_raw']:.2f}, norm "
                      f"x{v['ratio_norm']:.2f}, {v['n_samples']} samples)")
        else:
            print(f"cross-round check vs {prior}: no movers >=1.25x "
                  "after host normalization")

    driver_vs_fold = None
    if driver:
        with open(driver) as fh:
            drv = json.load(fh).get("queries", {})
        driver_vs_fold = {}
        for n, m in medians.items():
            d = drv.get(n)
            if d and d > 0 and m > 0 and max(d / m, m / d) >= 2.0:
                driver_vs_fold[n] = {
                    "driver": d, "folded": round(m, 6),
                    "driver_over_fold": round(d / m, 4),
                    "n_samples": len(samples[n])}
        if driver_vs_fold:
            print(f"driver-vs-fold outliers >=2x vs {driver} "
                  f"({len(driver_vs_fold)}) - each needs an iso "
                  "re-record:")
            for n, v in sorted(driver_vs_fold.items(),
                               key=lambda kv: -max(
                                   kv[1]["driver_over_fold"],
                                   1 / kv[1]["driver_over_fold"])):
                print(f"  {n}: driver {v['driver']:.3f}s vs fold "
                      f"{v['folded']:.3f}s (x{v['driver_over_fold']:.2f}, "
                      f"{v['n_samples']} fold samples)")
        else:
            print(f"driver-vs-fold check vs {driver}: no >=2x outliers")

    base = runs[0][1]
    folded = {
        "metric": "total", "value": total, "unit": "sec",
        "action": base.get("action", ""), "queries": medians,
        "failed": sorted(failed), "sf": base.get("sf", ""),
        "methodology": base.get("methodology", "") +
            f"; folded median over {len(runs)} recorded passes "
            "(full runs + isolated re-records), see tools/fold_bench.py",
    }
    if fold_probe:
        folded["probe"] = fold_probe
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
                "probes": probes,
                "fold_probe": fold_probe,
                "host_ratio_vs_prior": host,
                "query_set_diff_vs_prior": set_diff,
                "cross_round_rule": "any query whose folded median "
                    "moved >=1.25x vs the prior round's committed "
                    "median AFTER dividing by the host ratio gets an "
                    "isolated re-record session (movers listed below "
                    "reflect the FINAL fold, iso inputs included); "
                    "host ratio = probe geomean when both rounds "
                    "carry a probe, else median common-row ratio",
                "cross_round_prior": prior,
                "cross_round_movers": movers,
                "driver_vs_fold_rule": "rows where the external "
                    "driver pass and this fold disagree >=2x need an "
                    "iso re-record regardless of fold-vs-fold "
                    "movement; driver samples are NOT folded into the "
                    "medians",
                "driver_vs_fold_input": driver,
                "driver_vs_fold": driver_vs_fold,
                "calibration": (json.load(open(calib)) if calib else None),
            }, fh, indent=1, sort_keys=True)
            fh.write("\n")
    print(f"folded {len(runs)} inputs -> {out} "
          f"({len(medians)} queries, total {total:.2f}s)")


main()
