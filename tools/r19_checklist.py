#!/usr/bin/env python3
"""Emit the OPTIMIZATION_r19.md per-query checklist table from the folded
medians (bench_out.json) plus a status map maintained here."""
import json, sys

fold = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"))
qs = fold["queries"]

optimized = {
    "dedup_recall_indexed": "optimized §1 (shared shingle pass)",
    "dedup_recall_indexed_abs": "optimized §1 (shared shingle pass)",
    "corpus_curate": "optimized §2 (quality EvalOnce)",
    "corpus_curate_fuzzy": "optimized §2 (quality EvalOnce)",
    "corpus_export": "optimized §2 via curate; profiled",
    "corpus_export_ids": "optimized §2 via curate; profiled",
    "corpus_export_ids_eos": "optimized §2 via curate; profiled",
    "corpus_boilerplate": "optimized §3 (EvalOnce, plan-verified; flat at bench)",
    "corpus_chunk": "optimized §3 (BPE EvalOnce)",
    "knn_ivfpq": "optimized §4 (merged systematic-path actions)",
    "knn_ivfpq_res": "optimized §4 (merged systematic-path actions)",
    "knn_range_indexed": "optimized §5 (hint scoped; hygiene)",
    "knn_recall_sweep_indexed": "optimized §5 (hint scoped; hygiene)",
    "compact_cells": "optimized §7 (one marker-threshold aggregation)",
    "compact_cells_ttl": "optimized §7 (one marker-threshold aggregation; flat)",
    "q_running_revenue": "tried §6, measured slower, reverted",
    "dedup_recall": "tried §8, measured slower, reverted",
    "dedup_recall_sampled": "tried §8, measured slower, reverted",
    "dedup_recall_sweep": "tried §8, measured slower, reverted (r18 §2 kept)",
    "dedup_recall_sweep_abs": "tried §8, measured slower, reverted",
    "dedup_fuzzy_incremental": "profiled (control row for §1; unchanged path)",
    "dedup_minhash_lsh": "profiled (control row; unchanged path)",
    "dedup_ngram_jaccard": "profiled (control row; unchanged path)",
}
# rows whose plans the r19 PlanDump sweep examined individually for
# duplicated kernels / stray hints / unpartitioned windows but left alone
sweep_only = "plan-swept (PlanDump), no duplicated kernel / stray hint found"

print("| query | folded s | status |")
print("|---|---|---|")
for k in sorted(qs):
    status = optimized.get(k, sweep_only)
    print(f"| {k} | {qs[k]:.2f} | {status} |")
