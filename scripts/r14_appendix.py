#!/usr/bin/env python3
"""Render the OPTIMIZATION_r14 per-query appendix: closing c32/c8 seconds,
the checked-in steady floor, and this round's disposition per query."""
import json, sys

c32 = json.load(open('plans/r14/bench_closing_cpu32.json'))['queries']
c8 = json.load(open('plans/r14/bench_closing_cpu8.json'))['queries']
steady = {}
for l in open('plans/bench_steady.tsv'):
    if l.startswith('#'):
        continue
    p = l.split('\t')
    if len(p) == 2:
        steady[p[0]] = float(p[1])

changed = {
    'd05_dup_clusters': 'CHANGED: fast-path edge ckpt removed',
    'd10_quality_reps': 'CHANGED: rides d05 chain',
    't19_corpus_manifest': 'CHANGED: rides d05 chain',
    't41_leakfree_split': 'CHANGED: rides d05 chain',
    'd14_edit_pairs': 'CHANGED: size-gated pin width',
    'v04_ann_ivf': 'CHANGED: centroids driver-resident',
    'v07_kmeans_step': 'CHANGED: centroids driver-resident',
    'v13_ivf_recall': 'CHANGED: centroids driver-resident',
    'v25_ivf_filtered': 'CHANGED: centroids driver-resident',
    'v09_semdedup': 'CHANGED: rides centroid localization',
    'v14_pq_topk': 'CHANGED: codebook driver-resident',
    'v15_pq_recall': 'CHANGED: codebook driver-resident',
    'v16_ann_ivfpq': 'CHANGED: centroids+codebook driver-resident',
    'v17_pq_rerank': 'CHANGED: codebook driver-resident',
    'v19_kmeans_fit': 'CHANGED: Lloyd state driver-resident',
    'v28_ivf_trained': 'CHANGED: Lloyd state driver-resident',
    'v29_proto_prune': 'CHANGED: Lloyd state driver-resident',
    'v30_ivfpq_trained': 'CHANGED: Lloyd state + codebook driver-resident',
    'e12_pagerank': 'EXAMINED: cadence {3,5} measured negative at ~sf1, knob ships at 2',
    'e13_bfs_hops': 'EXAMINED: count job is the cache build; no fusion available',
    'q62_assoc_rules': 'EXAMINED: r13 scoped-cache negative stands',
    't25_bigram_logprob': 'EXAMINED: r13 scoped-cache negative stands',
    't16_unigram_logprob': 'EXAMINED: r13 disposition stands (left lazy)',
    'v23_knn_graph': 'EXAMINED: log-star chain is the oracle contract',
    'd17_dup_reach': 'EXAMINED: recursive-CTE walk at floor (r13 JOBLOG)',
}
default = 'examined-by-family, r13 disposition stands (see tier notes)'

print('| query | 32c s | 8c s | steady floor | disposition |')
print('|---|---|---|---|---|')
for k in sorted(c32):
    s = f"{steady[k]:.2f}" if k in steady else '—'
    print(f"| {k} | {c32[k]:.2f} | {c8.get(k, float('nan')):.2f} | {s} "
          f"| {changed.get(k, default)} |")
