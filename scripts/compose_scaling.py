#!/usr/bin/env python3
"""Compose SCALING.md from the multi-leg sweep:

  leg 1: all declared queries, sf0.01 -> sf0.1 (driver testdata)
  leg 2: the heavy d/e/v/t tier, sf0.1 -> ~sf1 (graft.GenScale corpus
         under target/, ~10x sf0.1) — the leg where data dominates
         per-query constants, so exponents separate linear from
         overhead-bound, and the size-gated paths (BFS/CC local
         finishes, iteration conf) run their OVER-cap forms
  leg 3 (optional): the full heavy tier, ~sf1 -> ~sf3 (30x sf0.1) —
         a third point so the heavy-tier trend is a series, not a
         single ratio
  leg 4 (optional): the steepest near-linear queries, ~sf3 -> ~sf10
         (100x sf0.1) — one more ~3x step to separate linear from
         n·log n on the queries leg 3 measured near exponent 0.8-0.9

Usage:
  scripts/compose_scaling.py --leg1 lo.json hi.json \
      --leg2 lo.json hi.json [--leg3 lo.json hi.json --leg3-ratio 3] \
      [--leg4 lo.json hi.json --leg4-ratio 3.33] \
      [--gates gates.txt] > SCALING.md
"""
import argparse
import subprocess
import sys

HERE = "scripts/scaling_report.py"


def leg(lo, hi, ratio):
    out = subprocess.run(
        [sys.executable, HERE, lo, hi, str(ratio)],
        check=True, capture_output=True, text=True).stdout
    # demote the per-leg H1/H2 under the composed document's headings
    return out.replace("# SCALING — heavy-tier scaling exponents",
                       "### Exponents").replace("## Findings",
                                                "### Findings")


ap = argparse.ArgumentParser()
ap.add_argument("--leg1", nargs=2, required=True)
ap.add_argument("--leg2", nargs=2, required=True)
ap.add_argument("--leg3", nargs=2)
ap.add_argument("--leg3-ratio", type=float, default=3.0)
ap.add_argument("--leg4", nargs=2)
ap.add_argument("--leg4-ratio", type=float, default=10.0 / 3.0)
ap.add_argument("--gates")
args = ap.parse_args()

print("# SCALING — multi-leg scaling sweep")
print()
print("Leg 1 spans the driver testdata (sf0.01 -> sf0.1, every declared")
print("query); legs 2-4 extend the sweep past the driver data with")
print("seeded ~10x / ~30x / ~100x corpora (`graft.GenScale`, structure-preserving")
print("per replica, structure-breaking across replicas, written under")
print("`target/` only) over the heavy d/e/v/t tier — the legs where data")
print("volume dominates per-query constants AND the size-gated paths")
print("cross over to their distributed over-cap forms (see the gate")
print("evidence at the end). Every leg: same-window back-to-back")
print("`SPARK_GRAFT_REPEAT=2` runs; exponent = log(t_hi/t_lo)/log(ratio).")
print()
print("## Leg 1: sf0.01 -> sf0.1 (all queries)")
print()
print(leg(args.leg1[0], args.leg1[1], 10))
print()
print("## Leg 2: sf0.1 -> ~sf1 (heavy tier, GenScale 10x corpus)")
print()
print(leg(args.leg2[0], args.leg2[1], 10))
if args.leg3:
    print()
    print("## Leg 3: ~sf1 -> ~sf3 (full heavy tier, GenScale 30x corpus)")
    print()
    print(leg(args.leg3[0], args.leg3[1], args.leg3_ratio))
    print()
    print("**On v23 (the round-11 FLAG, closed in round 12):** the round-11")
    print("leg measured the then-declared fixed-plane config (`numPlanes=6`)")
    print("at exponent 2.72 (12.5 s -> 248 s for a 3x corpus) — with a")
    print("FIXED plane count the bucket space is constant (2^p), so bucket")
    print("population grows linearly with the corpus and the self-join")
    print("candidate total grows as n²/2^p until the hot-bucket cap (4096)")
    print("truncates it. Round 12 re-pinned every LSH-tier declared query")
    print("(v02/v03/v08/v12/v23/v32/v33) on the scale-safe derivation, in")
    print("three measured steps, each oracle-replayed (the DuckDB `np` CTE")
    print("re-derives the identical plane/bucket counts from count(*) over")
    print("a gated 24-plane literal master — see PipelineQueries):")
    print()
    print("1. `Similarity.autoPlanes` alone (planes ~ log2(n/target)):")
    print("   exponent 2.72 -> 1.81. Still flagged — power-of-2 bucket")
    print("   stepping lets expected population oscillate in [target/2,")
    print("   target], and this particular 3x step straddles a plane")
    print("   increment (population x1.5 AND probes x9/8 at once).")
    print("2. mod-B signature fold (`Similarity.autoBuckets`): bucket =")
    print("   sig % B with B = ceil(n/128) — population pinned EXACTLY at")
    print("   target for any n; recall can only improve (signature equality")
    print("   implies fold equality, so every pure-space candidate")
    print("   survives the fold). Analytic candidate counts (numpy replay")
    print("   of the exact planes over the generated corpora): 27.6M ->")
    print("   102.8M, ratio 3.73 for the 3x corpus — exponent 1.20 at the")
    print("   candidate level, the residual over 3.0x being measured bucket")
    print("   skew (max population 326 -> 569).")
    print("3. zero-merge dedup elision: the (query, neighbor) max-agg only")
    print("   runs where a pair CAN meet twice (the served path's append")
    print("   epochs). Inline, a corpus vector is bucketed once and probe")
    print("   buckets are distinct, so the agg was a full exchange + two")
    print("   hash passes over ~100M candidate rows combining nothing —")
    print("   measured 29.8 -> 16.7 s at ~sf3 when dropped.")
    print()
    print("Final declared config: 5.7 s (~sf1) -> 18.4 s (~sf3), exponent")
    print("~1.07 — linear with the +1-probe log factor, 13x faster absolute")
    print("at ~sf3 than the round-11 config. LshHotBucketSpec pins the")
    print("sizing math, fold-superset semantics, inline no-dedup ≡ dedup on")
    print("unique ids, and auto ≡ fixed at the derived counts.")
if args.leg4:
    print()
    print("## Leg 4: ~sf3 -> ~sf10 (steepest near-linear queries, GenScale 100x corpus)")
    print()
    print(leg(args.leg4[0], args.leg4[1], args.leg4_ratio))
    print()
    print("Leg 4 exists to separate LINEAR from n·log n on the queries leg")
    print("3 measured steepest (d04 0.89, d11 0.89, t36 0.82, d14 0.81):")
    print("one more ~3.3x step at sizes where data already dominates")
    print("constants. An exponent holding near 1 across legs 3 AND 4 is")
    print("linear-with-overhead; a rising series would be the n·log n (or")
    print("worse) signature; anything above 1.2 gets the v23 treatment")
    print("(structural analysis + in-engine mitigation + disclosure).")
if args.gates:
    print()
    print("## Size-gate crossover evidence (graft.ScaleGates)")
    print()
    print("```")
    print(open(args.gates).read().rstrip())
    print("```")
