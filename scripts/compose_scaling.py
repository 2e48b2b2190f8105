#!/usr/bin/env python3
"""Compose SCALING.md from the multi-leg sweep:

  leg 1: all declared queries, sf0.01 -> sf0.1 (driver testdata)
  leg 2: the heavy d/e/v/t tier, sf0.1 -> ~sf1 (graft.GenScale corpus
         under target/, ~10x sf0.1) — the leg where data dominates
         per-query constants, so exponents separate linear from
         overhead-bound, and the size-gated paths (BFS/CC local
         finishes, iteration conf) run their OVER-cap forms
  leg 3 (optional): the heaviest queries, ~sf1 -> ~sf3 (30x sf0.1) —
         a third point so the heavy-tier trend is a series, not a
         single ratio

Usage:
  scripts/compose_scaling.py --leg1 lo.json hi.json \
      --leg2 lo.json hi.json [--leg3 lo.json hi.json --leg3-ratio 3] \
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
ap.add_argument("--gates")
args = ap.parse_args()

print("# SCALING — multi-leg scaling sweep")
print()
print("Leg 1 spans the driver testdata (sf0.01 -> sf0.1, every declared")
print("query); legs 2-3 extend the sweep past the driver data with")
print("seeded ~10x / ~30x corpora (`graft.GenScale`, structure-preserving")
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
    print("## Leg 3: ~sf1 -> ~sf3 (heaviest queries, GenScale 30x corpus)")
    print()
    print(leg(args.leg3[0], args.leg3[1], args.leg3_ratio))
    print()
    print("**On the v23 flag (fixed-plane LSH is quadratic-until-cap by")
    print("construction):** the declared v23 pins `numPlanes = 6` because")
    print("its DuckDB oracle replays those literal hyperplanes — with a")
    print("FIXED plane count the bucket space is constant (2^6 = 64), so")
    print("bucket population grows linearly with the corpus and the")
    print("self-join candidate total grows as n²/2^p until the hot-bucket")
    print("cap (4096) truncates it. That is a property of the pinned")
    print("CONFIG, not the operator: the engine's scale default,")
    print("`Similarity.lshTopKAuto`/`autoPlanes`, grows planes with")
    print("log(corpus) to hold the expected bucket population constant —")
    print("the `[gate:lsh-planes]` line below measures it near-linear")
    print("(~4x time for 3x corpus, where the fixed config ran ~20x), and")
    print("LshHotBucketSpec pins the sizing math plus auto ≡ fixed at the")
    print("derived count.")
if args.gates:
    print()
    print("## Size-gate crossover evidence (graft.ScaleGates)")
    print()
    print("```")
    print(open(args.gates).read().rstrip())
    print("```")
