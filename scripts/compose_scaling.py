#!/usr/bin/env python3
"""Compose SCALING.md from the two-leg sweep:

  leg 1: all declared queries, sf0.01 -> sf0.1 (driver testdata)
  leg 2: the heavy d/e/v/t tier, sf0.1 -> ~sf1 (graft.GenScale corpus
         under target/, ~10x sf0.1) — the leg where data dominates
         per-query constants, so exponents separate linear from
         overhead-bound, and the size-gated paths (BFS/CC local
         finishes, iteration conf) run their OVER-cap forms.

Usage:
  scripts/compose_scaling.py leg1_lo.json leg1_hi.json \
      leg2_lo.json leg2_hi.json [gates.txt] > SCALING.md
"""
import subprocess
import sys

HERE = "scripts/scaling_report.py"


def leg(lo, hi):
    out = subprocess.run(
        [sys.executable, HERE, lo, hi, "10"],
        check=True, capture_output=True, text=True).stdout
    # demote the per-leg H1/H2 under the composed document's headings
    return out.replace("# SCALING — heavy-tier scaling exponents",
                       "### Exponents").replace("## Findings",
                                                "### Findings")


print("# SCALING — two-leg scaling sweep")
print()
print("Leg 1 spans the driver testdata (sf0.01 -> sf0.1, every declared")
print("query); leg 2 extends the sweep past the driver data with a")
print("seeded ~10x corpus (`graft.GenScale`, structure-preserving per")
print("replica, structure-breaking across replicas, written under")
print("`target/` only) over the heavy d/e/v/t tier — the leg where data")
print("volume dominates per-query constants AND the size-gated paths")
print("cross over to their distributed over-cap forms (see the gate")
print("evidence at the end). Both legs: same-window back-to-back")
print("`SPARK_GRAFT_REPEAT=2` runs; exponent = log(t_hi/t_lo)/log(10).")
print()
print("## Leg 1: sf0.01 -> sf0.1 (all queries)")
print()
print(leg(sys.argv[1], sys.argv[2]))
print()
print("## Leg 2: sf0.1 -> ~sf1 (heavy tier, GenScale corpus)")
print()
print(leg(sys.argv[3], sys.argv[4]))
if len(sys.argv) > 5:
    print()
    print("## Size-gate crossover evidence (graft.ScaleGates)")
    print()
    print("```")
    print(open(sys.argv[5]).read().rstrip())
    print("```")
