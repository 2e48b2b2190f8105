#!/usr/bin/env python3
"""Regenerate plans/bench_steady.tsv — the per-query steady-state
reference times Bench's anomaly guard triggers against.

Source options (first match wins):
  --bench target/bench.json   a bench.json from a controlled
                              SPARK_GRAFT_REPEAT=2 run (preferred: the
                              kept value is the LAST of two repeats, so
                              plan compile / page-cache cold cost is out)
  --scaling SCALING.md        fallback bootstrap: the sf-high column of
                              the scaling table (also REPEAT=2 figures)

The output pins the SF directory the times were measured at; Bench
ignores the file when benched at any other SF.

Usage:
  python3 scripts/steady_baseline.py --bench target/bench.json
  python3 scripts/steady_baseline.py --scaling SCALING.md
"""
import argparse
import json
import re
import sys


def from_bench(path):
    with open(path) as f:
        d = json.load(f)
    return d["sf"], dict(sorted(d["queries"].items()))


def from_scaling(path):
    rows = {}
    sf = None
    with open(path) as f:
        for line in f:
            m = re.match(r"\| (\w+) \| ([\d.]+) \| ([\d.]+) \|", line)
            if m:
                rows[m.group(1)] = float(m.group(3))
            h = re.search(r"t\((\S+)\) s \|$", line)
            # header row: "| query | t(lo) s | t(hi) s | exponent | |"
            hs = re.findall(r"t\((\S+)\) s", line)
            if len(hs) == 2:
                sf = hs[1]
    if sf is None or not rows:
        sys.exit(f"could not parse scaling table from {path}")
    return sf, dict(sorted(rows.items()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench")
    ap.add_argument("--scaling")
    ap.add_argument("--out", default="plans/bench_steady.tsv")
    args = ap.parse_args()
    if args.bench:
        sf, rows = from_bench(args.bench)
    elif args.scaling:
        sf, rows = from_scaling(args.scaling)
    else:
        sys.exit("need --bench or --scaling")
    with open(args.out, "w") as f:
        f.write("# per-query steady-state seconds; Bench retries any "
                "measurement > max(3x steady, 2s)\n")
        f.write(f"# sf={sf}\n")
        for name, t in rows.items():
            f.write(f"{name}\t{t:.3f}\n")
    print(f"wrote {len(rows)} entries ({sf}) to {args.out}")


if __name__ == "__main__":
    main()
