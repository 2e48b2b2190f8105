#!/usr/bin/env python3
"""Double-run determinism gate: compare two graft.Verify output dirs
as row MULTISETS. Catches run-to-run nondeterminism (partition-order
ties, unstable sketches) that a single DuckDB-oracle pass can miss.

Rows are compared order-insensitively: the parquet part-file glob order
(and the intra-file row order of an un-ORDERed write) reflects the
partition split of that particular run, which is allowed to differ
between runs — the driver's own hash compare also sorts first. Queries
present in only ONE dir are reported as missing rather than skipped.

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/gv_a"
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/gv_b"
  python3 scripts/determinism_check.py /tmp/gv_a /tmp/gv_b
"""
import glob
import os
import sys

import duckdb

a = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gv_a"
b = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gv_b"


def query_dirs(root):
    return {n for n in os.listdir(root) if os.path.isdir(os.path.join(root, n))}


names_a, names_b = query_dirs(a), query_dirs(b)
con = duckdb.connect()
diff, n = [], 0
for name in sorted(names_a | names_b):
    if name not in names_a or name not in names_b:
        diff.append((name, f"present only in {a if name in names_a else b}"))
        continue
    pa, pb = os.path.join(a, name), os.path.join(b, name)
    n += 1
    if not glob.glob(pa + "/*.parquet") or not glob.glob(pb + "/*.parquet"):
        diff.append((name, "missing output"))
        continue
    ra = sorted(map(repr, con.sql(f"SELECT * FROM '{pa}/*.parquet'").fetchall()))
    rb = sorted(map(repr, con.sql(f"SELECT * FROM '{pb}/*.parquet'").fetchall()))
    if ra != rb:
        diff.append((name, f"rows differ ({len(ra)} vs {len(rb)})"))

print(f"compared {n} queries")
if diff:
    for name, why in diff:
        print(f"  NONDETERMINISTIC {name}: {why}")
    sys.exit(1)
print("all deterministic")
