#!/usr/bin/env python3
"""Double-run determinism gate: compare two graft.Verify output dirs
row-for-row. Catches run-to-run nondeterminism (partition-order ties,
unstable sketches) that a single DuckDB-oracle pass can miss.

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

con = duckdb.connect()
diff, n = [], 0
for name in sorted(os.listdir(a)):
    pa, pb = os.path.join(a, name), os.path.join(b, name)
    if not os.path.isdir(pa):
        continue
    n += 1
    if not glob.glob(pa + "/*.parquet") or not glob.glob(pb + "/*.parquet"):
        diff.append((name, "missing output"))
        continue
    ra = con.sql(f"SELECT * FROM '{pa}/*.parquet'").fetchall()
    rb = con.sql(f"SELECT * FROM '{pb}/*.parquet'").fetchall()
    if ra != rb:
        diff.append((name, f"rows differ ({len(ra)} vs {len(rb)})"))

print(f"compared {n} queries")
if diff:
    for name, why in diff:
        print(f"  NONDETERMINISTIC {name}: {why}")
    sys.exit(1)
print("all deterministic")
