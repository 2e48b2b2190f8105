#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each
Verify-produced parquet, run the oracle SQL in DuckDB over the same
testdata tables, and compare (columns sorted by name, floats rounded
to 4 decimals, rows in result order)."""
import json, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 4)
            vals.append(str(v))
        out.append("|".join(vals))
    return out

fails, passes, skipped = [], [], []
for name in sorted(os.listdir(out_dir)):
    p = os.path.join(out_dir, name)
    if not os.path.isdir(p):
        continue
    files = glob.glob(f"{p}/*.parquet")
    if not files:
        fails.append((name, "no parquet output")); continue
    got_rel = con.sql(f"SELECT * FROM '{p}/*.parquet'")
    got_cols = [c.lower() for c in got_rel.columns]
    got = canon(got_rel.fetchall(), got_cols)
    if name not in oracle:
        skipped.append((name, len(got))); continue
    try:
        exp_rel = con.sql(oracle[name])
        exp_cols = [c.lower() for c in exp_rel.columns]
        exp = canon(exp_rel.fetchall(), exp_cols)
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    if sorted(got_cols) != sorted(exp_cols):
        fails.append((name, f"schema: spark={sorted(got_cols)} duck={sorted(exp_cols)}"))
    elif got != exp:
        diff = next((i for i, (a, b) in enumerate(zip(got, exp)) if a != b),
                    min(len(got), len(exp)))
        fails.append((name, f"rows spark={len(got)} duck={len(exp)}; first diff @{diff}: "
                      f"spark={got[diff] if diff < len(got) else '<none>'} "
                      f"duck={exp[diff] if diff < len(exp) else '<none>'}"))
    else:
        passes.append(name)

print(f"PASS {len(passes)}  FAIL {len(fails)}  ROWS-ONLY {len(skipped)}")
for n, c in skipped:
    print(f"  rows-only {n}: {c} rows")
for n, msg in fails:
    print(f"  FAIL {n}: {msg}")
sys.exit(1 if fails else 0)
