#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare (schema-insensitively,
column-name-sorted, exact values) with the parquet the Verify main dumped.

Matches the driver's asymmetric readers (learned in round-1 judging):
the Spark dump is read via pyarrow/pandas (DECIMAL -> decimal.Decimal
with trailing zeros, arrays -> numpy.ndarray that crashes sort_values)
while the oracle comes from duckdb .df() (DECIMAL -> float64). So any
DECIMAL or array/struct column in a query output fails here, as it
would in the driver.

Usage: check_oracle.py <sfdir> <verify_out_dir>
"""
import json, sys, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                        ignore_index=True)
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fail += 1
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        fail += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
        fail += 1
        continue
    try:
        gs = got.sort_values(by=list(got.columns), ignore_index=True).astype(str)
        es = exp.sort_values(by=list(exp.columns), ignore_index=True).astype(str)
    except Exception as e:
        print(f"FAIL {name}: sort/stringify crashed (array column?): {e}")
        fail += 1
        continue
    if not gs.equals(es):
        diff = (gs != es).any(axis=1)
        print(f"FAIL {name}: value mismatch, first diffs:")
        print("  got:", gs[diff].head(3).to_dict("records"))
        print("  exp:", es[diff].head(3).to_dict("records"))
        fail += 1
        continue
    # dtype check (schema-ish)
    gt = [str(t) for t in con.sql(f"SELECT * FROM read_parquet({files!r})").types]
    et = [str(t) for t in con.sql(sql).types]
    flag = "" if sorted(gt) == sorted(et) else f"  [type diff: {gt} vs {et}]"
    print(f"OK   {name}: {len(got)} rows{flag}")
print(f"\n{len(oracle) - fail}/{len(oracle)} oracle queries match")
sys.exit(1 if fail else 0)
