#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the sfDir parquet tables
and compares (sorted rows, column names sorted) with the Spark parquet dump
produced by `runMain graft.Verify <sfDir> <verifyOutDir>`.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    # sort columns by name, then rows by string repr — mirrors a
    # column-name-sorted value hash
    df = df[sorted(df.columns)]
    rows = [tuple(str(v) for v in r) for r in df.itertuples(index=False)]
    return sorted(rows)

def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out)):
        d = os.path.join(out, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = con.execute(
            f"SELECT * FROM read_parquet({[f for f in files]!r})").df()
        if name not in oracle:
            print(f"SKIP  {name}: rows={len(got)} (no oracle)")
            n_skip += 1
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        cg, cw = canon(got), canon(want)
        if sorted(map(str.lower, got.columns)) != sorted(map(str.lower, want.columns)):
            print(f"FAIL  {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
            n_fail += 1
        elif cg == cw:
            print(f"PASS  {name}: rows={len(cg)}")
            n_pass += 1
        else:
            print(f"FAIL  {name}: rows spark={len(cg)} duckdb={len(cw)}")
            diff = [x for x in cg if x not in set(cw)][:3]
            diff2 = [x for x in cw if x not in set(cg)][:3]
            print(f"      spark-only: {diff}")
            print(f"      duck-only : {diff2}")
            n_fail += 1
    print(f"== pass={n_pass} fail={n_fail} rows_only={n_skip}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
