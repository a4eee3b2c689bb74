#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: load the Spark parquet
result, run the corresponding oracle SQL (oracle_sql.json) in DuckDB
with each table registered as a view over <sfDir>/<t>.parquet, sort
columns by name and rows by all columns, and diff.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue
        # driver fixtures are single files; graft.tools.DataGen output
        # is a directory of part files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        if t == "events":
            # driver events.ts is TIMESTAMP(NANOS); DataGen writes raw
            # INT64 nanos (Spark cannot emit nanos timestamps) — view
            # them identically so epoch_us() oracles work on both
            ts_type = con.sql(f"SELECT typeof(ts) FROM '{src}' LIMIT 1").fetchone()[0]
            if ts_type == "BIGINT":
                con.sql(f"CREATE VIEW {t} AS SELECT * REPLACE "
                        f"(make_timestamp(ts // 1000) AS ts) FROM '{src}'")
                continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/q_*")):
        name = os.path.basename(qdir)
        try:
            got = pd.read_parquet(qdir)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(got)} rows")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as ae:
            msg = str(ae).split("\n")
            print(f"FAIL {name}: {' | '.join(msg[:4])}")
            # show first differing rows
            neq = (g != e) & ~(g.isna() & e.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad[bad].index[0]
                print(f"  first diff row {i}:\n  got: {g.loc[i].to_dict()}\n  exp: {e.loc[i].to_dict()}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
