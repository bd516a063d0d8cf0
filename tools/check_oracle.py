#!/usr/bin/env python3
"""Local pre-check that mimics the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs the
matching oracle_sql.json entry in DuckDB over the raw testdata parquet, sorts
columns by name and rows by all columns, and compares values.
"""
import json
import sys

import duckdb


def canon(con, rel_sql):
    df = con.execute(rel_sql).fetch_df()
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # canonical string form per cell
    return df.astype(str), df.dtypes


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            mine, my_t = canon(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            ref, ref_t = canon(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(ref.columns)}")
            n_fail += 1
        elif len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}")
            n_fail += 1
        elif not mine.equals(ref):
            diff = (mine != ref).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())} differing rows; first:")
            print("  mine:", mine[diff].head(2).to_dict("records"))
            print("  ref :", ref[diff].head(2).to_dict("records"))
            print("  dtypes mine:", dict(my_t), " ref:", dict(ref_t))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
