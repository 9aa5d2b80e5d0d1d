#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the oracle SQL from oracle_sql.json
in DuckDB over the same sf tables, canonicalize both (sort columns by
name, sort rows, normalize types), and compare.

Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            s = s.map(lambda v: "null" if pd.isna(v) else f"{v:.6g}")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64").astype(str)
        else:
            s = s.map(lambda v: "null" if v is None or (isinstance(v, float) and math.isnan(v)) else str(v))
        out[c] = s.astype(str)
    r = pd.DataFrame(out)
    return r.sort_values(by=list(r.columns)).reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            mine = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})"); n_fail += 1; continue
        try:
            ref = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        a, b = canon(mine), canon(ref)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        if not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"FAIL {name}: value mismatch on {neq.sum()}/{len(a)} rows")
            print("  spark:", a[neq].head(3).to_dict("records"))
            print("  duck :", b[neq].head(3).to_dict("records"))
            n_fail += 1; continue
        print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
