#!/usr/bin/env python3
"""Dev-only pre-check harness: simulates the driver's DuckDB oracle
compare against a Verify output directory. Not part of the shipped
library (the Scala engine has no Python dependency).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # hash-style compare: stringify values deterministically
    def conv(v):
        if v is None or v != v:  # NaN/None
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    out = df.applymap(conv)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns got={sorted(got.columns)} "
                  f"exp={sorted(exp.columns)}")
            n_fail += 1
            continue
        # dtype drift warning (driver may compare schemas)
        for c in got.columns:
            gd, ed = str(got[c].dtype), str(exp[c].dtype)
            if gd != ed:
                print(f"  WARN {name}.{c}: dtype spark={gd} duckdb={ed}")
        if len(got) != len(exp):
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if not g.equals(e):
            diff = (g != e).any(axis=1)
            idx = list(g.index[diff])[:3]
            print(f"FAIL {name}: value mismatch at rows {idx}")
            for i in idx[:2]:
                print(f"  got: {g.loc[i].to_dict()}")
                print(f"  exp: {e.loc[i].to_dict()}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
