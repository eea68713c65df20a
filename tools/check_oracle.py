#!/usr/bin/env python3
"""Dev-only pre-check harness: simulates the driver's DuckDB oracle
compare against a Verify output directory. Not part of the shipped
library (the Scala engine has no Python dependency).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [artifact.json]

Round 14 (VERDICT r13 #1 — the driver's CORRECTNESS_r13.json came back
empty, plausibly an oracle-cost timeout): every query now reports its
DuckDB oracle seconds, the run can persist a builder-side JSON artifact
(per-query status/rows/oracle_sec) so the round's hard signal survives
any driver-side hiccup, and queries whose oracle exceeds ORACLE_BUDGET_S
are flagged at the end as timeout risks.
"""
import sys, json, glob, os, time
import duckdb
import pandas as pd

ORACLE_BUDGET_S = 60.0  # flag any single oracle costing more than this

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


def main(out_dir: str, sf_dir: str, artifact: str = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = {}
    slow = []

    def record(name, status, rows=None, sec=None, detail=None):
        results[name] = {"status": status}
        if rows is not None:
            results[name]["rows"] = int(rows)
        if sec is not None:
            results[name]["oracle_sec"] = round(sec, 3)
            if sec > ORACLE_BUDGET_S:
                slow.append((name, sec))
        if detail:
            results[name]["detail"] = detail

    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            record(name, "fail", detail="no spark output")
            n_fail += 1
            continue
        t0 = time.monotonic()
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            record(name, "fail", detail=f"oracle sql error: {e}")
            n_fail += 1
            continue
        osec = time.monotonic() - t0
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns got={sorted(got.columns)} "
                  f"exp={sorted(exp.columns)}")
            record(name, "fail", sec=osec, detail="column mismatch")
            n_fail += 1
            continue
        # dtype drift warning (driver may compare schemas)
        for c in got.columns:
            gd, ed = str(got[c].dtype), str(exp[c].dtype)
            if gd != ed:
                print(f"  WARN {name}.{c}: dtype spark={gd} duckdb={ed}")
        if len(got) != len(exp):
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}")
            record(name, "fail", sec=osec,
                   detail=f"rows got={len(got)} exp={len(exp)}")
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
            record(name, "fail", rows=len(got), sec=osec,
                   detail=f"value mismatch at {idx}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows, oracle {osec:.2f}s)")
        record(name, "pass", rows=len(got), sec=osec)
        n_pass += 1
    total_sec = sum(r.get("oracle_sec", 0.0) for r in results.values())
    print(f"== {n_pass} pass, {n_fail} fail; "
          f"total oracle {total_sec:.1f}s ==")
    for name, sec in sorted(slow, key=lambda x: -x[1]):
        print(f"  SLOW-ORACLE {name}: {sec:.1f}s "
              f"(budget {ORACLE_BUDGET_S:.0f}s — driver-timeout risk)")
    if artifact:
        payload = {
            "sf_dir": sf_dir,
            "n_pass": n_pass,
            "n_fail": n_fail,
            "total_oracle_sec": round(total_sec, 1),
            "queries": results,
        }
        with open(artifact, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"artifact -> {artifact}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
