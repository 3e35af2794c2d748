#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run
the oracle SQL from oracle_sql.json in DuckDB over views of the sfDir
tables, sort columns by name, sort rows, and compare values exactly.
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df

def celleq(a, b):
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Silent-drop guard (r10): every query Verify was asked to run must
    # have a result dir — a build/write failure leaves none, and a
    # comparator that only iterates dirs would report a false all-clear.
    reg_path = os.path.join(out_dir, "_registry.txt")
    if os.path.exists(reg_path):
        wanted = [l.strip() for l in open(reg_path) if l.strip()]
        missing = [n for n in wanted
                   if not os.path.isdir(os.path.join(out_dir, n))]
        for n in missing:
            print(f"FAIL {n}: MISSING result dir (query errored in Verify)")
            n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got = pd.read_parquet(qdir)
        if name not in oracle:
            print(f"ROWSONLY {name}: rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = norm(got.copy()), norm(exp.copy())
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        bad = None
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if not celleq(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i}: spark={a!r} duckdb={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
