#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> [sf_dir]

Reads each <name>/ parquet result produced by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf parquet tables, and
compares: schema (column names), row count, and a hash over rows with columns
sorted by name (values rounded as-is — queries are expected to round floats
themselves).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    dumped = set(d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d)))
    # iterate the UNION of dumped results and declared oracles: a query whose
    # dump failed (no result dir) must show up as FAIL, not vanish
    names = sorted(dumped | set(oracles))
    n_pass = n_fail = n_weak = 0
    for name in names:
        if name not in dumped:
            print(f"FAIL       {name}: no result dump (query failed in Verify)")
            n_fail += 1
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            print(f"ROWS-ONLY  {name}: {len(got)} rows")
            n_weak += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL       {name}: oracle error: {e}")
            n_fail += 1
            continue
        gc, ec = canon(got), canon(exp)
        if list(gc.columns) != list(ec.columns):
            print(f"FAIL       {name}: columns {list(gc.columns)} vs oracle {list(ec.columns)}")
            n_fail += 1
            continue
        if len(gc) != len(ec):
            print(f"FAIL       {name}: rows {len(gc)} vs oracle {len(ec)}")
            n_fail += 1
            continue
        # value compare (exact string repr after canonicalization)
        mism = None
        for c in gc.columns:
            a, b = gc[c].tolist(), ec[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if str(x) != str(y) and not (pd.isna(x) and pd.isna(y)):
                    mism = (c, i, x, y)
                    break
            if mism:
                break
        if mism:
            print(f"FAIL       {name}: first mismatch col={mism[0]} row={mism[1]}: {mism[2]!r} vs {mism[3]!r}")
            n_fail += 1
        else:
            print(f"PASS       {name}: {len(gc)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
