#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (for builder iteration only).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark result) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with views over the
sfDir parquet tables. Sorts columns by name, sorts rows by all columns,
then compares exactly; reports per-query PASS/FAIL with diagnostics.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize list-typed cells to tuples so sorting/compare works
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
            exp = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        bad = []
        for c in got.columns:
            g, e = got[c], exp[c]
            if g.dtype.kind == 'f' or e.dtype.kind == 'f':
                ge, ee = g.astype(float).to_numpy(), e.astype(float).to_numpy()
                eq = (ge == ee) | (np.isnan(ge) & np.isnan(ee))
                if not eq.all():
                    d = np.nanmax(np.abs(ge - ee))
                    bad.append(f"{c}: {int((~eq).sum())} cells differ, max|Δ|={d:.3e}")
            else:
                eq = (g == e) | (g.isna() & e.isna())
                if not eq.all():
                    i = int(np.argmax(~eq.to_numpy()))
                    bad.append(f"{c}: {int((~eq).sum())} cells differ, e.g. row {i}: {g.iloc[i]!r} != {e.iloc[i]!r}")
        # dtype check (schema match)
        for c in got.columns:
            if got[c].dtype != exp[c].dtype:
                bad.append(f"{c}: dtype {got[c].dtype} != {exp[c].dtype}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad)); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    # queries with no oracle: rows-only
    declared = set(oracle)
    for d in sorted(os.listdir(outdir)):
        if os.path.isdir(f"{outdir}/{d}") and d not in declared:
            n = con.sql(f"SELECT count(*) FROM '{outdir}/{d}/*.parquet'").fetchone()[0]
            print(f"ROWS-ONLY {d}: {n} rows")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
