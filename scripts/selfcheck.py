#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet, sorts
columns by name and rows by all columns, and compares values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize dtypes for compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = pd.read_parquet(d)
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status:18s} {name} rows={len(got)}")
            n_pass += len(got) > 0
            n_fail += len(got) == 0
            continue
        exp = con.execute(oracle[name]).fetchdf()
        g, e = canon(got), canon(exp)
        ok = False
        why = ""
        if list(g.columns) != list(e.columns):
            why = f"columns {list(g.columns)} vs {list(e.columns)}"
        elif len(g) != len(e):
            why = f"rowcount {len(g)} vs {len(e)}"
        else:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                              check_exact=False, rtol=1e-6, atol=1e-6)
                ok = True
            except AssertionError as ex:
                why = str(ex).split("\n")[0:3]
        if ok:
            n_pass += 1
            print(f"{'PASS':18s} {name} rows={len(g)}")
        else:
            n_fail += 1
            print(f"{'FAIL':18s} {name}: {why}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
