#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare (columns sorted by name,
rows sorted, values compared exactly). Usage:
    python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        if not glob.glob(f"{res_dir}/*.parquet"):
            results[name] = "MISSING-SPARK-RESULT"
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        g, w = norm(got), norm(want)
        # The driver's hash is dtype-sensitive: DuckDB HUGEINT (from an
        # un-CAST integer SUM) arrives as float64 and hash-mismatches an
        # int64 Spark column even when every value is equal.
        dtype_drift = [
            c for c in g.columns if c in w.columns and
            (pd.api.types.is_integer_dtype(g[c]) != pd.api.types.is_integer_dtype(w[c])
             or pd.api.types.is_float_dtype(g[c]) != pd.api.types.is_float_dtype(w[c]))
        ]
        if dtype_drift:
            results[name] = ("DTYPE-MISMATCH " +
                             ", ".join(f"{c}: got={g[c].dtype} want={w[c].dtype}"
                                       for c in dtype_drift))
        elif list(g.columns) != list(w.columns):
            results[name] = f"SCHEMA-MISMATCH got={list(g.columns)} want={list(w.columns)}"
        elif len(g) != len(w):
            results[name] = f"ROWCOUNT-MISMATCH got={len(g)} want={len(w)}"
        else:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                              check_exact=True)
                results[name] = "OK"
            except AssertionError as e:
                # retry with tolerance to show near-misses
                try:
                    pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                                  check_exact=False, rtol=1e-9)
                    results[name] = "NEAR (float-tolerance only)"
                except AssertionError:
                    results[name] = "MISMATCH: " + str(e).split("\n")[0]
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(("PASS " if v == "OK" else "FAIL ") + f"{name}: {v}")
    print(f"\n{n_ok}/{len(results)} OK")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
