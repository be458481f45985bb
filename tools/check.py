#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  1. registers each testdata parquet as a DuckDB view named after the table
  2. loads every SparkEntry query result parquet from <outDir>
  3. runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB
  4. sorts columns by name, sorts rows, value-compares

This is a dev tool only (driver-side python is available in the container);
the engine itself is pure Scala/Spark.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # results: name -> (passed: bool, detail: str). Pass/fail is a
    # STRUCTURED flag, never inferred from the human-readable detail text
    # (an embedded exception message ending in "OK" must not count as a
    # pass).
    results = {}
    result_dirs = {p.split("/")[-1] for p in glob.glob(f"{outdir}/*") if "." not in p.split("/")[-1]}
    # A query that throws before writing output has no result dir — diff
    # against the declared roster (query_names.json, written by Verify) so
    # regressions can't silently drop out of the report (round-4 lesson).
    try:
        declared = set(json.load(open(f"{outdir}/query_names.json")))
    except FileNotFoundError:
        declared = set()
    try:
        verrs = json.load(open(f"{outdir}/verify_errors.json"))
    except FileNotFoundError:
        verrs = {}
    for name in sorted(result_dirs | declared):
        if name not in result_dirs:
            results[name] = (False, "NO_SPARK_OUTPUT: " + verrs.get(name, "no error recorded"))
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            results[name] = (False, "NO_SPARK_OUTPUT: empty result dir")
            continue
        got = pd.read_parquet(f"{outdir}/{name}")
        if name not in oracle:
            results[name] = (len(got) > 0,
                             f"rows_only rows={len(got)} " + ("OK" if len(got) > 0 else "EMPTY"))
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = (False, f"ORACLE_SQL_ERROR: {e}")
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = (False, f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(e.columns)}")
            continue
        if len(g) != len(e):
            results[name] = (False, f"ROWCOUNT_MISMATCH spark={len(g)} duck={len(e)}")
            continue
        bad = None
        for col in g.columns:
            gv, ev = g[col].tolist(), e[col].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if not cells_equal(a, b):
                    bad = f"VALUE_MISMATCH col={col} row={i} spark={a!r} duck={b!r}"
                    break
            if bad:
                break
        results[name] = (bad is None, bad or f"OK rows={len(g)}")
    n_ok = sum(1 for ok, _ in results.values() if ok)
    for name, (ok, detail) in sorted(results.items()):
        print(f"[{'PASS' if ok else 'FAIL'}] {name}: {detail}")
    print(f"== {n_ok}/{len(results)} pass ==")
    sys.exit(0 if n_ok == len(results) else 1)

if __name__ == "__main__":
    main()
