#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Mimics the driver: runs each oracle SQL in DuckDB against the sf tables,
loads the Spark-side parquet that graft.Verify dumped, sorts columns by
name and rows by value, and diffs. Usage:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 scripts/local_check.py /root/testdata/sf0.01 /tmp/verify_out [CORRECTNESS_LOCAL_rN.json]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str, json_out: str = None) -> int:
    results = {}
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        spark_df = duckdb.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracles:
            print(f"{name:26s} rows-only: {len(spark_df)} rows "
                  f"{'OK' if len(spark_df) > 0 else 'EMPTY (suspicious)'}")
            results[name] = {"status": "rows_only", "rows": len(spark_df)}
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:26s} ORACLE SQL ERROR: {e}")
            results[name] = {"status": "oracle_error", "error": str(e)[:200]}
            failures += 1
            continue
        a, b = norm(spark_df), norm(oracle_df)
        if list(a.columns) != list(b.columns):
            print(f"{name:26s} SCHEMA MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
            results[name] = {"status": "schema_mismatch"}
            failures += 1
            continue
        if len(a) != len(b):
            print(f"{name:26s} ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}")
            results[name] = {"status": "rowcount_mismatch", "spark": len(a), "oracle": len(b)}
            failures += 1
            continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            print(f"{name:26s} VALUE MISMATCH on {bad.sum()}/{len(a)} rows")
            with pd.option_context("display.width", 200):
                print("  spark:", a[bad].head(3).to_dict("records"))
                print("  oracle:", b[bad].head(3).to_dict("records"))
            results[name] = {"status": "value_mismatch", "bad_rows": int(bad.sum()), "rows": len(a)}
            failures += 1
            continue
        print(f"{name:26s} MATCH ({len(a)} rows)")
        results[name] = {"status": "match", "rows": len(a)}
    print(f"\n{failures} failures")
    if json_out:
        summary = {
            "n_queries": len(results),
            "n_match": sum(1 for r in results.values() if r["status"] == "match"),
            "n_rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
            "n_failures": failures,
            "queries": results,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
