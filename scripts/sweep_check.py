#!/usr/bin/env python3
"""sf0.1 sweep: local_check minus the oracles whose DuckDB formulation is
brute-force quadratic at that SF (all-pairs shingle intersections /
recursive-CTE closures). The ENGINE side runs those queries fine at sf0.1
(graft.Verify dumps them) — the skip is purely the oracle's cost; that
asymmetry is the point of the LSH scale paths. Usage:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01"
    python3 scripts/sweep_check.py /root/testdata/sf0.1 /tmp/verify_sf01
"""
import sys, os, json, glob
import duckdb
import pandas as pd

QUADRATIC_ORACLES = {
    "q_dedup_ngram", "q_dedup_ngram_capped", "q_dedup_containment",
    "q_dedup_ngram_incr", "q_dedup_cosine",
    "q_dedup_minhash", "q_dedup_embed", "q_dedup_embed_lsh",
    "q_dedup_clusters", "q_dedup_survivors", "q_dedup_best", "q_dedup_simhash",
    # the recursive-CTE Viterbi replays: DuckDB re-walks every word's
    # best/back arrays per CTE level — >10 CPU-hours at sf0.1's vocab
    # (measured r13), same oracle-cost-only class as the pair oracles;
    # the engine side runs these fine and both gate at sf0.01
    "q_unigram_train", "q_unigram_encode",
    # ppjoin's oracle is the deliberate all-pairs brute force (the engine
    # side is the prefix-filtered scale path; both gate at sf0.01)
    "q_dedup_ppjoin", "q_dedup_ppjoin_incr",
}

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = checked = skipped = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        if name in QUADRATIC_ORACLES:
            skipped += 1
            print(f"{name:26s} SKIP (quadratic oracle at this SF)")
            continue
        spark_df = duckdb.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracles:
            print(f"{name:26s} rows-only: {len(spark_df)} rows "
                  f"{'OK' if len(spark_df) > 0 else 'EMPTY (suspicious)'}")
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:26s} ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        # identical compare to local_check.py (sorted columns+rows, exact
        # equals with NaN==NaN), so a sweep MATCH means the same thing
        a, b = norm(spark_df), norm(oracle_df)
        checked += 1
        if list(a.columns) != list(b.columns):
            print(f"{name:26s} SCHEMA MISMATCH {list(a.columns)} vs {list(b.columns)}")
            failures += 1
        elif len(a) != len(b):
            print(f"{name:26s} ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}")
            failures += 1
        elif not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            print(f"{name:26s} VALUE MISMATCH on {bad.sum()}/{len(a)} rows")
            failures += 1
        else:
            print(f"{name:26s} MATCH ({len(a)} rows)")
    print(f"\n{checked} checked, {skipped} skipped, {failures} failures")
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
