#!/usr/bin/env python3
"""Cross-check Verify output against the DuckDB oracles (mirrors the round
driver's correctness gate: per-query rows / schema / value-hash compare with
columns sorted by name). Dev tool only — not part of the shipped library.

Usage: python3 tools/oracle_check.py <sf_dir> <verify_out_dir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # canonical row order: sort by all columns stringified
    key = df.astype(str).apply(lambda r: "\x01".join(r.values), axis=1)
    df = df.iloc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_noora = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q_*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        if only and name not in only:
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        sql = oracles.get(name)
        if not sql:
            n_noora += 1
            print(f"{name:24s} NO_ORACLE rows={len(spark_df)}")
            continue
        try:
            ora_df = con.execute(sql).fetchdf()
        except Exception as e:
            n_fail += 1
            print(f"{name:24s} ORACLE_ERR {e}")
            continue
        a, b = norm(spark_df), norm(ora_df)
        rows_ok = len(a) == len(b)
        schema_ok = list(a.columns) == list(b.columns)
        hash_ok = False
        if rows_ok and schema_ok:
            hash_ok = a.astype(str).equals(b.astype(str))
        ok = rows_ok and schema_ok and hash_ok
        n_pass += ok
        n_fail += (not ok)
        status = "PASS" if ok else "FAIL"
        print(f"{name:24s} {status} rows={len(a)}/{len(b)} schema={schema_ok} hash={hash_ok}")
        if not ok and rows_ok and schema_ok:
            diff = a.astype(str) != b.astype(str)
            idx = diff.any(axis=1)
            print("  first diffs (spark vs oracle):")
            print(a[idx].head(3).to_string())
            print(b[idx].head(3).to_string())
    print(f"== {n_pass} pass, {n_fail} fail, {n_noora} no_oracle ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
