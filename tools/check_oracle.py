#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with views named after the tables
in <sfDir>, sorts columns by name and rows by all columns, and compares
values exactly. Prints a per-query verdict with the first diff if any.
"""
import json, sys, glob, os
import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def fresh_con(sf_dir):
    con = duckdb.connect()
    # Cap DuckDB well below the VM's commit limit: this box runs with no
    # swap and CommitLimit ~= RAM/2, so DuckDB's default memory_limit (80%
    # of RAM) makes mallocs sporadically fail ("Failed to allocate block
    # ... bad allocation") even with 100+ GB free. sf0.01 needs well under
    # a GB; 16 GB keeps the check comfortable and deterministic.
    # sf0.01 needs well under a GB; larger local sweeps (sf3+) can raise
    # the cap via GRAFT_DUCKDB_MEM (the ANN-family oracles' Lloyd CTEs
    # legitimately need tens of GB at 60k+ vectors)
    con.execute("SET memory_limit='%s'" % os.environ.get(
        "GRAFT_DUCKDB_MEM", "16GB"))
    con.execute("SET threads TO 16")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        # driver testdata ships single parquet files; MakeSf (sf1) writes
        # Spark-style directories of part files — accept both layouts
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    return con


def main(sf_dir, out_dir):
    con = fresh_con(sf_dir)
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_ok = n_bad = 0
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    for q in sorted(oracles):
        if only is not None and q.removesuffix(".parquet") not in only \
                and q not in only:
            continue
        res_dir = os.path.join(out_dir, q + ".parquet")
        if not os.path.isdir(res_dir):
            res_dir = os.path.join(out_dir, q)  # legacy layout
        if not os.path.isdir(res_dir):
            print(f"[MISS] {q}: no spark result dir")
            n_bad += 1
            continue
        try:
            spark_df = norm(con.execute(
                f"SELECT * FROM '{res_dir}/*.parquet'").df())
            duck_df = norm(con.execute(oracles[q]).df())
        except Exception as e:
            # a long run can fragment the buffer pool until one heavy CTE
            # hits a spurious "failed to pin block" OOM — retry once on a
            # fresh connection before declaring the query bad (observed on
            # the 54-query sf1 sweep: q_semdedup OOM'd at 14.9/14.9 GiB
            # while passing trivially on a clean connection)
            try:
                con.close()
                con = fresh_con(sf_dir)
                spark_df = norm(con.execute(
                    f"SELECT * FROM '{res_dir}/*.parquet'").df())
                duck_df = norm(con.execute(oracles[q]).df())
            except Exception:
                print(f"[ERR ] {q}: {e}")
                n_bad += 1
                continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"[BAD ] {q}: columns differ\n  spark: {list(spark_df.columns)}\n  duck:  {list(duck_df.columns)}")
            n_bad += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"[BAD ] {q}: row count {len(spark_df)} vs {len(duck_df)}")
            n_bad += 1
            continue
        diff_cols = []
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            if not a.equals(b):
                neq = ~((a == b) | (a.isna() & b.isna()))
                idx = neq[neq].index[:3].tolist()
                diff_cols.append((c, [(i, a[i], b[i]) for i in idx]))
        if diff_cols:
            print(f"[BAD ] {q}: {len(diff_cols)} column(s) differ")
            for c, samples in diff_cols[:5]:
                for i, av, bv in samples:
                    print(f"    {c}[{i}]: spark={av!r} duck={bv!r}")
            n_bad += 1
        else:
            print(f"[ OK ] {q}: {len(spark_df)} rows, {len(spark_df.columns)} cols")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
