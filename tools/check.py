#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet result (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir parquet
tables, and compares: row count, column names (sorted), and values (columns
sorted by name, rows sorted by all columns). Prints PASS/FAIL per query.
"""
import json
import os
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def tune(con):
    """Optional DuckDB resource knobs for heavy-oracle reruns.

    The 20x-fresh graph/recall oracles can exceed DuckDB's default 80%%
    memory limit + cwd/.tmp spill budget on this host; CHECK_DUCKDB_MEM
    (e.g. '110GB'), CHECK_DUCKDB_THREADS and CHECK_DUCKDB_TMP let a solo
    rerun use the whole machine and the largest free disk instead.
    """
    mem = os.environ.get("CHECK_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    thr = os.environ.get("CHECK_DUCKDB_THREADS")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    tmp = os.environ.get("CHECK_DUCKDB_TMP")
    if tmp:
        Path(tmp).mkdir(parents=True, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")


def norm(v):
    if isinstance(v, float):
        if v != v:  # NaN (pandas null) — compare as None
            return None
        return round(v, 6)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    tune(con)
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # Spark-written table (e.g. tools.ScaleUp fixtures)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
            ora_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        s_cols, o_cols = sorted(spark_df.columns), sorted(ora_df.columns)
        if s_cols != o_cols:
            print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        if len(spark_df) != len(ora_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} oracle={len(ora_df)}")
            n_fail += 1
            continue
        s = spark_df[s_cols]
        o = ora_df[o_cols]
        # Strict dtype parity: the driver hashes byte encodings, so a DuckDB
        # HUGEINT (int128, surfaced as 'object'/'float64' by fetchdf) against
        # a Spark BIGINT is a hash FAIL even when values are equal.
        dt_diff = [(c, str(s[c].dtype), str(o[c].dtype)) for c in s_cols
                   if str(s[c].dtype) != str(o[c].dtype)]
        if dt_diff:
            print(f"FAIL {name}: dtype mismatch (spark vs oracle): {dt_diff}")
            n_fail += 1
            continue
        s_rows = sorted([tuple(norm(v) for v in r) for r in s.itertuples(index=False)],
                        key=repr)
        o_rows = sorted([tuple(norm(v) for v in r) for r in o.itertuples(index=False)],
                        key=repr)
        if s_rows == o_rows:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
        else:
            diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
