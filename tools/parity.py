#!/usr/bin/env python3
"""Local self-check mirroring the driver's correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
same sf tables, normalizes both (columns sorted by name, rows sorted), and
reports per-query match/mismatch. Dev tooling only — the shipped engine is
pure Scala/Spark.
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # big-SF probes: bound DuckDB's memory and let it spill to disk instead
    # of dying on allocation (line-explode oracles at 100x SF need this).
    # Targeted re-runs of the heaviest oracles (simhash64 pairwise,
    # configured_pipeline_view at sf10) override via GRAFT_DUCK_MEM — the
    # 24GB default still OOMs or crawls on those two.
    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '24GB')}'")
    if "GRAFT_DUCK_THREADS" in os.environ:
        con.execute(f"SET threads={int(os.environ['GRAFT_DUCK_THREADS'])}")
    os.makedirs("/tmp/duck_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output")
            n_bad += 1
            continue
        sq = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
        s_cols, s_rows = normalize(sq.fetchall(), list(sq.columns))
        dq = con.sql(sql)
        d_cols, d_rows = normalize(dq.fetchall(), list(dq.columns))
        if s_cols != d_cols:
            print(f"[FAIL] {name}: columns differ spark={s_cols} duck={d_cols}")
            n_bad += 1
        elif s_rows != d_rows:
            n_bad += 1
            print(f"[FAIL] {name}: rows differ (spark {len(s_rows)} vs duck {len(d_rows)})")
            for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                if a != b:
                    print(f"   first diff row {i}:\n    spark={a}\n    duck ={b}")
                    break
            if len(s_rows) != len(d_rows):
                only_s = set(s_rows) - set(d_rows)
                only_d = set(d_rows) - set(s_rows)
                for r in list(only_s)[:2]:
                    print(f"   only-spark: {r}")
                for r in list(only_d)[:2]:
                    print(f"   only-duck : {r}")
        else:
            n_ok += 1
            print(f"[ OK ] {name}: {len(s_rows)} rows")
    # queries without oracle (rows-only)
    for d in sorted(os.listdir(out_dir)):
        if only is not None and d not in only:
            continue
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{out_dir}/{d}/*.parquet'").fetchone()[0]
            print(f"[ROWS] {d}: {n} rows (no oracle)")
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    # optional third arg: comma-separated query-name filter (dev iteration)
    names = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], names))
