#!/usr/bin/env python3
"""Exact in-engine parity for huge integer-valued results (r13).

tools/parity.py fetches both result sets into Python and hash-compares —
right for float-bearing rows (normalization must match the driver), but a
22M-row pair table OOMs the Python side. For an ALL-INTEGER result the
exact set comparison can run entirely inside DuckDB with spill:
counts + EXCEPT ALL in both directions == the same all-rows-all-values
guarantee, no materialization outside the engine.
"""
import json
import sys

import duckdb

sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
con.execute("SET memory_limit='48GB'")
con.execute("SET temp_directory='/tmp/duck_spill'")
con.execute("SET preserve_insertion_order=false")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
cols = [c[0] for c in con.sql(f"DESCRIBE ({sql})").fetchall()]
types = {c[0]: c[1] for c in con.sql(f"DESCRIBE ({sql})").fetchall()}
bad = {c: t for c, t in types.items()
       if not any(k in t.upper() for k in ("INT", "BIGINT", "VARCHAR", "BOOL", "DATE"))}
assert not bad, f"non-exact column types, use tools/parity.py: {bad}"
collist = ", ".join(sorted(cols))
# materialize ONCE: the oracle CTE is the expensive side (band join +
# 64-substr hamming over candidates) and is consumed three times below
con.execute(f"CREATE TEMP TABLE spark_r AS SELECT {collist} FROM '{out_dir}/{name}/*.parquet'")
con.execute(f"CREATE TEMP TABLE duck_r AS SELECT {collist} FROM ({sql})")
n_s = con.sql("SELECT count(*) FROM spark_r").fetchone()[0]
n_d = con.sql("SELECT count(*) FROM duck_r").fetchone()[0]
only_s = con.sql("SELECT count(*) FROM (SELECT * FROM spark_r EXCEPT ALL SELECT * FROM duck_r)").fetchone()[0]
only_d = con.sql("SELECT count(*) FROM (SELECT * FROM duck_r EXCEPT ALL SELECT * FROM spark_r)").fetchone()[0]
ok = n_s == n_d and only_s == 0 and only_d == 0
tag = "OK" if ok else "FAIL"
print(f"[ {tag} ] {name}: spark={n_s} duck={n_d} only_spark={only_s} only_duck={only_d} (in-engine exact)")
sys.exit(0 if ok else 1)
