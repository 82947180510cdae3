#!/usr/bin/env python3
"""Targeted sf10 parity for dedup_simhash64_pairs (r13).

The registered oracle SQL is ONE fused pipeline; at sf10 its intermediates
(150M distinct doc-token hashes -> 9.6B unnested vote rows -> 100M+
candidate pairs carrying two 64-char strings each) exceed what DuckDB's
buffer accounting governs and the process dies on raw allocation even with
a 48-96GB limit and a spill dir (observed twice this round). This probe
executes the SAME CTE text STAGED into temp tables — semantics identical,
but each stage is a small pipeline DuckDB can spill — then compares
against the Spark output with counts + EXCEPT ALL (all-integer rows, so
the in-engine exact compare carries the same guarantee as the hash gate).
"""
import sys

import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf10_r13"

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
con.execute("SET memory_limit='60GB'")
con.execute("SET threads=16")
con.execute("SET temp_directory='/tmp/duck_spill'")
con.execute("SET preserve_insertion_order=false")
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")

# stage 1: the toks CTE, verbatim
con.execute("""
CREATE TEMP TABLE toks AS
  SELECT DISTINCT doc_id, md5(tok) AS h FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)""")
print("toks:", con.sql("SELECT count(*) FROM toks").fetchone()[0], flush=True)

# stage 2: votes + sh CTEs, verbatim (32M-group aggregate then 500k rows)
con.execute("""
CREATE TEMP TABLE sh AS
WITH votes AS (
  SELECT doc_id, pos,
    SUM((((strpos('0123456789abcdef', substr(h, pos // 4 + 1, 1)) - 1)
          // (CASE pos % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) % 2) * 2 - 1) AS s
  FROM toks, unnest(generate_series(0, 63)) AS g(pos)
  GROUP BY doc_id, pos)
SELECT doc_id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY pos) AS simhash
FROM votes GROUP BY doc_id""")
con.execute("DROP TABLE toks")
print("sh:", con.sql("SELECT count(*) FROM sh").fetchone()[0], flush=True)

# stage 3: banded_all + banded CTEs, verbatim
con.execute("""
CREATE TEMP TABLE banded AS
WITH banded_all AS (
  SELECT doc_id, simhash, band, substr(simhash, band * 16 + 1, 16) AS bk
  FROM sh, (VALUES (0), (1), (2), (3)) AS v(band))
SELECT * FROM (
  SELECT *, COUNT(*) OVER (PARTITION BY band, bk) AS cnt FROM banded_all)
WHERE cnt <= 1000""")
print("banded:", con.sql("SELECT count(*) FROM banded").fetchone()[0], flush=True)

# stage 4: cand CTE, verbatim (the DISTINCT spills; strings dropped after)
con.execute("""
CREATE TEMP TABLE cand AS
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.simhash AS h_a, b.simhash AS h_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id""")
con.execute("DROP TABLE banded")
print("cand:", con.sql("SELECT count(*) FROM cand").fetchone()[0], flush=True)

# stage 5: final select, verbatim, streamed off the cand table
con.execute("""
CREATE TEMP TABLE duck_r AS
SELECT doc_a, doc_b, hamming FROM (
  SELECT doc_a, doc_b,
    CAST(list_sum([CASE WHEN substr(h_a, i, 1) <> substr(h_b, i, 1) THEN 1 ELSE 0 END
                   for i in generate_series(1, 64)]) AS BIGINT) AS hamming
  FROM cand)
WHERE hamming <= 3""")
con.execute("DROP TABLE cand")

con.execute(f"""
CREATE TEMP TABLE spark_r AS
  SELECT doc_a, doc_b, hamming FROM '{out_dir}/dedup_simhash64_pairs/*.parquet'""")
n_s = con.sql("SELECT count(*) FROM spark_r").fetchone()[0]
n_d = con.sql("SELECT count(*) FROM duck_r").fetchone()[0]
only_s = con.sql("SELECT count(*) FROM (SELECT * FROM spark_r EXCEPT ALL SELECT * FROM duck_r)").fetchone()[0]
only_d = con.sql("SELECT count(*) FROM (SELECT * FROM duck_r EXCEPT ALL SELECT * FROM spark_r)").fetchone()[0]
ok = n_s == n_d and only_s == 0 and only_d == 0
tag = "OK" if ok else "FAIL"
print(f"[ {tag} ] dedup_simhash64_pairs: spark={n_s} duck={n_d} "
      f"only_spark={only_s} only_duck={only_d} (staged in-engine exact)")
sys.exit(0 if ok else 1)
