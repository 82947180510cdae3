#!/bin/bash
# Round-12 full-registry sf10 sweep: run every query fresh at /tmp/sf10 in
# batches (fresh JVM per batch bounds memory), then DuckDB parity per batch.
# pagerank's oracle is excluded (DuckDB recursive-SQL spill exhaustion,
# r10/r11 finding reproduced) — its 100x evidence is the in-Spark
# differential (PageRankDiffProbeR12, exact MATCH at sf3+sf10 this round).
set -u
cd /root/repo
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
names=$(python3 -c "
import json
o=json.load(open('/tmp/verify_r12b/oracle_sql.json'))
ns=[n for n in sorted(o.keys()) if n != 'pagerank']+['bpe_merges','bpe_encode_stats']
print(' '.join(ns))")
arr=($names)
total=${#arr[@]}
batch=20
i=${1:-0}   # optional resume offset (in queries)
n=$((i / batch))
while [ $i -lt $total ]; do
  chunk=$(IFS=,; echo "${arr[*]:$i:$batch}")
  n=$((n+1))
  echo "=== batch $n: $chunk"
  java -cp "$CP" $OPENS graft.Verify /tmp/sf10 /tmp/verify_sf10_r12 "$chunk" \
    2>/dev/null | tail -1
  # per-QUERY parity with a hard timeout: one pathological oracle (the
  # Levenshtein family needed >1h for a 20-query batch) must not stall
  # the whole sweep — a timeout records the row for manual/r11 carry-over
  for q in ${chunk//,/ }; do
    timeout 420 python3 tools/parity.py /tmp/sf10 /tmp/verify_sf10_r12 "$q" 2>/dev/null \
      | grep -E "OK|FAIL|ROWS" | grep -vE "MISS"
    [ ${PIPESTATUS[0]} -eq 124 ] && echo "[TIMEOUT] $q: oracle exceeded 420s at sf10"
  done
  rm -rf /tmp/verify_sf10_r12/[a-z]*/ 2>/dev/null
  i=$((i+batch))
done
echo "SWEEP DONE"
