#!/bin/bash
# Round-13 ALL-FRESH sf10 sweep (VERDICT r12 item 2): every registry row
# runs fresh this round — no plan-hash carries. Differences vs r12's sweep:
#  * the three known-slow oracles (curation_funnel_fuzzy, feature_lags,
#    hard_negatives — r12 measured >420s each) get a 5400s timeout up
#    front instead of timing out and needing a targeted re-run;
#  * comparator stderr stays VISIBLE (r12 lost batch-10 rows to a silent
#    duckdb OOM kill) and every query's parity line is checked for
#    presence by the assembler (make_sf10_parity_r13.py flags gaps);
#  * Spark side gets 16 threads (32-core box, nothing else heavy).
# pagerank's oracle stays excluded (DuckDB recursive-SQL spill exhaustion,
# r10-r12 finding) — its 100x evidence is the in-Spark differential probe,
# re-run fresh this round (PageRankDiffProbeR12 at sf3+sf10).
set -u
cd /root/repo
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ORACLE_JSON=${ORACLE_JSON:-/tmp/verify_r13/oracle_sql.json}
names=$(python3 -c "
import json
o=json.load(open('$ORACLE_JSON'))
ns=[n for n in sorted(o.keys()) if n != 'pagerank']+['bpe_merges','bpe_encode_stats']
print(' '.join(ns))")
arr=($names)
total=${#arr[@]}
batch=20
i=${1:-0}   # optional resume offset (in queries)
n=$((i / batch))
slow_timeout() {
  case "$1" in
    curation_funnel_fuzzy|feature_lags|hard_negatives) echo 5400 ;;
    *) echo 420 ;;
  esac
}
while [ $i -lt $total ]; do
  chunk=$(IFS=,; echo "${arr[*]:$i:$batch}")
  n=$((n+1))
  echo "=== batch $n: $chunk"
  SPARK_GRAFT_CPUS=16 java -Xmx48g -cp "$CP" $OPENS graft.Verify /tmp/sf10 /tmp/verify_sf10_r13 "$chunk" \
    2>/dev/null | tail -1
  for q in ${chunk//,/ }; do
    t=$(slow_timeout "$q")
    timeout "$t" python3 tools/parity.py /tmp/sf10 /tmp/verify_sf10_r13 "$q" \
      | grep -E "OK|FAIL|ROWS" | grep -vE "MISS"
    [ ${PIPESTATUS[0]} -eq 124 ] && echo "[TIMEOUT] $q: oracle exceeded ${t}s at sf10"
  done
  rm -rf /tmp/verify_sf10_r13/[a-z]*/ 2>/dev/null
  i=$((i+batch))
done
echo "SWEEP DONE"
