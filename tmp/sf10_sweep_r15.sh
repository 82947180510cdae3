#!/bin/bash
# Round-15 ALL-FRESH sf10 sweep: every registry row runs fresh this round,
# including the r15-changed rows (record_linkage_dl threshold-bounded DP +
# length gate, hard_negatives_dispatch NEW). Inherits the r13/r14 policies:
#  * known-slow oracles (curation_funnel_fuzzy, feature_lags,
#    hard_negatives, record_linkage_*, linkage_entities,
#    dedup_simhash64_pairs, configured_pipeline_view) get 5400s up front;
#  * configured_pipeline_view parity gets GRAFT_DUCK_MEM=96GB up front;
#  * comparator stderr stays VISIBLE; the assembler flags any query with
#    no line in the log;
#  * Spark side gets 16 threads.
# r15 specifics:
#  * CP is a FROZEN class snapshot (/tmp/classes_r15) so repo recompiles
#    during the sweep cannot change mid-sweep behavior;
#  * hard_negatives_dispatch: at 200k vectors (> the 100k exact bound) the
#    production dispatcher provably flips to the LSH path, so its sf10
#    oracle is the hard_negatives_lsh SQL — patched into each batch's
#    oracle_sql.json right after Verify rewrites it. A HASH-OK here is the
#    end-to-end proof that the dispatch fires AND the flipped plan is
#    exactly the verified LSH kernel.
# pagerank's oracle stays excluded (DuckDB recursive-SQL spill exhaustion,
# r10-r14 finding) — its 100x evidence is the in-Spark differential probe
# (tmp/PageRankDiffProbeR12, re-run fresh for r15).
# dedup_simhash64_pairs: if its parity line times out/OOMs, re-run the
# staged in-engine exact compare (tmp/simhash64_sf10_probe.py) targeted.
set -u
cd /root/repo
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CP="/tmp/classes_r15:/opt/spark/jars/*"
ORACLE_JSON=${ORACLE_JSON:-/tmp/verify_r15_dev/oracle_sql.json}
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
    record_linkage_jw|record_linkage_dl|linkage_entities) echo 5400 ;;
    dedup_simhash64_pairs|configured_pipeline_view) echo 5400 ;;
    hard_negatives_dispatch) echo 5400 ;;
    *) echo 420 ;;
  esac
}
duck_mem() {
  case "$1" in
    configured_pipeline_view) echo 96GB ;;
    *) echo 24GB ;;
  esac
}
while [ $i -lt $total ]; do
  chunk=$(IFS=,; echo "${arr[*]:$i:$batch}")
  n=$((n+1))
  echo "=== batch $n: $chunk"
  SPARK_GRAFT_CPUS=16 java -Xmx48g -cp "$CP" $OPENS graft.Verify /tmp/sf10 /tmp/verify_sf10_r15 "$chunk" \
    2>/dev/null | tail -1
  # the dispatcher row's sf10 oracle IS the LSH oracle (200k vectors >
  # 100k exact bound): patch the just-rewritten oracle_sql.json
  python3 - <<'PYEOF'
import json
p = "/tmp/verify_sf10_r15/oracle_sql.json"
o = json.load(open(p))
if "hard_negatives_dispatch" in o and "hard_negatives_lsh" in o:
    o["hard_negatives_dispatch"] = o["hard_negatives_lsh"]
    json.dump(o, open(p, "w"))
PYEOF
  for q in ${chunk//,/ }; do
    t=$(slow_timeout "$q")
    GRAFT_DUCK_MEM=$(duck_mem "$q") timeout "$t" python3 tools/parity.py /tmp/sf10 /tmp/verify_sf10_r15 "$q" \
      | grep -E "OK|FAIL|ROWS" | grep -vE "MISS"
    [ ${PIPESTATUS[0]} -eq 124 ] && echo "[TIMEOUT] $q: oracle exceeded ${t}s at sf10"
  done
  rm -rf /tmp/verify_sf10_r15/[a-z]*/ 2>/dev/null
  i=$((i+batch))
done
echo "SWEEP DONE"
