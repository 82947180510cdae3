#!/bin/bash
# Round-14 ALL-FRESH sf10 sweep: every registry row runs fresh this round,
# including the r14-changed rows (record_linkage_jw/dl two-pass blocking,
# linkage_entities, linkage_block_report NEW, bigram_pmi cache-share,
# regression_mi_logit K+1 passes). Inherits the r13 policies:
#  * known-slow oracles (curation_funnel_fuzzy, feature_lags,
#    hard_negatives) get a 5400s timeout up front;
#  * record_linkage oracles get 5400s too this round (two-pass union in
#    DuckDB at sf10 is new work);
#  * configured_pipeline_view parity gets GRAFT_DUCK_MEM=96GB up front
#    (r13: visible comparator OOM at the default 24GB);
#  * comparator stderr stays VISIBLE; the assembler flags any query with
#    no line in the log;
#  * Spark side gets 16 threads.
# pagerank's oracle stays excluded (DuckDB recursive-SQL spill exhaustion,
# r10-r13 finding) — its 100x evidence is the in-Spark differential probe
# (tmp/PageRankDiffProbeR12, re-run fresh for r14: /tmp/pagerank_diff_r14.log).
# dedup_simhash64_pairs: if its parity line times out/OOMs, re-run the
# staged in-engine exact compare (tmp/simhash64_sf10_probe.py) targeted.
set -u
cd /root/repo
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ORACLE_JSON=${ORACLE_JSON:-/tmp/verify_r14/oracle_sql.json}
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
  SPARK_GRAFT_CPUS=16 java -Xmx48g -cp "$CP" $OPENS graft.Verify /tmp/sf10 /tmp/verify_sf10_r14 "$chunk" \
    2>/dev/null | tail -1
  for q in ${chunk//,/ }; do
    t=$(slow_timeout "$q")
    GRAFT_DUCK_MEM=$(duck_mem "$q") timeout "$t" python3 tools/parity.py /tmp/sf10 /tmp/verify_sf10_r14 "$q" \
      | grep -E "OK|FAIL|ROWS" | grep -vE "MISS"
    [ ${PIPESTATUS[0]} -eq 124 ] && echo "[TIMEOUT] $q: oracle exceeded ${t}s at sf10"
  done
  rm -rf /tmp/verify_sf10_r14/[a-z]*/ 2>/dev/null
  i=$((i+batch))
done
echo "SWEEP DONE"
