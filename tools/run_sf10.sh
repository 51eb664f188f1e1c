#!/bin/bash
# Full-registry sf10-docs bench run (VERDICT r14 task #4), crash-resilient:
# runs graft.Bench in small groups so an OOM/timeout loses one group, not
# the whole run. Known super-linear DECLARED exact-baseline queries run
# last as singletons with a hard timeout, so the linear registry's numbers
# always land. Merge with tools/merge_bench.py.
set -u
cd /root/repo
SF=bench/sfgen/sf10
OUT=bench/sf10_parts
mkdir -p "$OUT" .tmp/scratch
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ALL=$(python3 - <<'EOF'
import json
d = json.load(open('bench/bench_latest.json'))
print(' '.join(sorted(d['queries'].keys())))
EOF
)
# Declared exact pair-enumeration ground-truth baselines (ARCHITECTURE
# "One more decade" contract): candidate space grows ~100x/decade on this
# vocabulary; at sf10 they measure the contract violation, not the engine.
# They still run, but isolated and time-capped.
RISKY="q28_ngram_jaccard q60_simhash_pairs q135_containment q160_simhash_hamming q162_lsh_recall_audit q165_dup_spans q53_embed_neardup q92_embed_components q169_modality_audit"
SAFE=""
for q in $ALL; do
  case " $RISKY " in
    *" $q "*) ;;
    *) SAFE="$SAFE $q" ;;
  esac
done
set -- $SAFE
i=0
group=0
while [ $# -gt 0 ]; do
  batch=""
  n=0
  while [ $# -gt 0 ] && [ $n -lt 12 ]; do
    batch="$batch,$1"; shift; n=$((n+1))
  done
  batch=${batch#,}
  group=$((group+1))
  f="$OUT/group_$(printf %02d $group).json"
  if [ -s "$f" ]; then echo "[sf10] group $group already done, skip"; continue; fi
  echo "[sf10] group $group: $batch"
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_SCRATCH=/root/repo/.tmp/scratch \
  SPARK_GRAFT_ONLY="$batch" SPARK_GRAFT_BENCH_OUT="$f" \
  timeout 2400 java -Xmx96g -cp "$CP" graft.Bench \
    > "$OUT/group_$(printf %02d $group).log" 2>&1
  rc=$?
  [ $rc -ne 0 ] && echo "[sf10] group $group FAILED rc=$rc (see log)"
done
for q in $RISKY; do
  f="$OUT/risky_$q.json"
  if [ -s "$f" ]; then echo "[sf10] $q already done, skip"; continue; fi
  echo "[sf10] risky singleton: $q"
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_SCRATCH=/root/repo/.tmp/scratch \
  SPARK_GRAFT_ONLY="$q" SPARK_GRAFT_BENCH_OUT="$f" \
  timeout 900 java -Xmx96g -cp "$CP" graft.Bench \
    > "$OUT/risky_$q.log" 2>&1
  rc=$?
  [ $rc -ne 0 ] && echo "[sf10] $q FAILED/TIMEOUT rc=$rc"
done
echo "[sf10] all groups done"
