#!/bin/bash
# Ground-truth bench battery: N fresh bench.py invocations, steal ticks
# recorded around each (VERDICT r12 item 1). Usage:
#   bench_battery.sh <out.jsonl> <cpus> <n_runs>
set -u
OUT="$1"; CPUS="$2"; N="$3"
cd /root/repo
for i in $(seq 1 "$N"); do
  S0=$(awk '/^cpu /{print $9}' /proc/stat)
  T0=$(date +%s.%N)
  LINE=$(SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
         python bench.py 2>/dev/null | tail -1)
  T1=$(date +%s.%N)
  S1=$(awk '/^cpu /{print $9}' /proc/stat)
  echo "{\"run\": $i, \"cpus\": $CPUS, \"steal_ticks\": $((S1-S0)), \"wall\": $(echo "$T1 $T0" | awk '{printf "%.1f", $1-$2}'), \"bench\": $LINE}" >> "$OUT"
done
