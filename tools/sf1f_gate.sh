#!/bin/bash
# Full-surface fresh-scale gate: run every registered query at a scale
# fixture in round-robin chunks (bounds per-JVM memory/tmp growth),
# then oracle-check each chunk with tools/check.py.
# Usage: tools/sf1f_gate.sh [nChunks] [outRoot] [sfDir]
# Knobs default to the sf1f production set; callers override via env
# (sf2f: GRAFT_KNNG_ROUNDS=6 GRAFT_IVFPQ_CELLS=200 GRAFT_BLOOM_BITS=16777216).
set -u
N=${1:-7}
OUT=${2:-/tmp/sf1f_gate}
SF=${3:-target/scale/sf1f}
export GRAFT_KNNG_ROUNDS=${GRAFT_KNNG_ROUNDS:-5}
export GRAFT_IVFPQ_CELLS=${GRAFT_IVFPQ_CELLS:-140}
export GRAFT_IVFPQ_PROBE=${GRAFT_IVFPQ_PROBE:-12}
export GRAFT_BLOOM_BITS=${GRAFT_BLOOM_BITS:-8388608}
export GRAFT_CMS_WIDTH=${GRAFT_CMS_WIDTH:-16384}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
mkdir -p "$OUT"
grep -oP '^\s+"[a-z0-9_]+" ->' src/main/scala/graft/SparkEntry.scala |
  grep -oP '[a-z0-9_]+' | sort -u > "$OUT/names.txt"
TOTAL=$(wc -l < "$OUT/names.txt")
if [ "$TOTAL" -eq 0 ]; then
  echo "GATE RED: no queries extracted from SparkEntry.scala (regex drift?)"
  exit 1
fi
echo "gating $TOTAL queries in $N chunks"
: > "$OUT/summary.txt"
BAD=0
# Phase 1: Verify chunks back-to-back (the sbt lock is the scarce
# resource); Phase 2: DuckDB oracle checks for ALL chunks in parallel
# (no lock needed; the heavy graph-CTE oracles dominate wall clock).
for i in $(seq 0 $((N - 1))); do
  CHUNK=$(awk -v n="$N" -v i="$i" 'NR % n == i' "$OUT/names.txt" |
    paste -sd,)
  [ -z "$CHUNK" ] && continue
  echo "== verify chunk $i =="
  if ! sbt -batch "runMain graft.Verify $SF $OUT/chunk$i $CHUNK" \
      > "$OUT/chunk$i.log" 2>&1; then
    echo "chunk $i: Verify FAILED" | tee -a "$OUT/summary.txt"
    BAD=$((BAD + 1))
  fi
done
echo "== oracle checks (parallel) =="
for i in $(seq 0 $((N - 1))); do
  [ -d "$OUT/chunk$i" ] || continue
  ( if ! python3 tools/check.py "$SF" "$OUT/chunk$i" \
        > "$OUT/chunk$i.check" 2>&1; then
      echo "chunk $i: check.py CRASHED (nonzero exit)" >> "$OUT/chunk$i.check"
    fi ) &
done
wait
for i in $(seq 0 $((N - 1))); do
  [ -f "$OUT/chunk$i.check" ] || continue
  tail -1 "$OUT/chunk$i.check" | tee -a "$OUT/summary.txt"
  if grep -q 'CRASHED' "$OUT/chunk$i.check"; then
    BAD=$((BAD + 1))
  fi
  NFAIL=$(grep -c '^FAIL' "$OUT/chunk$i.check")
  if [ "$NFAIL" -gt 0 ]; then
    grep '^FAIL' "$OUT/chunk$i.check" | tee -a "$OUT/summary.txt"
    BAD=$((BAD + NFAIL))
  fi
  # Spark-side throws land in failed.json, not as FAIL lines
  if [ -f "$OUT/chunk$i/failed.json" ] &&
      [ "$(cat "$OUT/chunk$i/failed.json")" != "{}" ]; then
    echo "chunk $i: Spark-side failures: $(cat "$OUT/chunk$i/failed.json")" |
      tee -a "$OUT/summary.txt"
    BAD=$((BAD + 1))
  fi
done
echo "== totals =="
cat "$OUT/summary.txt"
if [ "$BAD" -gt 0 ]; then
  echo "GATE RED: $BAD failures"
  exit 1
fi
echo "GATE GREEN: every chunk passed"
