#!/bin/bash
# Per-query oracle compare with a wall-clock budget per DuckDB oracle —
# for scale-rehearsal sweeps where one heavy oracle (e.g. the stride-1
# span truth or the 3-way triangle join) must not hang the whole sweep.
# Usage: tools/compare_timeout.sh <sfdir> <outdir> <budget_sec> <q1> [q2 ...]
set -u
sfdir=$1; outdir=$2; budget=$3; shift 3
pass=0; fail=0; tout=0
for q in "$@"; do
  out=$(timeout "$budget" python3 "$(dirname "$0")/compare.py" "$sfdir" "$outdir" "$q" 2>&1)
  rc=$?
  if [ $rc -eq 124 ]; then
    echo "$q ORACLE_TIMEOUT >${budget}s"; tout=$((tout+1))
  else
    line=$(echo "$out" | grep -E "PASS|FAIL|ERROR|MISSING" | head -1)
    echo "$line"
    echo "$line" | grep -q PASS && pass=$((pass+1)) || fail=$((fail+1))
  fi
done
echo "== $pass pass, $fail fail, $tout oracle-timeout =="
