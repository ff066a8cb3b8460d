#!/bin/bash
# Interleaved A/B driver (r15): alternate HEAD vs the pre-absorption
# parent checkout, N rounds each, one fresh JVM per invocation.
#   bash tools/ab_loop.sh <rounds> <out_log> [dirA] [dirB]
set -u
ROUNDS=${1:-7}
OUT=${2:-/tmp/ab_r15.log}
A=${3:-/root/repo}
B=${4:-/root/ab14}
: > "$OUT"
for i in $(seq 1 "$ROUNDS"); do
  for d in "$A" "$B"; do
    echo "== round $i dir $d $(date +%T) ==" >> "$OUT"
    python "$A/tools/ab_strategy.py" "$d" "$(basename "$d")#$i" 2>/dev/null \
      | grep ABJSON >> "$OUT"
  done
done
echo DONE >> "$OUT"
