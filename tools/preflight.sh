#!/bin/bash
# End-of-round preflight (VERDICT r13 ask #1): the r13 final commits
# shipped a stale suite-size pin and a broken README gate sentence
# because nobody ran the full pytest at HEAD. Run this BEFORE writing
# round artifacts / the final commit; it fails loudly on any red gate.
#
#     tools/preflight.sh            # pytest + full check.py (~45 min)
#     tools/preflight.sh --fast     # pytest only (~15 min)
set -ue
cd /root/repo
echo "=== pytest tests/ at HEAD $(date +%T)"
python -m pytest tests/ -x -q
if [ "${1:-}" != "--fast" ]; then
  echo "=== full correctness gate $(date +%T)"
  LOG=$(mktemp /tmp/preflight_check.XXXXXX)
  python tools/check.py > "$LOG" 2>&1 || true
  tr '\r' '\n' < "$LOG" | grep -aE "^(FAIL|[0-9]+ ok,)" || true
  tr '\r' '\n' < "$LOG" | grep -aqE "^[0-9]+ ok, 0 fail," \
    || { echo "PREFLIGHT FAIL: check.py reported failures ($LOG)"; exit 1; }
fi
echo "=== preflight green $(date +%T)"
