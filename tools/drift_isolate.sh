#!/bin/bash
# Round-11 drift isolation: 5 full bench runs + 3 ivf-stage profiles,
# interleaved, on an otherwise-quiet box. Outputs land in
# artifacts/drift_r11/{bench_N.json,ivf_N.json}.
set -u
cd /root/repo
for i in 1 2 3 4 5; do
  echo "=== bench run $i $(date +%T) ==="
  python bench.py > /root/repo/artifacts/drift_r11/bench_$i.out 2> /root/repo/artifacts/drift_r11/bench_$i.err
  grep -h '"metric"' /root/repo/artifacts/drift_r11/bench_$i.out | tail -1 > /root/repo/artifacts/drift_r11/bench_$i.json
  if [ $i -le 3 ]; then
    echo "=== ivf profile $i $(date +%T) ==="
    python tools/profile_ivf.py > /root/repo/artifacts/drift_r11/ivf_$i.out 2> /root/repo/artifacts/drift_r11/ivf_$i.err
    grep -h 'ivf_x10_build_profile' /root/repo/artifacts/drift_r11/ivf_$i.out | tail -1 > /root/repo/artifacts/drift_r11/ivf_$i.json
  fi
done
echo DONE
