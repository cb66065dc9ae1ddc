#!/bin/bash
# Waits for the r4 campaign's report marker, then runs the remaining
# chip-bound round-4 measurements sequentially (the tunnel serializes
# clients — nothing here may run while the campaign owns the chip).
# Marker-resumable like r4_tpu_batch.sh.
set -u
cd "$(dirname "$0")/.."
mkdir -p _r4post

while [ ! -f _campaign_r4/state/report.json ]; do sleep 60; done
echo "[r4post] campaign report present, starting $(date +%H:%M:%S)"

step() {
  local name="$1"; shift
  if [ -f "_r4post/$name.done" ]; then
    echo "[r4post] $name: already done"
    return 0
  fi
  echo "[r4post] $name: start $(date +%H:%M:%S)"
  if "$@" > "_r4post/$name.log" 2>&1; then
    touch "_r4post/$name.done"
    echo "[r4post] $name: OK"
  else
    echo "[r4post] $name: FAILED (rc=$?) — see _r4post/$name.log"
    tail -5 "_r4post/$name.log"
    return 1
  fi
}

step speculative timeout 3000 python scripts/bench_speculative.py
step bench       timeout 3000 python bench.py
step ssrn_pair   timeout 3000 python scripts/bench_ssrn_conv.py
echo "[r4post] ALL DONE"
