#!/bin/bash
# Round-4 TPU batch: every chip-bound task in one sequential pass (the axon
# tunnel serializes clients — never run two TPU processes concurrently).
#   1. on-chip Pallas parity artifact (docs/PARITY_TPU.json)
#   2. headline bench with the new dual GL24/GL64 reporting
#   3. campaign quality stage re-run -> refreshed mcd_db (the r3 JSON
#      predates the -60 dB floor + tail-trim MCD fixes)
#   4. i-vector delta re-score at 1024/400 (docs/IVECTOR_DELTAS.json)
#   5. serving overload bench on the chip
#   6. campaign report refresh
# Each step logs to _r4batch/<step>.log and drops a .done marker so a
# tunnel wedge mid-batch can resume without redoing finished steps.
set -u
cd "$(dirname "$0")/.."
mkdir -p _r4batch

step() {
  local name="$1"; shift
  if [ -f "_r4batch/$name.done" ]; then
    echo "[r4batch] $name: already done"
    return 0
  fi
  echo "[r4batch] $name: start $(date +%H:%M:%S)"
  if "$@" > "_r4batch/$name.log" 2>&1; then
    touch "_r4batch/$name.done"
    echo "[r4batch] $name: OK"
  else
    echo "[r4batch] $name: FAILED (rc=$?) — see _r4batch/$name.log"
    tail -5 "_r4batch/$name.log"
    return 1
  fi
}

step parity    timeout 3000 python scripts/parity_tpu.py 16
step bench     timeout 3000 python bench.py
step mcd       timeout 3000 python scripts/campaign.py --only synthesize --force synthesize
step ivec_ref  timeout 5400 python scripts/ivector_delta_rescore.py
step serve_ov  timeout 3000 python scripts/bench_serve.py --overload --max_batch 16
step report    timeout 600  python scripts/campaign.py --only report --force report
echo "[r4batch] ALL DONE"
