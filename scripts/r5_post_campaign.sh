#!/bin/bash
# Round-5 post-campaign batch: everything that needs the live TPU and the
# trained campaign, run sequentially (the tunnel serializes clients).
# Marker-resumable like r4_post_campaign.sh.
set -u
cd "$(dirname "$0")/.."
mkdir -p _r5
export SPOOFSV_CAMPAIGN_ROOT="$PWD/_campaign_r5"

step() {
  local name="$1"; shift
  if [ -f "_r5/$name.done" ]; then
    echo "[r5post] $name: already done"
    return 0
  fi
  echo "[r5post] $name: start $(date +%H:%M:%S)"
  if "$@" > "_r5/$name.log" 2>&1; then
    touch "_r5/$name.done"
    echo "[r5post] $name: OK $(date +%H:%M:%S)"
  else
    echo "[r5post] $name: FAILED (rc=$?) — see _r5/$name.log"
    tail -5 "_r5/$name.log"
    return 1
  fi
}

# task-metric GL A/B on the trained checkpoints (VERDICT #4)
step gl_mcd_ab   timeout 3000 python scripts/gl_mcd_ab.py --root "$PWD/_campaign_r5"
# tri-system re-score of the spsi candidates (campaign-level quality gate)
step gl_spsi     timeout 5000 python scripts/gl_spsi_check.py
# refreshed pipeline shares at the new production vocoder (VERDICT #9)
step shares      timeout 3000 python scripts/bench_pipeline_shares.py
# module-level int8 SSRN arm (VERDICT #9)
step ssrn_int8   timeout 3000 python scripts/bench_ssrn_int8.py
# on-chip GL + trained-decode parity artifact refresh
step parity      timeout 3000 python scripts/parity_tpu.py
# VAD A/B embedding leg with the trained GE2E checkpoint (CPU)
step vad_emb     timeout 1200 env PYTHONPATH="$PWD" JAX_PLATFORMS=cpu \
  python scripts/vad_ab.py --root "$PWD/_campaign_r5" --utts 40 \
  --ge2e_ck "$PWD/_campaign_r5/ge2e_ck"
# final headline bench
step bench       timeout 3000 python bench.py
echo "[r5post] ALL DONE"
