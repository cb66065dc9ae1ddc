#!/bin/bash
# Round-4 speculative-bench prerequisite: the container reset wiped the
# campaign checkpoints, so retrain ONLY the TTS stages (corpus, prepare,
# train_t2m, train_ssrn, synthesize — skipping the adversarial run and the
# whole verification/CM chain, whose round-4 numbers are already committed),
# then run the speculative serving A/B and a fresh headline bench.
# Marker-resumable like r4_tpu_batch.sh; campaign stages resume via their
# own _campaign_r4/state markers.
set -u
cd "$(dirname "$0")/.."
mkdir -p _r4post

SKIPS=(train_adv spoofgen ge2e ivector ivector_ref cm curve
       spoofgen_adv ge2e_adv ivector_adv cm_adv curve_adv)
SKIP_ARGS=()
for s in "${SKIPS[@]}"; do SKIP_ARGS+=(--skip "$s"); done

step() {
  local name="$1"; shift
  if [ -f "_r4post/$name.done" ]; then
    echo "[r4spec] $name: already done"
    return 0
  fi
  echo "[r4spec] $name: start $(date +%H:%M:%S)"
  if "$@" > "_r4post/$name.log" 2>&1; then
    touch "_r4post/$name.done"
    echo "[r4spec] $name: OK $(date +%H:%M:%S)"
  else
    echo "[r4spec] $name: FAILED (rc=$?) — see _r4post/$name.log"
    tail -5 "_r4post/$name.log"
    return 1
  fi
}

step tts_train bash scripts/campaign_retry.sh _r4post/tts_train_retry.log \
  --root "$PWD/_campaign_r4" "${SKIP_ARGS[@]}" || exit 1
step speculative timeout 3000 python scripts/bench_speculative.py || exit 1
step bench       timeout 3000 python bench.py || exit 1
echo "[r4spec] ALL DONE"
