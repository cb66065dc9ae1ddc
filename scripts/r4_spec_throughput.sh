#!/usr/bin/env bash
# Throughput-point speculative serving A/B on trained checkpoints.
#
# Three arms at identical load (128-way concurrency, 512 requests,
# max_batch 64, campaign texts + real speaker embeddings):
#   A conservative : single 160-frame rollout, fpc 3.0 (r3 baseline shape)
#   B bucketed     : [96,160] ladder, fpc 3.0 (non-speculative — isolates
#                    what the ladder alone buys at this text distribution)
#   C speculative  : [48,96,160] ladder, fpc 2.5, min 24 + attention-
#                    completion escalation (the device-time saving measured
#                    solo in docs/SPECULATIVE.json should convert to req/s
#                    here, where the batch is full and latency is not
#                    dispatch-floor-bound)
# Marker-resumable: each arm writes _r4post/spec_tp_<arm>.json and a .done.
set -u
cd "$(dirname "$0")/.."
mkdir -p _r4post
CFG=_campaign_r4/config.json
LOAD="--config $CFG --concurrency 128 --requests 512 --max_batch 64"

run_arm() {
  local name=$1; shift
  if [[ -f _r4post/spec_tp_$name.done ]]; then
    echo "[r4_spec_throughput] $name already done"; return
  fi
  echo "[r4_spec_throughput] arm $name: $*"
  if timeout 3000 python scripts/bench_serve.py $LOAD "$@" \
      > _r4post/spec_tp_$name.json 2> _r4post/spec_tp_$name.log; then
    touch _r4post/spec_tp_$name.done
    tail -1 _r4post/spec_tp_$name.json
  else
    echo "[r4_spec_throughput] arm $name FAILED (see _r4post/spec_tp_$name.log)"
    return 1
  fi
}

run_arm conservative --frames_buckets 160 --frames_per_char 3.0 || exit 1
run_arm bucketed --frames_buckets 96,160 --frames_per_char 3.0 || exit 1
run_arm speculative --frames_buckets 48,96,160 --speculative \
  --frames_per_char 2.5 --min_frames 24 || exit 1
echo "[r4_spec_throughput] all arms done"
