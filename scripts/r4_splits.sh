#!/bin/bash
# Round-4 speaker-split sweep (the reference's S1/S2/S3 schemes scaled to
# the 60-speaker campaign corpus: 50/40/24 training speakers). Waits for
# the post-campaign measurement batch to release the chip (the axon tunnel
# serializes clients), then re-runs the split-dependent stages against the
# base campaign's trained TTS/CM models — exactly the r2/r3 protocol
# (docs/CAMPAIGN.md "Speaker-split sweep"). Marker-resumable via the
# campaign's own per-stage markers.
set -u
cd "$(dirname "$0")/.."

while [ ! -f _r4post/ssrn_pair.done ]; do sleep 60; done
echo "[r4splits] chip free, starting $(date +%H:%M:%S)"

bash scripts/campaign_retry.sh _campaign_r4/splits_s50.log \
  --root /root/repo/_campaign_r4 --split_suffix _s50 --train_spk 50
bash scripts/campaign_retry.sh _campaign_r4/splits_s24.log \
  --root /root/repo/_campaign_r4 --split_suffix _s24 --train_spk 24
echo "[r4splits] ALL DONE"
