#!/bin/bash
# Relaunch a (marker-resumable) campaign run until its report stage lands.
#
# The axon TPU tunnel occasionally drops with transient
# `UNAVAILABLE: TPU backend setup/compile error`; campaign stages are
# resumable via _campaign/state/<stage>.json markers, so simple relaunch
# is the correct recovery. Usage:
#   scripts/campaign_retry.sh <log> [campaign.py args...]
set -u
LOG="$1"; shift
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SUFFIX=""
CROOT="$REPO/_campaign"
prev=""
for a in "$@"; do
  [ "$prev" = "--split_suffix" ] && SUFFIX="$a"
  [ "$prev" = "--root" ] && CROOT="$a"
  prev="$a"
done
MARKER="$CROOT/state/report${SUFFIX}.json"
for i in $(seq 1 24); do
  if [ -f "$MARKER" ]; then
    echo "[campaign_retry] report marker present, done" >> "$LOG"
    exit 0
  fi
  echo "[campaign_retry] attempt $i" >> "$LOG"
  python "$REPO/scripts/campaign.py" "$@" >> "$LOG" 2>&1
  [ -f "$MARKER" ] && exit 0
  sleep 180
done
echo "[campaign_retry] gave up after 24 attempts" >> "$LOG"
exit 1
