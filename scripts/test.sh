#!/usr/bin/env bash
# Run the test suite on an isolated 8-device CPU mesh, with NO contact with the
# axon TPU tunnel (stripping /root/.axon_site from PYTHONPATH avoids per-process
# tunnel claims that can wedge concurrent TPU work).
#
#   scripts/test.sh            full suite (~24 min on the 1-CPU runner)
#   scripts/test.sh --fast     fast tier (-m "not slow", < 5 min) — run this
#                              before every commit; slow marks live in
#                              tests/conftest.py (_SLOW_NODE_SUBSTRINGS)
set -euo pipefail
cd "$(dirname "$0")/.."
ARGS=()
for a in "$@"; do
  if [ "$a" = "--fast" ]; then
    ARGS+=(-m "not slow")
  else
    ARGS+=("$a")
  fi
done
exec env PYTHONPATH="$(pwd)" JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m pytest tests/ -q "${ARGS[@]}"
