#!/usr/bin/env bash
# Run the test suite on an isolated 8-device CPU mesh, with NO contact with the
# axon TPU tunnel (stripping /root/.axon_site from PYTHONPATH avoids per-process
# tunnel claims that can wedge concurrent TPU work).
set -euo pipefail
cd "$(dirname "$0")/.."
exec env PYTHONPATH="$(pwd)" JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m pytest tests/ -q "$@"
