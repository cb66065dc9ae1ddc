"""Pallas TPU kernels for hot ops."""

from spoofsv_tpu.ops.pallas_ops import fused_highway_gate  # noqa: F401
