"""Evaluation harness: spoof-set generation, GE2E verification, anti-spoofing
CM, i-vectors (native C++), curves, VAD, d-vectors."""

from spoofsv_tpu.spoofkit import antispoof, curve, dvector, ge2e_harness, spoofgen, vad  # noqa: F401
