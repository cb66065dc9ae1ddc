"""spoofsv_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
MingruiYuan/SpoofSV: multi-speaker adversarial DCTTS-style TTS, spoof-set generation,
and speaker-verification attack evaluation (GE2E d-vectors, i-vectors+PLDA,
anti-spoofing countermeasures).

This is a ground-up re-design for TPU hardware, not a port:
  * compute path: JAX + XLA (jit/pjit/shard_map over a device Mesh), Pallas kernels
    for hot ops; static shapes, `lax.scan` recurrence, bf16 on the MXU.
  * host runtime: native C++ library (``spoofsv_tpu/native``) for the classical
    speaker-ID stack (MFCC, VAD, UBM, i-vector, PLDA, EER) that the reference
    delegated to external Kaldi binaries.

Reference parity citations in docstrings point into MingruiYuan/SpoofSV as
``<path>:<line>`` (mounted read-only at /root/reference during development).
"""

__version__ = "0.1.0"

from spoofsv_tpu.config import Config, load_config  # noqa: F401
