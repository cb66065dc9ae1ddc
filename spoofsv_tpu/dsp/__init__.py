"""DSP layer: librosa-parity signal processing, implemented from scratch.

Two tiers:
  * :mod:`spoofsv_tpu.dsp.host` — numpy implementations used by the host-side
    data pipeline (feature extraction, trim, resample). These mirror the
    semantics of the librosa 0.7 calls the reference makes
    (``data/dataset.py:94-118``, ``synthesize.py:134-147``).
  * :mod:`spoofsv_tpu.dsp.jaxdsp` — JAX/XLA implementations of the same
    transforms, jittable and batched, used on-TPU (Griffin-Lim vocoding,
    de-emphasis, batched feature extraction).

Both tiers share the precomputed constants in :mod:`spoofsv_tpu.dsp.primitives`
(hann window, Slaney mel filterbank) and are parity-tested against each other.
"""

from spoofsv_tpu.dsp.primitives import hann_window, mel_filterbank  # noqa: F401
from spoofsv_tpu.dsp import host  # noqa: F401
from spoofsv_tpu.dsp import jaxdsp  # noqa: F401
