"""ctypes bindings for the native FLAC codec in libspoofkit.

The reference writes/reads 16 kHz FLAC for the anti-spoofing corpus via
libsndfile (``generate_test_utterances.py:246-255``,
``anti_spoofing/spoof_conv1d.py:46``); this image has no FLAC tooling, so
``spoofsv_tpu/native/src/flac.cc`` implements the codec and these wrappers
expose it as numpy in/out.
"""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from spoofsv_tpu.spoofkit.ivector import _load_lib

_CONFIGURED = False


def _lib():
    global _CONFIGURED
    lib = _load_lib()
    if not _CONFIGURED:
        lib.sk_flac_probe.restype = ctypes.c_int
        lib.sk_flac_probe.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_int64),
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_int)]
        lib.sk_flac_decode_alloc.restype = ctypes.c_void_p
        lib.sk_flac_decode_alloc.argtypes = [ctypes.c_char_p,
                                             ctypes.POINTER(ctypes.c_int64),
                                             ctypes.POINTER(ctypes.c_int),
                                             ctypes.POINTER(ctypes.c_int),
                                             ctypes.POINTER(ctypes.c_int)]
        lib.sk_flac_pcm_copy.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_int32)]
        lib.sk_flac_pcm_free.argtypes = [ctypes.c_void_p]
        lib.sk_flac_encode.restype = ctypes.c_int
        lib.sk_flac_encode.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int32),
                                       ctypes.c_int64, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int]
        _CONFIGURED = True
    return lib


def decode_flac(path: str) -> Tuple[np.ndarray, int]:
    """Decode → (float32 (n,) mono or (n, ch), sample_rate).

    Allocation happens C-side so legal unknown-length streams
    (STREAMINFO total_samples == 0) decode fully.
    """
    lib = _lib()
    n = ctypes.c_int64(0)
    sr = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    bits = ctypes.c_int(0)
    h = lib.sk_flac_decode_alloc(path.encode(), ctypes.byref(n),
                                 ctypes.byref(sr), ctypes.byref(ch),
                                 ctypes.byref(bits))
    if not h:
        raise ValueError(f"not a decodable FLAC file: {path}")
    try:
        pcm = np.zeros((n.value * ch.value,), np.int32)
        if len(pcm):
            lib.sk_flac_pcm_copy(
                h, pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    finally:
        lib.sk_flac_pcm_free(h)
    scale = float(1 << (bits.value - 1))
    y = pcm.astype(np.float32) / scale
    if ch.value > 1:
        y = y.reshape(-1, ch.value)
    return y, sr.value


def encode_flac(path: str, pcm: np.ndarray, sample_rate: int,
                bits: int = 16) -> None:
    """Encode int PCM (n,) or (n, ch) → FLAC file (fixed-predictor + rice)."""
    lib = _lib()
    pcm = np.asarray(pcm, np.int32)
    if pcm.ndim == 1:
        channels, n = 1, len(pcm)
        inter = np.ascontiguousarray(pcm)
    else:
        n, channels = pcm.shape
        inter = np.ascontiguousarray(pcm.reshape(-1))
    rc = lib.sk_flac_encode(path.encode(),
                            inter.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                            n, channels, sample_rate, bits)
    if rc != 0:
        raise IOError(f"FLAC encode failed: {path}")
