"""JAX/XLA DSP kernels: batched STFT, ISTFT, Griffin-Lim, de-emphasis.

These run jitted on TPU and are numerically parity-tested against the numpy
host tier (:mod:`spoofsv_tpu.dsp.host`). Layout convention is time-major
``(..., T, F)`` so the frequency axis (e.g. 513 bins) lands on TPU lanes.

The reference performs all of this per-utterance on CPU with librosa
(``synthesize.py:144-147``: 64-iteration Griffin-Lim + IIR de-emphasis per
utterance). Here the whole vocoder is one jitted program batched across
utterances: Griffin-Lim's 64 iterations are a ``lax.fori_loop`` whose
STFT/ISTFT are batched rFFTs on the TPU, and the de-emphasis IIR is a
first-order linear recurrence evaluated as a parallel associative scan.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spoofsv_tpu.dsp.primitives import hann_window, pad_center, window_sumsquare


def _fft_window(win_length: int, n_fft: int) -> np.ndarray:
    return pad_center(hann_window(win_length), n_fft).astype(np.float32)


def frame_signal(y: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Frame ``(..., L)`` → ``(..., T, n_fft)`` with T = 1 + (L-n_fft)//hop.

    Fast path (hop divides n_fft): builds frames out of ``n_fft//hop``
    contiguous strided slices — no gather, XLA lowers it to cheap reshapes.
    """
    L = y.shape[-1]
    n_frames = 1 + (L - n_fft) // hop_length
    if n_fft % hop_length == 0:
        k = n_fft // hop_length
        usable = hop_length * (n_frames - 1 + k)
        z = y[..., :usable].reshape(*y.shape[:-1], -1, hop_length)  # (..., C, hop)
        parts = [z[..., i: i + n_frames, :] for i in range(k)]
        return jnp.concatenate(parts, axis=-1)                      # (..., T, n_fft)
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return y[..., idx]


def stft(y: jnp.ndarray, n_fft: int, hop_length: int,
         win_length: Optional[int] = None, center: bool = True) -> jnp.ndarray:
    """Complex STFT of ``(..., L)`` → ``(..., T, 1+n_fft//2)`` (time-major)."""
    if win_length is None:
        win_length = n_fft
    window = jnp.asarray(_fft_window(win_length, n_fft))
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad, mode="reflect")
    frames = frame_signal(y, n_fft, hop_length) * window
    return jnp.fft.rfft(frames, axis=-1)


def _overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """OLA of ``(..., T, n_fft)`` → ``(..., n_fft + hop*(T-1))``.

    Requires hop | n_fft; implemented as a sum of k=n_fft/hop zero-padded
    shifted chunk stacks (static slices only — no scatter).
    """
    *lead, T, n_fft = frames.shape
    assert n_fft % hop_length == 0, "overlap-add fast path needs hop | n_fft"
    k = n_fft // hop_length
    chunks = frames.reshape(*lead, T, k, hop_length)
    total_chunks = T + k - 1
    out = jnp.zeros((*lead, total_chunks, hop_length), frames.dtype)
    for i in range(k):
        pad = [(0, 0)] * len(lead) + [(i, k - 1 - i), (0, 0)]
        out = out + jnp.pad(chunks[..., :, i, :], pad)
    return out.reshape(*lead, total_chunks * hop_length)


def istft(spec: jnp.ndarray, n_fft: int, hop_length: int,
          win_length: Optional[int] = None, center: bool = True) -> jnp.ndarray:
    """Inverse STFT of ``(..., T, 1+n_fft//2)`` → ``(..., hop*(T-1))`` (centered)."""
    if win_length is None:
        win_length = n_fft
    window = jnp.asarray(_fft_window(win_length, n_fft))
    T = spec.shape[-2]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window
    y = _overlap_add(frames, hop_length)
    wss = window_sumsquare(hann_window(win_length), T, hop_length, n_fft)
    wss = jnp.asarray(wss.astype(np.float32))
    y = jnp.where(wss > 1e-11, y / jnp.maximum(wss, 1e-11), y)
    if center:
        y = y[..., n_fft // 2: y.shape[-1] - n_fft // 2]
    return y


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "n_iter"))
def griffin_lim(mag: jnp.ndarray, key: jax.Array, n_fft: int, hop_length: int,
                win_length: int, n_iter: int = 64, momentum: float = 0.99) -> jnp.ndarray:
    """Batched Griffin-Lim phase reconstruction on TPU.

    ``mag``: magnitude spectrogram ``(..., T, 1+n_fft//2)`` → audio ``(..., hop*(T-1))``.
    Matches librosa 0.7 ``griffinlim`` (momentum accel, random phase init) as
    invoked at ``synthesize.py:144`` (n_iter=64, hop 256, win 1024).
    """
    mag = mag.astype(jnp.float32)
    phase = jax.random.uniform(key, mag.shape, jnp.float32, 0.0, 2.0 * jnp.pi)
    angles = jnp.exp(1j * phase).astype(jnp.complex64)
    rebuilt = jnp.zeros_like(angles)
    alpha = momentum / (1.0 + momentum)

    def body(_, carry):
        angles, rebuilt = carry
        tprev = rebuilt
        inverse = istft(mag * angles, n_fft, hop_length, win_length)
        rebuilt = stft(inverse, n_fft, hop_length, win_length)
        ang = rebuilt - alpha * tprev
        ang = ang / (jnp.abs(ang) + 1e-16)
        return ang.astype(jnp.complex64), rebuilt.astype(jnp.complex64)

    angles, _ = jax.lax.fori_loop(0, n_iter, body, (angles, rebuilt))
    return istft(mag * angles, n_fft, hop_length, win_length)


@jax.jit
def deemphasis(x: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    """First-order IIR ``y[n] = x[n] + c*y[n-1]`` as a parallel associative scan.

    The reference applies this per-utterance on CPU via scipy
    (``synthesize.py:145``); here it is O(log L) depth on TPU and batched.
    """
    a = jnp.full_like(x, coeff)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, br + ar * bl

    _, y = jax.lax.associative_scan(combine, (a, x), axis=-1)
    return y


@jax.jit
def preemphasis(x: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    """``y[0]=x[0], y[n]=x[n]-c*x[n-1]`` (``data/dataset.py:96``), batched."""
    shifted = jnp.pad(x[..., :-1], [(0, 0)] * (x.ndim - 1) + [(1, 0)])
    return x - coeff * shifted


def mel_project(lin_mag: jnp.ndarray, fb: jnp.ndarray) -> jnp.ndarray:
    """Project ``(..., T, F)`` magnitudes through mel filterbank ``(M, F)`` → ``(..., T, M)``."""
    return jnp.einsum("...tf,mf->...tm", lin_mag, fb)
