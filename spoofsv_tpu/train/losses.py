"""Training losses: L1 + binary divergence + guided attention.

Re-implements the reference loss stack (``train/ordinary.py:21-28,230-236``)
with optional validity masks. With ``mask=None`` the numerics are exactly the
reference's (which averages over zero-padded frames too — a documented
bug-for-bug compatibility mode); with masks, padded frames are excluded.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=8)
def guided_attention_matrix(max_text_len: int, max_frame_num: int,
                            g: float = 0.2) -> np.ndarray:
    """W[n, t] = 1 - exp(-((t/T - n/N)^2) / (2 g^2)) (``train/ordinary.py:21-28``)."""
    n = np.arange(max_text_len)[:, None] / max_text_len
    t = np.arange(max_frame_num)[None, :] / max_frame_num
    return (1.0 - np.exp(-((t - n) ** 2) / (2.0 * g * g))).astype(np.float32)


def l1_loss(target: Array, pred: Array, mask: Optional[Array] = None) -> Array:
    """mean |target - pred| (``train/ordinary.py:230``); mask: (B, T) validity."""
    diff = jnp.abs(target - pred)
    if mask is None:
        return diff.mean()
    m = mask[..., None].astype(diff.dtype)
    return (diff * m).sum() / (m.sum() * diff.shape[-1])


def binary_divergence(target: Array, pred: Array, mask: Optional[Array] = None) -> Array:
    """BCE on sigmoid outputs (``train/ordinary.py:231``).

    The reference's ``log(1 - pred + 1e-8)`` is NOT safe under XLA fusion:
    the algebraic simplifier reassociates it to ``(1 + 1e-8) - pred``, and
    ``1 + 1e-8`` rounds to exactly 1.0 in f32 (ulp near 1 is 6e-8) — a
    saturated sigmoid then yields ``log(0) = -inf`` and ``-inf · 0 = NaN``
    against ``target == 1`` (observed: SSRN training NaN'd at reference dims
    on TPU at ~iter 100 while the same state/batch was finite eagerly).
    Flooring the log argument with ``maximum`` cannot be reassociated away
    and equals the reference values wherever the reference is finite.
    """
    pred = jnp.clip(pred, 0.0, 1.0)
    bd = (-target * jnp.log(jnp.maximum(pred, 1e-8))
          - (1.0 - target) * jnp.log(jnp.maximum(1.0 - pred, 1e-8)))
    if mask is None:
        return bd.mean()
    m = mask[..., None].astype(bd.dtype)
    return (bd * m).sum() / (m.sum() * bd.shape[-1])


def guided_attention_loss(attention: Array, gaw: Array,
                          mask: Optional[Array] = None) -> Array:
    """sum(A * W[:N, :T]) / count (``train/ordinary.py:232-234``).

    The reference pads A to (MAX_TEXT_LEN, MAX_FRAME_NUM) with a −1 sentinel and
    divides by the count of non-sentinel cells — algebraically identical to
    slicing W to the batch's (N, T) and dividing by B·N·T.
    ``attention``: (B, N, T); ``gaw``: full (MAX_N, MAX_T) table.
    """
    _, n, t = attention.shape
    w = jax.lax.dynamic_slice(gaw, (0, 0), (n, t))
    weighted = attention * w[None]
    if mask is None:
        return weighted.sum() / (attention.shape[0] * n * t)
    m = mask.astype(weighted.dtype)
    return (weighted * m).sum() / m.sum()


def text2mel_losses(mel_gt: Array, pred: Array, attention: Array, gaw: Array,
                    mel_mask: Optional[Array] = None,
                    att_mask: Optional[Array] = None) -> Tuple[Array, Array, Array]:
    return (
        l1_loss(mel_gt, pred, mel_mask),
        binary_divergence(mel_gt, pred, mel_mask),
        guided_attention_loss(attention, gaw, att_mask),
    )


def ssrn_losses(lin_gt: Array, pred: Array,
                mask: Optional[Array] = None) -> Tuple[Array, Array]:
    return l1_loss(lin_gt, pred, mask), binary_divergence(lin_gt, pred, mask)
