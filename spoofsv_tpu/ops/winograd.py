"""Winograd fast convolution for the k=3 highway convs (experimental).

docs/SSRN_PROFILE.json localizes the SSRN hot-pair (hc3/hc4) gap in conv
matmul *execution*: even with all epilogue HBM traffic fused away the
blocks run at ~2x the MXU roofline. The remaining structural lever named
in docs/NEXT.md is an algorithmic one — Winograd F(m,3) computes a k=3
conv with fewer multiplications than the direct form:

  * direct: 3 MACs/output/channel-pair (3 accumulating matmuls)
  * F(2,3): 4 products / 2 outputs  = 2    MACs/output (1.5x fewer)
  * F(4,3): 6 products / 4 outputs  = 1.5  MACs/output (2x fewer)

This module implements the 1-D analog of Lavin & Gray (arXiv:1509.09308)
in PLAIN XLA — time is tiled into overlapping windows (stride m, length
m+2) with strided slices, the input/output transforms are small-integer
linear combinations XLA fuses into elementwise adds, and the transform-
domain products are ``m+2`` batched matmuls of 1/m-th the rows, so the
MXU sees the same layout as the direct conv but 1.5-2x fewer total MACs.

Numerics: the transform coefficients amplify values (F(4,3) by up to ~5
before the bf16 rounding into the MXU), so transform-domain products are
computed in the weight dtype and accumulated in f32 — parity tests pin
f32 exactness class, and the bf16 divergence must be judged on-chip
(bench_ssrn_conv.py --winograd arm) before this can back a default.

MEASURED (v5e, docs/SSRN_PROFILE.json "winograd"): ~3.2x SLOWER than the
direct conv at both hot shapes (hc3 B768: 119/118.99 ms vs 36.85 direct;
B256: 41.1/39.8 vs 13.3) despite 1.5–2x fewer MACs — the strided window
slicing + transform linear combinations are VPU/layout work that dwarfs
the MXU saving when the direct conv already runs at only ~2x roofline.
Kept as a documented negative result; do not revisit without moving the
transforms themselves into a Pallas kernel.

Reference conv semantics matched: ``models.layers.HighwayConv``'s k=3
conv, SAME (centered) or causal (left) zero padding, dilation 1 (dilated
variants would need per-phase decomposition — not the hot shape).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# F(2,3): output tile 2, input tile 4 — all-integer/half transforms
_BT2 = np.array([[1, 0, -1, 0],
                 [0, 1, 1, 0],
                 [0, -1, 1, 0],
                 [0, 1, 0, -1]], np.float32)
_G2 = np.array([[1, 0, 0],
                [0.5, 0.5, 0.5],
                [0.5, -0.5, 0.5],
                [0, 0, 1]], np.float32)
_AT2 = np.array([[1, 1, 1, 0],
                 [0, 1, -1, -1]], np.float32)

# F(4,3): output tile 4, input tile 6 (Lavin & Gray constants)
_BT4 = np.array([[4, 0, -5, 0, 1, 0],
                 [0, -4, -4, 1, 1, 0],
                 [0, 4, -4, -1, 1, 0],
                 [0, -2, -1, 2, 1, 0],
                 [0, 2, -1, -2, 1, 0],
                 [0, 4, 0, -5, 0, 1]], np.float32)
_G4 = np.array([[1 / 4, 0, 0],
                [-1 / 6, -1 / 6, -1 / 6],
                [-1 / 6, 1 / 6, -1 / 6],
                [1 / 24, 1 / 12, 1 / 6],
                [1 / 24, -1 / 12, 1 / 6],
                [0, 0, 1]], np.float32)
_AT4 = np.array([[1, 1, 1, 1, 1, 0],
                 [0, 1, -1, 2, -2, 0],
                 [0, 1, 1, 4, 4, 0],
                 [0, 1, -1, 8, -8, 1]], np.float32)

_TABLES = {2: (_BT2, _G2, _AT2), 4: (_BT4, _G4, _AT4)}


@functools.partial(jax.jit, static_argnames=("causal", "m"))
def winograd_conv1d_k3(x: jax.Array, kernel: jax.Array,
                       bias: jax.Array | None = None,
                       causal: bool = False, m: int = 4) -> jax.Array:
    """k=3, dilation-1 conv of ``x`` (B, T, C) with ``kernel`` (3, C, F) via
    Winograd F(m,3); returns (B, T, F) in f32 (accumulation dtype), matching
    ``lax.conv_general_dilated(..., padding=SAME|causal-left)``.
    """
    B, T, C = x.shape
    K, Ck, F = kernel.shape
    assert K == 3 and Ck == C, (kernel.shape, x.shape)
    BT, G, AT = _TABLES[m]
    n = m + 2                      # input tile length

    # zero-pad so tile 0 starts at the first needed input row:
    # SAME needs x[-1]; causal needs x[-2]
    pad_left = 2 if causal else 1
    nt = -(-T // m)                # output tiles
    # rows consumed: tile i covers input rows [m*i - pad_left, +n)
    pad_right = (nt - 1) * m + n - pad_left - T
    xp = jnp.pad(x, ((0, 0), (pad_left, max(pad_right, 0)), (0, 0)))

    # U[j]: (B, nt, C) — input row m*i + j of each tile, strided slice
    U = [jax.lax.slice_in_dim(xp, j, j + (nt - 1) * m + 1, m, axis=1)
         for j in range(n)]

    wdt = kernel.dtype
    # V[j] = sum_i BT[j,i] U[i]   (cheap adds; XLA fuses)
    V = [sum(float(BT[j, i]) * U[i] for i in range(n) if BT[j, i] != 0)
         for j in range(n)]
    # transformed kernel: Wt[j] = sum_r G[j,r] w[r]  (C, F)
    kf = kernel.astype(jnp.float32)
    Wt = [sum(float(G[j, r]) * kf[r] for r in range(3) if G[j, r] != 0)
          for j in range(n)]
    # transform-domain products — n matmuls of (B*nt, C) @ (C, F)
    M = [jnp.dot(V[j].reshape(B * nt, C).astype(wdt),
                 Wt[j].astype(wdt),
                 preferred_element_type=jnp.float32) for j in range(n)]
    # inverse transform: Y[p] = sum_j AT[p,j] M[j]
    Y = [sum(float(AT[p, j]) * M[j] for j in range(n) if AT[p, j] != 0)
         for p in range(m)]
    # interleave output phases: (B, nt, m, F) -> (B, nt*m, F) -> crop T
    out = jnp.stack([y.reshape(B, nt, F) for y in Y], axis=2)
    out = out.reshape(B, nt * m, F)[:, :T]
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def winograd_highway_conv(x, kernel, bias, ln1_scale, ln1_bias, ln2_scale,
                          ln2_bias, causal: bool = False, eps: float = 1e-5,
                          m: int = 4) -> jax.Array:
    """Full highway block (``highway_conv_reference`` semantics) with the
    k=3 dil-1 conv computed via Winograd — the XLA-only algorithmic arm for
    the bench A/B against the direct 3-matmul form."""
    h = winograd_conv1d_k3(x, kernel, bias, causal=causal, m=m)
    C = x.shape[-1]
    h1, h2 = h[..., :C], h[..., C:]

    def ln(v, s, b):
        mu = v.mean(-1, keepdims=True)
        var = ((v - mu) ** 2).mean(-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * s + b

    g = jax.nn.sigmoid(ln(h1, ln1_scale, ln1_bias))
    return (g * ln(h2, ln2_scale, ln2_bias)
            + (1 - g) * x.astype(jnp.float32)).astype(x.dtype)
