"""Pallas TPU kernels.

``fused_highway_gate`` fuses the pointwise tail of every highway convolution
(``models/TTSModel.py:78-83``): two per-channel LayerNorms on the conv halves,
the sigmoid gate, and the residual blend — one VMEM-resident pass over the
(rows, C) tile instead of five XLA ops with HBM round-trips between them.
Wired into ``models.layers.HighwayConv`` (~26 highway layers per Text2Mel
step) behind ``cfg.tpu.highway_gate_impl`` /
``models.layers.set_default_gate_impl``. Default "xla" — measured on v5e
(``scripts/bench_gate.py``): the kernel wins only the bare teacher-forced
Text2Mel forward (30.2 vs 45.2 ms @ B=64 bf16), which no production path
runs alone; the ordinary train step is *slower* under it (21.4 vs 16.9 ms
@ B=64 f32 — the custom_vjp backward re-derives the plain formulation, so
grads pay a recompute XLA's own fusion avoids), SSRN inference is slower
(232 vs 143 ms @ B=768), and AR decode uses the single-frame ``step`` path
either way. Kept as measured infrastructure behind the knob.

Falls back to interpret mode automatically off-TPU (tests run it on CPU and
check parity with the plain jnp formulation).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU memory spaces only resolve on TPU builds; ANY works everywhere
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _gate_kernel(h1_ref, h2_ref, x_ref, s1_ref, b1_ref, s2_ref, b2_ref,
                 out_ref, *, eps: float):
    h1 = h1_ref[:].astype(jnp.float32)
    h2 = h2_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)

    def ln(v, scale, bias):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * scale + bias

    n1 = ln(h1, s1_ref[:], b1_ref[:])
    n2 = ln(h2, s2_ref[:], b2_ref[:])
    g = jax.nn.sigmoid(n1)
    out_ref[:] = (g * n2 + (1.0 - g) * x).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def fused_highway_gate(h: jax.Array, x: jax.Array, ln1_scale: jax.Array,
                       ln1_bias: jax.Array, ln2_scale: jax.Array,
                       ln2_bias: jax.Array, eps: float = 1e-5,
                       block_rows: int = 256,
                       interpret: Optional[bool] = None) -> jax.Array:
    """``h``: (..., 2C) conv output; ``x``: (..., C) residual input → (..., C).

    Computes ``σ(LN1(h[:C])) * LN2(h[C:]) + (1-σ(LN1(h[:C]))) * x``.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    *lead, two_c = h.shape
    c = two_c // 2
    rows = 1
    for d in lead:
        rows *= d
    h2d = h.reshape(rows, two_c)
    x2d = x.reshape(rows, c)
    h1 = h2d[:, :c]
    h2 = h2d[:, c:]

    # pad rows to a tile multiple
    pad = (-rows) % block_rows
    if pad:
        h1 = jnp.pad(h1, ((0, pad), (0, 0)))
        h2 = jnp.pad(h2, ((0, pad), (0, 0)))
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    n_tiles = h1.shape[0] // block_rows

    def row_spec():
        return pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                            **({"memory_space": _VMEM} if _VMEM else {}))

    def param_spec():
        return pl.BlockSpec((c,), lambda i: (0,),
                            **({"memory_space": _VMEM} if _VMEM else {}))

    out = pl.pallas_call(
        functools.partial(_gate_kernel, eps=eps),
        grid=(n_tiles,),
        in_specs=[row_spec(), row_spec(), row_spec(),
                  param_spec(), param_spec(), param_spec(), param_spec()],
        out_specs=row_spec(),
        out_shape=jax.ShapeDtypeStruct((h1.shape[0], c), x.dtype),
        interpret=interpret,
    )(h1, h2, x2d, ln1_scale, ln1_bias, ln2_scale, ln2_bias)
    if pad:
        out = out[:rows]
    return out.reshape(*lead, c)


def highway_gate_reference(h: jax.Array, x: jax.Array, ln1_scale, ln1_bias,
                           ln2_scale, ln2_bias, eps: float = 1e-5) -> jax.Array:
    """Plain-jnp formulation (what HighwayConv computes) for parity tests."""
    c = h.shape[-1] // 2
    h1, h2 = h[..., :c], h[..., c:]

    def ln(v, s, b):
        mu = v.mean(-1, keepdims=True)
        var = ((v - mu) ** 2).mean(-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * s + b

    n1 = ln(h1.astype(jnp.float32), ln1_scale, ln1_bias)
    n2 = ln(h2.astype(jnp.float32), ln2_scale, ln2_bias)
    g = jax.nn.sigmoid(n1)
    return (g * n2 + (1 - g) * x.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Differentiable wrapper: pallas_call has no VJP rule, so training through the
# fused gate needs one. Forward = the fused kernel; backward = the VJP of the
# (numerically equivalent) plain-jnp formulation — XLA fuses the backward
# chain the same way it fuses the plain forward, so grads cost what the "xla"
# gate's grads cost and the fused kernel's win applies to the forward pass.
# ---------------------------------------------------------------------------
@jax.custom_vjp
def fused_highway_gate_ad(h: jax.Array, x: jax.Array, ln1_scale: jax.Array,
                          ln1_bias: jax.Array, ln2_scale: jax.Array,
                          ln2_bias: jax.Array) -> jax.Array:
    return fused_highway_gate(h, x, ln1_scale, ln1_bias, ln2_scale, ln2_bias)


def _gate_ad_fwd(h, x, s1, b1, s2, b2):
    return fused_highway_gate(h, x, s1, b1, s2, b2), (h, x, s1, b1, s2, b2)


def _gate_ad_bwd(res, g):
    h, x, s1, b1, s2, b2 = res
    out, vjp = jax.vjp(highway_gate_reference, h, x, s1, b1, s2, b2)
    return vjp(jnp.asarray(g, out.dtype))


fused_highway_gate_ad.defvjp(_gate_ad_fwd, _gate_ad_bwd)
