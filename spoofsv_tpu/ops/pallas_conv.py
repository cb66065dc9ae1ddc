"""Fused highway-convolution kernel: conv + LN×2 + sigmoid gate + residual.

The SSRN's hot layers (hc3/hc4: k=3 convs at 512→1024 channels over 1300
frames) run at ~42 % MXU efficiency under XLA (docs/NEXT.md) — the gap is
conv+epilogue HBM traffic, not the lowering (a matmul re-lowering ties XLA
exactly, int8 is 2× slower, and the gate-only Pallas fusion made SSRN
*slower* because the extra dispatch broke XLA's own epilogue fusion). This
kernel fuses the WHOLE highway block of ``models.layers.HighwayConv``
(``models/TTSModel.py:37-84``): the k-tap dilated conv (as K accumulating
MXU matmuls over a halo'd tile), both LayerNorms, the sigmoid gate and the
residual blend — one read of x, one write of y, h never touches HBM.

HBM traffic per layer at (B,T,C)=(768,1300,512) bf16: XLA ≈ read x (1 GB) +
write h (2 GB) + read h + x (3 GB) + write y (1 GB) ≈ 7 GB ≈ 8.5 ms at
819 GB/s; fused ≈ read x + write y ≈ 2 GB ≈ 2.4 ms — against a 16 ms MXU
roofline for the matmuls, so the kernel is compute-bound where XLA is
traffic-bound.

Measured on v5e with chained timing (``scripts/bench_ssrn_conv.py``,
docs/SSRN_PROFILE.json): every isolated block wins 11–21 % over XLA
(hc3 B=768: 36.8→31.8 ms) — but the FULL SSRN module runs ~16 % SLOWER
under the process-wide switch (120 vs 104 ms, reproduced twice): the
pallas_call boundaries break XLA's cross-layer fusion/scheduling, the
same module-level inversion the gate kernel and the int8 conv hit. So
``cfg.tpu.highway_infer_impl`` defaults to "xla" and this kernel is an
opt-in knob; its lasting value is diagnostic — removing essentially all
epilogue HBM traffic leaves hc3/hc4 at ~2× the MXU roofline, which
localizes the 42 %-MXU gap in conv matmul execution itself, not in
fusion. (Training keeps XLA either way: the custom_vjp backward
re-derives the plain formulation, same trade as the gate kernel.)

Halo handling: each (block_t, C) tile also reads its left/right neighbor
blocks (three BlockSpecs onto the same array with clamped index maps) and
assembles a (block_t + dil·(K−1), C) halo in VMEM; rows outside [0, T) are
masked to zero, which reproduces the conv's zero padding — SAME (centered)
and causal (left) paddings are just different halo offsets.
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


def _hconv_kernel(xprev_ref, xcur_ref, xnext_ref, w_ref, b_ref,
                  s1_ref, b1_ref, s2_ref, b2_ref, out_ref, *,
                  K: int, dil: int, pad_left: int, block_t: int, T: int,
                  eps: float):
    i = pl.program_id(1)
    span = dil * (K - 1)
    H = block_t + span

    xcur = xcur_ref[0]

    # halo rows r ∈ [0, H) hold global frame g = i·block_t − pad_left + r;
    # assemble from the three neighbor tiles (in the input dtype — no f32
    # round-trip before the MXU) and zero anything outside [0, T)
    # (the conv's zero padding, and the ragged tail of the last tile).
    pad_right = span - pad_left
    parts = []
    if pad_left:
        parts.append(xprev_ref[0][block_t - pad_left:])
    parts.append(xcur)
    if pad_right:
        parts.append(xnext_ref[0][:pad_right])
    halo = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    g = (i * block_t - pad_left
         + jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0))
    halo = jnp.where((g >= 0) & (g < T), halo,
                     jnp.zeros((), halo.dtype))

    # conv as K accumulating MXU matmuls, one per tap. (The wide-matmul
    # alternative — lane-concatenate the K shifted taps against the
    # (K·C, 2C)-reshaped kernel, as HighwayConv.step does — does NOT
    # compile on TPU: the tap slices carry sublane offsets 0, dil, 2·dil
    # and Mosaic's lane-dim concatenate requires equal offsets on the
    # non-concat dim ("result/input offset mismatch", v5e). Accumulating
    # dots relayout each tap for free on its way into the MXU.)
    wdt = w_ref.dtype
    Ck = halo.shape[-1]
    h = jnp.zeros((block_t, 2 * Ck), jnp.float32)
    for k in range(K):
        h += jnp.dot(halo[k * dil: k * dil + block_t].astype(wdt),
                     w_ref[k * Ck:(k + 1) * Ck],
                     preferred_element_type=jnp.float32)
    h += b_ref[:].astype(jnp.float32)[None, :]

    C = xcur.shape[-1]
    xcur = xcur.astype(jnp.float32)
    h1, h2 = h[:, :C], h[:, C:]

    def ln(v, scale, bias):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * scale + bias

    n1 = ln(h1, s1_ref[:], b1_ref[:])
    n2 = ln(h2, s2_ref[:], b2_ref[:])
    gt = jax.nn.sigmoid(n1)
    out_ref[0] = (gt * n2 + (1.0 - gt) * xcur).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "dilation", "causal", "eps", "block_t", "interpret"))
def fused_highway_conv(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                       ln1_scale: jax.Array, ln1_bias: jax.Array,
                       ln2_scale: jax.Array, ln2_bias: jax.Array,
                       dilation: int = 1, causal: bool = False,
                       eps: float = 1e-5, block_t: int = 256,
                       interpret: Optional[bool] = None) -> jax.Array:
    """Full highway conv: ``x`` (B, T, C), ``kernel`` (K, C, 2C) →
    ``σ(LN1(h₁))·LN2(h₂) + (1−σ)·x`` with ``[h₁,h₂] = conv(x)``, (B, T, C).

    SAME (non-causal, odd K) or causal left padding, matching
    ``models.layers.HighwayConv``.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, C = x.shape
    K = kernel.shape[0]
    assert kernel.shape == (K, C, 2 * C), kernel.shape
    span = dilation * (K - 1)
    pad_left = span if causal else span // 2
    block_t = min(block_t, max(8, T))
    assert span <= block_t, (span, block_t)
    nt = pl.cdiv(T, block_t)

    # pad T to a block multiple: rows past T are masked inside the kernel,
    # so the pad content is irrelevant — but static shapes must divide.
    Tp = nt * block_t
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))

    def xspec(off):
        return pl.BlockSpec(
            (1, block_t, C),
            lambda b, i: (b, jnp.clip(i + off, 0, nt - 1), 0),
            **({"memory_space": _VMEM} if _VMEM else {}))

    def pspec(n):
        return pl.BlockSpec((n,), lambda b, i: (0,),
                            **({"memory_space": _VMEM} if _VMEM else {}))

    wspec = pl.BlockSpec((K * C, 2 * C), lambda b, i: (0, 0),
                         **({"memory_space": _VMEM} if _VMEM else {}))

    compiler_params = None
    if pltpu is not None and not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))

    out = pl.pallas_call(
        functools.partial(_hconv_kernel, K=K, dil=dilation,
                          pad_left=pad_left, block_t=block_t, T=T, eps=eps),
        grid=(B, nt),
        in_specs=[xspec(-1), xspec(0), xspec(+1), wspec,
                  pspec(2 * C), pspec(C), pspec(C), pspec(C), pspec(C)],
        out_specs=pl.BlockSpec((1, block_t, C), lambda b, i: (b, i, 0),
                               **({"memory_space": _VMEM} if _VMEM else {})),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), x.dtype),
        compiler_params=compiler_params,
        interpret=interpret,
    )(x, x, x, kernel.reshape(K * C, 2 * C), bias,
      ln1_scale, ln1_bias, ln2_scale, ln2_bias)
    return out[:, :T] if Tp != T else out


# ---------------------------------------------------------------------------
# Two-layer fusion: a PAIR of consecutive highway blocks in ONE dispatch.
#
# docs/SSRN_PROFILE.json's module-level inversion showed that each single
# fused block wins 11–21 % in isolation but the pallas_call *boundaries*
# cost more than the fusion saves once the whole module runs. The direct
# counter (docs/NEXT.md "two-layer-per-dispatch") is to halve the number of
# boundaries AND keep the inter-layer activation y1 in VMEM: SSRN's hot
# pairs (hc1→hc2, ups*.hc1→hc2, hc3→hc4) and the dilation stacks' (1,3) /
# (9,27) pairs are back-to-back same-shape highway blocks, so one kernel
# can run conv_a + LN×2 + gate, keep y1 (block_t + span_b rows) in VMEM,
# and run conv_b + LN×2 + gate — x is read once, y written once, h_a, y1,
# h_b never touch HBM. The recompute overhead is span_b extra rows of
# layer A per tile (≤ 6/256 ≈ 2 %).
#
# MEASURED (v5e, docs/SSRN_PROFILE.json "pairs"/"module_ab"): every isolated
# pair wins 20–25 % vs XLA (hc34 B768: 72.45 → 55.43 ms) and beats the 2×
# single-block chain (58.11) — but the FULL module still inverts (fused_pair
# 116–120 ms vs xla 104.3–104.6), the fourth module-level inversion after
# the gate kernel, int8 conv and single-block fusion: pallas_call boundaries
# break XLA's cross-layer scheduling regardless of how few there are. The
# pair kernel stays an opt-in arm ("fused_pair" impl) for isolated-block
# callers; highway_infer_impl default remains "xla".
# ---------------------------------------------------------------------------
def _hconv_pair_kernel(xprev_ref, xcur_ref, xnext_ref,
                       wa_ref, ba_ref, s1a_ref, b1a_ref, s2a_ref, b2a_ref,
                       wb_ref, bb_ref, s1b_ref, b1b_ref, s2b_ref, b2b_ref,
                       out_ref, *,
                       K: int, dil_a: int, dil_b: int,
                       pa_left: int, pb_left: int,
                       block_t: int, T: int, eps: float):
    i = pl.program_id(1)
    span_a = dil_a * (K - 1)
    span_b = dil_b * (K - 1)
    H1 = block_t + span_b          # rows of y1 needed by conv_b
    H0 = H1 + span_a               # rows of x needed by conv_a

    xcur = xcur_ref[0]
    xdt = xcur.dtype

    # x halo rows r ∈ [0, H0) hold global frame
    #   g0 = i·block_t − pb_left − pa_left + r
    left_ext = pa_left + pb_left
    right_ext = (span_a - pa_left) + (span_b - pb_left)
    parts = []
    if left_ext:
        parts.append(xprev_ref[0][block_t - left_ext:])
    parts.append(xcur)
    if right_ext:
        parts.append(xnext_ref[0][:right_ext])
    halo = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    g0 = (i * block_t - left_ext
          + jax.lax.broadcasted_iota(jnp.int32, (H0, 1), 0))
    halo = jnp.where((g0 >= 0) & (g0 < T), halo, jnp.zeros((), halo.dtype))

    C = xcur.shape[-1]
    wdt = wa_ref.dtype

    def ln(v, scale, bias):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * scale + bias

    # ---- layer A over the H1 middle rows (y1 is conv_b's input) ----------
    h = jnp.zeros((H1, 2 * C), jnp.float32)
    for k in range(K):
        h += jnp.dot(halo[k * dil_a: k * dil_a + H1].astype(wdt),
                     wa_ref[k * C:(k + 1) * C],
                     preferred_element_type=jnp.float32)
    h += ba_ref[:].astype(jnp.float32)[None, :]
    gt = jax.nn.sigmoid(ln(h[:, :C], s1a_ref[:], b1a_ref[:]))
    n2 = ln(h[:, C:], s2a_ref[:], b2a_ref[:])
    x_mid = halo[pa_left: pa_left + H1].astype(jnp.float32)
    y1 = gt * n2 + (1.0 - gt) * x_mid
    # zero rows outside [0, T): conv_b's zero padding must see zeros, not
    # the gate blend of a zero input (bias/LN make that non-zero); and cast
    # through the storage dtype so the pair matches two chained single-block
    # kernels exactly (they round-trip y1 through HBM in x.dtype).
    g1 = (i * block_t - pb_left
          + jax.lax.broadcasted_iota(jnp.int32, (H1, 1), 0))
    y1 = jnp.where((g1 >= 0) & (g1 < T), y1.astype(xdt), jnp.zeros((), xdt))

    # ---- layer B over the block_t output rows -----------------------------
    hb = jnp.zeros((block_t, 2 * C), jnp.float32)
    for k in range(K):
        hb += jnp.dot(y1[k * dil_b: k * dil_b + block_t].astype(wdt),
                      wb_ref[k * C:(k + 1) * C],
                      preferred_element_type=jnp.float32)
    hb += bb_ref[:].astype(jnp.float32)[None, :]
    gtb = jax.nn.sigmoid(ln(hb[:, :C], s1b_ref[:], b1b_ref[:]))
    n2b = ln(hb[:, C:], s2b_ref[:], b2b_ref[:])
    y1_mid = y1[pb_left: pb_left + block_t].astype(jnp.float32)
    out_ref[0] = (gtb * n2b + (1.0 - gtb) * y1_mid).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "dilation_a", "dilation_b", "causal", "eps", "block_t", "interpret"))
def fused_highway_conv_pair(x: jax.Array,
                            kernel_a: jax.Array, bias_a: jax.Array,
                            s1a: jax.Array, b1a: jax.Array,
                            s2a: jax.Array, b2a: jax.Array,
                            kernel_b: jax.Array, bias_b: jax.Array,
                            s1b: jax.Array, b1b: jax.Array,
                            s2b: jax.Array, b2b: jax.Array,
                            dilation_a: int = 1, dilation_b: int = 1,
                            causal: bool = False, eps: float = 1e-5,
                            block_t: int = 256,
                            interpret: Optional[bool] = None) -> jax.Array:
    """Two consecutive highway blocks (same C, same causality) in one
    pallas dispatch; computes exactly what chaining ``fused_highway_conv``
    twice computes (y1 is cast through ``x.dtype`` between the layers —
    residual differences are dot-reduction-order only). ``x`` (B, T, C),
    kernels (K, C, 2C)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, C = x.shape
    K = kernel_a.shape[0]
    assert kernel_a.shape == (K, C, 2 * C), kernel_a.shape
    assert kernel_b.shape == (K, C, 2 * C), kernel_b.shape
    span_a = dilation_a * (K - 1)
    span_b = dilation_b * (K - 1)
    pa_left = span_a if causal else span_a // 2
    pb_left = span_b if causal else span_b // 2
    block_t = min(block_t, max(8, T))
    # the three-tile halo covers one block on each side
    assert pa_left + pb_left <= block_t, (span_a, span_b, block_t)
    assert (span_a - pa_left) + (span_b - pb_left) <= block_t
    nt = pl.cdiv(T, block_t)
    Tp = nt * block_t
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))

    def xspec(off):
        return pl.BlockSpec(
            (1, block_t, C),
            lambda b, i: (b, jnp.clip(i + off, 0, nt - 1), 0),
            **({"memory_space": _VMEM} if _VMEM else {}))

    def pspec(n):
        return pl.BlockSpec((n,), lambda b, i: (0,),
                            **({"memory_space": _VMEM} if _VMEM else {}))

    wspec = pl.BlockSpec((K * C, 2 * C), lambda b, i: (0, 0),
                         **({"memory_space": _VMEM} if _VMEM else {}))

    compiler_params = None
    if pltpu is not None and not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))

    out = pl.pallas_call(
        functools.partial(_hconv_pair_kernel, K=K, dil_a=dilation_a,
                          dil_b=dilation_b, pa_left=pa_left, pb_left=pb_left,
                          block_t=block_t, T=T, eps=eps),
        grid=(B, nt),
        in_specs=[xspec(-1), xspec(0), xspec(+1),
                  wspec, pspec(2 * C), pspec(C), pspec(C), pspec(C), pspec(C),
                  wspec, pspec(2 * C), pspec(C), pspec(C), pspec(C), pspec(C)],
        out_specs=pl.BlockSpec((1, block_t, C), lambda b, i: (b, i, 0),
                               **({"memory_space": _VMEM} if _VMEM else {})),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), x.dtype),
        compiler_params=compiler_params,
        interpret=interpret,
    )(x, x, x,
      kernel_a.reshape(K * C, 2 * C), bias_a, s1a, b1a, s2a, b2a,
      kernel_b.reshape(K * C, 2 * C), bias_b, s1b, b1b, s2b, b2b)
    return out[:, :T] if Tp != T else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def fused_highway_conv_pair_ad(x, kernel_a, bias_a, s1a, b1a, s2a, b2a,
                               kernel_b, bias_b, s1b, b1b, s2b, b2b,
                               dilation_a: int = 1, dilation_b: int = 1,
                               causal: bool = False):
    """Differentiable pair fusion: forward = the fused kernel, backward =
    the VJP of the chained plain formulation (same recompute trade as
    ``fused_highway_conv_ad``)."""
    return fused_highway_conv_pair(
        x, kernel_a, bias_a, s1a, b1a, s2a, b2a,
        kernel_b, bias_b, s1b, b1b, s2b, b2b,
        dilation_a=dilation_a, dilation_b=dilation_b, causal=causal)


def _pair_reference(x, kernel_a, bias_a, s1a, b1a, s2a, b2a,
                    kernel_b, bias_b, s1b, b1b, s2b, b2b,
                    dilation_a, dilation_b, causal):
    y1 = highway_conv_reference(x, kernel_a, bias_a, s1a, b1a, s2a, b2a,
                                dilation=dilation_a, causal=causal)
    return highway_conv_reference(y1, kernel_b, bias_b, s1b, b1b, s2b, b2b,
                                  dilation=dilation_b, causal=causal)


def _pair_ad_fwd(x, ka, ba, s1a, b1a, s2a, b2a, kb, bb, s1b, b1b, s2b, b2b,
                 dilation_a, dilation_b, causal):
    out = fused_highway_conv_pair(
        x, ka, ba, s1a, b1a, s2a, b2a, kb, bb, s1b, b1b, s2b, b2b,
        dilation_a=dilation_a, dilation_b=dilation_b, causal=causal)
    return out, (x, ka, ba, s1a, b1a, s2a, b2a, kb, bb, s1b, b1b, s2b, b2b)


def _pair_ad_bwd(dilation_a, dilation_b, causal, res, g):
    out, vjp = jax.vjp(
        lambda *a: _pair_reference(*a, dilation_a=dilation_a,
                                   dilation_b=dilation_b, causal=causal),
        *res)
    return vjp(jnp.asarray(g, out.dtype))


fused_highway_conv_pair_ad.defvjp(_pair_ad_fwd, _pair_ad_bwd)


def highway_conv_reference(x, kernel, bias, ln1_scale, ln1_bias, ln2_scale,
                           ln2_bias, dilation: int = 1, causal: bool = False,
                           eps: float = 1e-5) -> jax.Array:
    """Plain-XLA formulation (what HighwayConv computes) for parity/grads."""
    K = kernel.shape[0]
    pad = dilation * (K - 1)
    inp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0))) if causal else x
    h = jax.lax.conv_general_dilated(
        inp, kernel, window_strides=(1,),
        padding="VALID" if causal else "SAME",
        rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32) + bias.astype(jnp.float32)
    C = x.shape[-1]
    h1, h2 = h[..., :C], h[..., C:]

    def ln(v, s, b):
        mu = v.mean(-1, keepdims=True)
        var = ((v - mu) ** 2).mean(-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * s + b

    n1 = ln(h1, ln1_scale, ln1_bias)
    n2 = ln(h2, ln2_scale, ln2_bias)
    g = jax.nn.sigmoid(n1)
    return (g * n2 + (1 - g) * x.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Differentiable wrapper (same trade as ops.pallas_ops.fused_highway_gate_ad):
# forward = the fused kernel, backward = the VJP of the plain formulation.
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_highway_conv_ad(x, kernel, bias, s1, b1, s2, b2,
                          dilation: int = 1, causal: bool = False):
    return fused_highway_conv(x, kernel, bias, s1, b1, s2, b2,
                              dilation=dilation, causal=causal)


def _hconv_ad_fwd(x, kernel, bias, s1, b1, s2, b2, dilation, causal):
    out = fused_highway_conv(x, kernel, bias, s1, b1, s2, b2,
                             dilation=dilation, causal=causal)
    return out, (x, kernel, bias, s1, b1, s2, b2)


def _hconv_ad_bwd(dilation, causal, res, g):
    x, kernel, bias, s1, b1, s2, b2 = res
    out, vjp = jax.vjp(
        lambda *a: highway_conv_reference(*a, dilation=dilation,
                                          causal=causal),
        x, kernel, bias, s1, b1, s2, b2)
    return vjp(jnp.asarray(g, out.dtype))


fused_highway_conv_ad.defvjp(_hconv_ad_fwd, _hconv_ad_bwd)
