#!/usr/bin/env python
"""Module-level int8 arm for the SSRN (VERDICT r4 #9).

Round-3 closed the SSRN fusion and Winograd arms at module level
(docs/SSRN_PROFILE.json: every isolated block wins, the full module loses —
pallas_call boundaries break XLA's cross-layer fusion), and block-level
int8 measured 2× SLOWER on a single conv re-lowering (docs/NEXT.md). This
script measures the remaining named lever module-wide: the FULL SSRN
forward with every matmul (k=3 highway convs as per-tap matmuls, 1×1
convs/Dense, deconv) in int8 with dynamic per-tensor activation scales and
per-output-channel weight scales — int8's best case on v5e (2× MXU rate),
everything else (LN, gates, sigmoid) left in f32/bf16.

Chained timing (K invocations inside one jitted fori_loop, one fetch —
the tunnel has a ~30 ms per-call floor). Also reports the output error vs
the bf16 module, since SSRN's sigmoid output feeds the vocoder directly.

Run alone on the live chip: ``python scripts/bench_ssrn_int8.py [B]``.
Appends ``module_ab_int8`` to docs/SSRN_PROFILE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts._benchlib import setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spoofsv_tpu.models import SSRN  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "SSRN_PROFILE.json")
LN_EPS = 1e-5


def _q8(x, axis=None):
    """Symmetric int8 quantization; returns (q, scale) with q = x/scale."""
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None) + 1e-20
    scale = amax / 126.5
    return jnp.round(x / scale).astype(jnp.int8), scale


def _dense_i8(x, kernel, bias):
    """x (..., Cin) @ kernel (Cin, Cout) in int8, dequantized f32 out."""
    qx, sx = _q8(x.astype(jnp.float32))
    qw, sw = _q8(kernel.astype(jnp.float32), axis=0)       # per-out-channel
    acc = jax.lax.dot_general(qx, qw, (((qx.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sx * sw) + bias.astype(jnp.float32)


def _conv_i8(x, kernel, bias, dilation=1):
    """SAME dilated 1-D conv (B, T, Cin) → (B, T, Cout) as K int8 matmuls."""
    k = kernel.shape[0]
    pad = dilation * (k - 1)
    xp = jnp.pad(x, ((0, 0), (pad // 2, pad - pad // 2), (0, 0)))
    T = x.shape[1]
    qx, sx = _q8(xp.astype(jnp.float32))
    acc = None
    for tap in range(k):
        qw, sw = _q8(kernel[tap].astype(jnp.float32), axis=0)
        part = jax.lax.dot_general(
            jax.lax.dynamic_slice_in_dim(qx, tap * dilation, T, 1), qw,
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        term = part.astype(jnp.float32) * (sx * sw)
        acc = term if acc is None else acc + term
    return acc + bias.astype(jnp.float32)


def _ln(x, scale, bias):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + LN_EPS) * scale + bias


def _hc_i8(p, x, dilation):
    h = _conv_i8(x, p["conv"]["kernel"], p["conv"]["bias"], dilation)
    h1, h2 = jnp.split(h, 2, axis=-1)
    h1 = _ln(h1, p["ln1"]["scale"], p["ln1"]["bias"])
    h2 = _ln(h2, p["ln2"]["scale"], p["ln2"]["bias"])
    g = jax.nn.sigmoid(h1)
    return g * h2 + (1.0 - g) * x


def _deconv_i8(p, x):
    """ConvTranspose(k=2, s=2): output frame 2t+j = x[t] @ K[1-j] (flax
    flips the transpose kernel) — two int8 matmuls interleaved."""
    kern = p["kernel"]            # (2, Cin, Cout)
    b = p["bias"]
    y0 = _dense_i8(x, kern[1], b)
    y1 = _dense_i8(x, kern[0], b)
    B, T, C = y0.shape
    return jnp.stack([y0, y1], axis=2).reshape(B, 2 * T, C)


def int8_ssrn(params, mel):
    """The exact SSRN.__call__ graph (models/ssrn.py) with int8 matmuls."""
    p = params["params"]

    def ln_dense(x, name):
        x = _dense_i8(x, p[f"{name}_dense"]["kernel"], p[f"{name}_dense"]["bias"])
        return _ln(x, p[f"{name}_ln"]["scale"], p[f"{name}_ln"]["bias"])

    x = ln_dense(mel.astype(jnp.float32), "conv1")
    x = _hc_i8(p["hc1"], x, 1)
    x = _hc_i8(p["hc2"], x, 3)
    for ups in ("ups1", "ups2"):
        x = _deconv_i8(p[ups]["deconv"], x)
        x = _hc_i8(p[ups]["hc1"], x, 1)
        x = _hc_i8(p[ups]["hc2"], x, 3)
    x = ln_dense(x, "conv2")
    x = _hc_i8(p["hc3"], x, 1)
    x = _hc_i8(p["hc4"], x, 1)
    x = ln_dense(x, "conv3")
    x = ln_dense(x, "conv4")
    x = jax.nn.relu(x)
    x = ln_dense(x, "conv5")
    x = jax.nn.relu(x)
    x = ln_dense(x, "conv6")
    return jax.nn.sigmoid(x)


def chained_ms(fn, params, x, iters=10):
    @jax.jit
    def loop(p, v):
        def body(i, carry):
            out = fn(p, v * (1.0 + 1e-6 * i))
            return carry + jnp.sum(out[::97, ::29, ::57].astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, 0.0)

    _ = float(loop(params, x))                     # compile + warm
    t0 = time.perf_counter()
    acc = float(loop(params, x))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(acc)
    return dt * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    T = 325
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    ssrn = SSRN(freq_bins=80, output_bins=513, ssrn_dim=256,
                dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.uniform(0.05, 0.95, (B, T, 80)), jnp.float32)
    params = jax.jit(ssrn.init)(jax.random.PRNGKey(0), mel[:2])

    y_bf = jax.jit(ssrn.apply)(params, mel[:8])
    y_i8 = jax.jit(int8_ssrn)(params, mel[:8])
    err = float(jnp.max(jnp.abs(y_bf.astype(jnp.float32)
                                - y_i8.astype(jnp.float32))))
    print(f"output maxabs err int8 vs bf16 module: {err:.5f}", flush=True)

    res = {}
    for name, fn in (("xla_bf16", ssrn.apply), ("int8", int8_ssrn),
                     ("xla_bf16_again", ssrn.apply)):   # ABA order
        ms = chained_ms(fn, params, mel)
        res[name] = round(ms, 2)
        print(f"{name:16s} {ms:9.1f} ms", flush=True)

    art = json.load(open(OUT)) if os.path.isfile(OUT) else {}
    speedup = res["xla_bf16"] / res["int8"]
    art["module_ab_int8"] = {
        "what": f"FULL SSRN forward (B={B}, T={T}->_{4*T}) — every matmul "
                "int8 (dynamic per-tensor act scales, per-channel weight "
                "scales) vs the bf16 XLA module, chained-timed ABA",
        "results_ms": res,
        "output_maxabs_err": round(err, 5),
        "int8_speedup_x": round(speedup, 3),
        "conclusion": ("int8 module-wide "
                       + ("WINS" if speedup > 1.05 else
                          "does not beat bf16")
                       + f" ({res['int8']} vs {res['xla_bf16']} ms)"),
    }
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art["module_ab_int8"], indent=1), flush=True)


if __name__ == "__main__":
    main()
