#!/usr/bin/env python
"""Fused Pallas Griffin-Lim vs XLA Griffin-Lim on the live TPU.

Compares wall time and spectral-convergence quality at bench shapes
(B=128, T=1300, 64 iterations). Run alone — the tunnel serializes clients.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _benchlib import setup_cache as _setup_cache
_setup_cache()

from spoofsv_tpu.dsp import jaxdsp  # noqa: E402
from spoofsv_tpu.ops.pallas_gl import griffin_lim_fused  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
T, NFFT, HOP = 1300, 1024, 256
ITERS = 64


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    _ = float(jnp.sum(jnp.abs(out[..., ::997])))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(reps):
        out = fn(*args)
        acc += float(jnp.sum(jnp.abs(out[..., ::997])))
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(acc)
    print(f"{name:28s} {dt * 1e3:9.1f} ms", flush=True)
    return out, dt


def spectral_err(audio, mag):
    re, im = jaxdsp.stft_ri(audio, NFFT, HOP, NFFT, use_matmul=True,
                            precision=jax.lax.Precision.HIGHEST)
    got = jnp.sqrt(re ** 2 + im ** 2)[:, :T, :]
    return float(jnp.linalg.norm(got - mag) / jnp.linalg.norm(mag))


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    # harmonic test signal -> realistic mag
    L = HOP * (T - 1)
    t = np.arange(L) / 22050.0
    sigs = []
    for b in range(min(B, 8)):
        f0 = 110.0 * (1 + b % 8)
        y = sum(np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6)) / k
                for k in range(1, 6))
        sigs.append(y + 0.05 * rng.normal(size=L))
    y = jnp.asarray(np.stack(sigs * (B // len(sigs) + 1))[:B], jnp.float32)
    re, im = jaxdsp.stft_ri(y, NFFT, HOP, NFFT, use_matmul=True,
                            precision=jax.lax.Precision.HIGHEST)
    mag = jnp.sqrt(re ** 2 + im ** 2)[:, :T, :]
    key = jax.random.PRNGKey(0)

    xla = jax.jit(lambda m, k: jaxdsp.griffin_lim(
        m, k, NFFT, HOP, NFFT, n_iter=ITERS, use_matmul=True,
        precision=jax.lax.Precision.DEFAULT))
    a_x, dt_x = timeit("xla griffin_lim", xla, mag, key)

    fused = jax.jit(lambda m, k: griffin_lim_fused(
        m, k, NFFT, HOP, NFFT, n_iter=ITERS))
    a_f, dt_f = timeit("fused pallas griffin_lim", fused, mag, key)

    fused8 = jax.jit(lambda m, k: griffin_lim_fused(
        m, k, NFFT, HOP, NFFT, n_iter=ITERS, int8_fwd=True))
    a_8, dt_8 = timeit("fused pallas GL (int8 DFT)", fused8, mag, key)

    print(f"speedup: {dt_x / dt_f:.2f}x (bf16) {dt_x / dt_8:.2f}x (int8)",
          flush=True)
    print("spectral err xla  :", spectral_err(a_x, mag), flush=True)
    print("spectral err fused:", spectral_err(a_f, mag), flush=True)
    print("spectral err int8 :", spectral_err(a_8, mag), flush=True)


if __name__ == "__main__":
    main()
