#!/usr/bin/env python
"""Microbenchmark of the Griffin-Lim components on the live TPU.

Times each stage of the GL iteration separately (fetch-forced — the tunnel's
block_until_ready is unreliable) to locate where the 19 ms/iter goes and size
the fused-kernel opportunity (docs/NEXT.md item 1).

Run alone (no concurrent jax processes): ``python scripts/bench_gl_breakdown.py``.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _benchlib import setup_cache as _setup_cache
_setup_cache()

from spoofsv_tpu.dsp import jaxdsp  # noqa: E402

B, T, NFFT, HOP, F = 128, 1300, 1024, 256, 513
PREC = jax.lax.Precision.DEFAULT


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    _ = float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(out)[0][..., ::173])))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        out = fn(*args)
        acc += float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(out)[0][..., ::173])))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(acc)
    print(f"{name:34s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    mag = jnp.asarray(rng.uniform(0.0, 1.0, (B, T, F)), jnp.float32)
    re = jnp.asarray(rng.normal(size=(B, T, F)), jnp.float32)
    im = jnp.asarray(rng.normal(size=(B, T, F)), jnp.float32)
    frames = jnp.asarray(rng.normal(size=(B, T, NFFT)), jnp.bfloat16)
    sig = jnp.asarray(rng.normal(size=(B, HOP * (T - 1))), jnp.float32)
    key = jax.random.PRNGKey(0)

    gl = functools.partial(jaxdsp.griffin_lim, n_fft=NFFT, hop_length=HOP,
                           win_length=NFFT, use_matmul=True, precision=PREC)
    t64 = timeit("griffin_lim n_iter=64", lambda m, k: gl(m, k, n_iter=64), mag, key)
    t8 = timeit("griffin_lim n_iter=8", lambda m, k: gl(m, k, n_iter=8), mag, key)
    per_iter = (t64 - t8) / 56.0
    print(f"{'-> per-iteration slope':34s} {per_iter * 1e3:9.2f} ms", flush=True)

    irfft = jax.jit(lambda r, i: jaxdsp.irfft_ri(r, i, NFFT, True, PREC, jnp.bfloat16))
    timeit("irfft matmul (B,T,513)->frames", irfft, re, im)

    rfft = jax.jit(lambda f: jaxdsp.rfft_ri(f, NFFT, True, PREC))
    timeit("rfft matmul frames->(B,T,513)", rfft, frames)

    ola = jax.jit(lambda f: jaxdsp._overlap_add(f.astype(jnp.float32), HOP))
    timeit("overlap_add frames->sig", ola, frames)

    fr = jax.jit(lambda y: jaxdsp.frame_signal(y, NFFT, HOP))
    timeit("frame_signal sig->frames", fr, jnp.pad(sig, ((0, 0), (NFFT // 2, NFFT // 2))))

    istft = jax.jit(lambda r, i: jaxdsp.istft_ri(r, i, NFFT, HOP, NFFT,
                                                 use_matmul=True, precision=PREC,
                                                 frames_dtype=jnp.bfloat16))
    timeit("istft_ri full", istft, re, im)

    stft = jax.jit(lambda y: jaxdsp.stft_ri(y, NFFT, HOP, NFFT, use_matmul=True,
                                            precision=PREC))
    timeit("stft_ri full", stft, sig)

    @jax.jit
    def proj(reb_re, reb_im, tp_re, tp_im):
        a_re = reb_re - 0.497487 * tp_re
        a_im = reb_im - 0.497487 * tp_im
        n = jnp.sqrt(a_re * a_re + a_im * a_im) + 1e-16
        return a_re / n, a_im / n

    timeit("momentum+normalize", proj, re, im, re, im)

    @jax.jit
    def one_iter(ang_re, ang_im, tp_re, tp_im):
        inv = jaxdsp.istft_ri(mag * ang_re, mag * ang_im, NFFT, HOP, NFFT,
                              use_matmul=True, precision=PREC,
                              frames_dtype=jnp.bfloat16)
        rr, ri_ = jaxdsp.stft_ri(inv, NFFT, HOP, NFFT, use_matmul=True,
                                 precision=PREC)
        a_re = rr - 0.497487 * tp_re
        a_im = ri_ - 0.497487 * tp_im
        n = jnp.sqrt(a_re * a_re + a_im * a_im) + 1e-16
        return a_re / n, a_im / n, rr, ri_

    timeit("one full iteration (jit alone)", one_iter, re, im, re, im)


if __name__ == "__main__":
    main()
