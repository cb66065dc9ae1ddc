#!/usr/bin/env python
"""Griffin-Lim init experiment: can an SPSI-style instantaneous-frequency
init (jaxdsp.gl_spsi_angles) reach the production advance-24 spectral
convergence in fewer iterations?

Runs on CPU (exact f32 XLA GL, fft path). Distributions: the three
parity_tpu synthetic ones plus a real-audio one (toy-corpus sentences
through the production feature chain: preemph -> |STFT| -> max-norm ->
power 1.3, the non-log GL input of infer/synthesize.py).

Usage: PYTHONPATH=/root/repo python scripts/exp_gl_init.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb
if _xb.backends_are_initialized():
    _xb._clear_backends()

import jax.numpy as jnp

from spoofsv_tpu.dsp import jaxdsp

N_FFT, HOP = 1024, 256


def mag_distributions(B, T, F, rng):
    # mirror scripts/parity_tpu.py
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    for ax, k in ((1, 9), (2, 15)):
        ker = np.ones(k) / k
        x = np.apply_along_axis(lambda v: np.convolve(v, ker, "same"), ax, x)
    speech = np.abs(x) + 0.05
    white = rng.uniform(0.05, 1.0, size=(B, T, F)).astype(np.float32)
    harm = np.full((B, T, F), 0.02, np.float32)
    for b in range(B):
        f0 = rng.integers(4, 12)
        for h in range(1, F // f0):
            harm[b, :, h * f0] = 1.0 / np.sqrt(h)
    harm *= (0.5 + 0.5 * np.sin(np.linspace(0, 6, T)))[None, :, None]
    return {"speech_like": speech, "white": white, "harmonic": harm}


def real_audio_mags(B, T, rng):
    from spoofsv_tpu.data.toy import synth_sentence, random_sentence
    sr = 22050
    n_samp = (T - 1) * HOP
    mags = []
    for b in range(B):
        text = random_sentence(rng, min_chars=60, max_chars=80)
        h = [0.5 / (k + 1) * float(rng.uniform(0.5, 1.5)) for k in range(6)]
        y = synth_sentence(text, sr, 1.0 + 0.1 * b, rng, harmonics=h)
        while len(y) < n_samp + 1:
            y = np.concatenate([y, y])
        y = y[: n_samp + 1].astype(np.float32)
        y = np.append(y[0], y[1:] - 0.97 * y[:-1])  # preemphasis
        re, im = jaxdsp.stft_ri(jnp.asarray(y)[None], N_FFT, HOP,
                                use_matmul=False)
        m = np.asarray(jnp.sqrt(re * re + im * im))[0]
        m = m / max(m.max(), 1e-8)
        mags.append(m[:T] ** 1.3)
    return np.stack(mags)


def spectral_convergence(audio, mag):
    re, im = jaxdsp.stft_ri(audio, N_FFT, HOP, use_matmul=False)
    s = jnp.sqrt(re * re + im * im)
    m = mag[:, : s.shape[1], :]
    s = s[:, : m.shape[1], :]
    num = jnp.linalg.norm((s - m).reshape(s.shape[0], -1), axis=1)
    den = jnp.linalg.norm(m.reshape(m.shape[0], -1), axis=1)
    return float(jnp.mean(num / jnp.maximum(den, 1e-9)))


def run_gl(mag, n_iter, init):
    key = jax.random.PRNGKey(0)
    B, T, F = mag.shape
    ia = None
    if init == "advance":
        a_re, a_im = jaxdsp.gl_advance_angles(T, F, N_FFT, HOP)
        ia = (jnp.broadcast_to(a_re, mag.shape),
              jnp.broadcast_to(a_im, mag.shape))
    elif init.startswith("spsi"):
        lock = float(init.split(":")[1]) if ":" in init else 1.0
        ia = jaxdsp.gl_spsi_angles(jnp.asarray(mag), N_FFT, HOP, lock=lock)
    audio = jaxdsp.griffin_lim(jnp.asarray(mag), key, N_FFT, HOP, N_FFT,
                               n_iter=n_iter,
                               precision=jax.lax.Precision.HIGHEST,
                               init_angles=ia)
    return spectral_convergence(audio, jnp.asarray(mag))


def main():
    rng = np.random.default_rng(0)
    B, T, F = 6, 400, 513
    dists = mag_distributions(B, T, F, rng)
    dists["real_audio"] = real_audio_mags(B, T, np.random.default_rng(1))

    inits = ["advance", "spsi:1", "spsi:0", "spsi:-1"]
    iters = [0, 4, 8, 12, 16, 24, 32]
    out = {}
    for dname, mag in dists.items():
        out[dname] = {}
        # reference: random-64 (the reference's librosa call)
        out[dname]["random@64"] = run_gl(mag, 64, "random")
        for init in inits:
            for it in iters:
                sc = run_gl(mag, it, init)
                out[dname][f"{init}@{it}"] = sc
        print(dname, json.dumps(out[dname], indent=1), flush=True)
    with open("/tmp/exp_gl_init.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
