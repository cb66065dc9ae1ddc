#!/usr/bin/env python
"""Per-stage share of the headline synthesis pipeline on the live TPU.

Times the three jitted stages separately (fetch-forced) at the headline
batch: AR decode (fused Pallas), SSRN, and the vocoder (renorm + fused
Griffin-Lim + de-emphasis), plus the single fused full-pipeline program the
bench actually runs. Stage times measured in isolation necessarily serialize
work the fused program can overlap, so shares are an upper bound on each
stage's cost.

Run alone — the tunnel serializes clients: ``python scripts/bench_pipeline_shares.py [B]``.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from _benchlib import setup_cache as _setup_cache
_setup_cache()

from spoofsv_tpu.config import Config  # noqa: E402
from spoofsv_tpu.infer.synthesize import Synthesizer  # noqa: E402
from spoofsv_tpu.models import MelSyn, SSRN  # noqa: E402
from spoofsv_tpu.train.steps import shift_right  # noqa: E402


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    _ = float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(out)[0][..., ::997])))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(reps):
        out = fn(*args)
        acc += float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(out)[0][..., ::997])))
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(acc)
    print(f"{name:26s} {dt * 1e3:9.1f} ms", flush=True)
    return out, dt


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    cfg = Config()
    dtype = jnp.bfloat16
    melsyn = MelSyn(vocab_len=cfg.vocab_len, condition=True,
                    spk_emb_dim=cfg.spk_emb_dim, text_emb_dim=cfg.text_emb_dim,
                    freq_bins=cfg.mel.freq_bins, hidden_dim=cfg.hidden_dim,
                    dtype=dtype)
    ssrn = SSRN(freq_bins=cfg.mel.freq_bins, output_bins=cfg.lin_bins,
                ssrn_dim=cfg.ssrn_dim, dtype=dtype)

    rng = np.random.default_rng(0)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    N, T = 100, cfg.max_frame_num
    text = jnp.asarray(rng.integers(1, cfg.vocab_len - 1, (B, N)), jnp.int32)
    spk = jnp.asarray(rng.normal(size=(B, cfg.spk_emb_dim)), jnp.float32)
    mel_ex = jnp.asarray(rng.uniform(0.05, 0.95, (B, 8, cfg.mel.freq_bins)),
                         jnp.float32)
    key = jax.random.PRNGKey(0)
    p1 = jax.jit(melsyn.init)(key, shift_right(mel_ex), text, spk)
    p2 = jax.jit(ssrn.init)(key, mel_ex)

    syn = Synthesizer(cfg, melsyn, ssrn, p1, p2, n_frames=T,
                      gl_iters=cfg.tpu.griffin_lim_iters)

    decode = jax.jit(lambda t, s: syn.decode(syn.melsyn_params, t, s))
    (mel, attn, _), t_dec = timeit("decode (fused pallas)", decode, text, spk)
    ssrn_fn = jax.jit(lambda m: ssrn.apply(syn.ssrn_params, m))
    lin, t_ssrn = timeit("ssrn", ssrn_fn, mel)
    _, t_voc = timeit("vocoder (renorm+GL+deemph)", syn.vocode, lin,
                      jax.random.PRNGKey(1))
    _, t_full = timeit("full fused pipeline", syn, text, spk,
                       jax.random.PRNGKey(1))
    ssum = t_dec + t_ssrn + t_voc
    print(f"\nB={B}: sum of stages {ssum*1e3:.1f} ms vs fused {t_full*1e3:.1f} ms"
          f" (overlap/dispatch saving {100*(1-t_full/ssum):.1f}%)")
    for nm, t in (("decode", t_dec), ("ssrn", t_ssrn), ("vocoder", t_voc)):
        print(f"  {nm:8s} {100*t/ssum:5.1f}% of stage-sum")


if __name__ == "__main__":
    main()
