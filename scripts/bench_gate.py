#!/usr/bin/env python
"""Highway-gate implementation comparison on the live TPU.

Times whole-model forwards (SSRN at the headline synthesis batch; teacher-
forced Text2Mel at a training batch) under ``gate_impl="xla"`` (plain jnp,
XLA-fused) vs ``"pallas"`` (ops/pallas_ops.fused_highway_gate — one VMEM
pass). Decides the ``cfg.tpu.highway_gate_impl`` default.

Run alone — the tunnel serializes clients: ``python scripts/bench_gate.py``.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from scripts._benchlib import setup_cache  # noqa: E402

setup_cache()

from spoofsv_tpu.config import Config  # noqa: E402
from spoofsv_tpu.models import MelSyn, SSRN  # noqa: E402
from spoofsv_tpu.models import layers  # noqa: E402
from spoofsv_tpu.train.steps import shift_right  # noqa: E402


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _ = float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(out)[0][..., ::97])))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(reps):
        out = fn(*args)
        acc += float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(out)[0][..., ::97])))
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(acc)
    print(f"{name:34s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    cfg = Config()
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    # ---- SSRN at the headline synthesis batch (B=768, T=325 coarse) ----
    ssrn = SSRN(freq_bins=cfg.mel.freq_bins, output_bins=cfg.lin_bins,
                ssrn_dim=cfg.ssrn_dim, dtype=dtype)
    B, T = (int(sys.argv[1]) if len(sys.argv) > 1 else 768), 325
    mel = jnp.asarray(rng.uniform(0.05, 0.95, (B, T, cfg.mel.freq_bins)),
                      jnp.float32)
    p2 = jax.jit(ssrn.init)(jax.random.PRNGKey(0), mel[:, :8])

    # ---- teacher-forced Text2Mel at a training batch ----
    melsyn = MelSyn(vocab_len=cfg.vocab_len, condition=True,
                    spk_emb_dim=cfg.spk_emb_dim, text_emb_dim=cfg.text_emb_dim,
                    freq_bins=cfg.mel.freq_bins, hidden_dim=cfg.hidden_dim,
                    dtype=dtype)
    Bt, Tt, N = 64, 200, 100
    text = jnp.asarray(rng.integers(1, cfg.vocab_len - 1, (Bt, N)), jnp.int32)
    spk = jnp.asarray(rng.normal(size=(Bt, cfg.spk_emb_dim)), jnp.float32)
    melt = jnp.asarray(rng.uniform(0.05, 0.95, (Bt, Tt, cfg.mel.freq_bins)),
                       jnp.float32)
    p1 = jax.jit(melsyn.init)(jax.random.PRNGKey(0), shift_right(melt), text, spk)

    results = {}
    for impl in ("xla", "pallas"):
        layers.set_default_gate_impl(impl)
        # fresh jits per impl (the flag is read at trace time)
        ssrn_fwd = jax.jit(lambda p, m: ssrn.apply(p, m))
        t2m_fwd = jax.jit(
            lambda p, m, tx, s: melsyn.apply(p, shift_right(m), tx, s))
        results[f"ssrn_{impl}"] = timeit(f"SSRN fwd B={B} [{impl}]",
                                         ssrn_fwd, p2, mel)
        results[f"t2m_{impl}"] = timeit(f"Text2Mel TF fwd B={Bt} [{impl}]",
                                        t2m_fwd, p1, melt, text, spk)
    layers.set_default_gate_impl("xla")
    for net in ("ssrn", "t2m"):
        x, p = results[f"{net}_xla"], results[f"{net}_pallas"]
        print(f"{net}: pallas/xla = {p / x:.3f}")


if __name__ == "__main__":
    main()
