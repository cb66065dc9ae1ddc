#!/usr/bin/env python
"""AR-decode throughput vs scan unroll at bench shapes (B=128, 325 frames)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _benchlib import setup_cache as _setup_cache
_setup_cache()

from spoofsv_tpu.config import Config  # noqa: E402
from spoofsv_tpu.infer.decode import make_decoder  # noqa: E402
from spoofsv_tpu.models import MelSyn  # noqa: E402
from spoofsv_tpu.train.steps import shift_right  # noqa: E402


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    cfg = Config()
    B = 128
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, cfg.vocab_len - 1, (B, 100)), jnp.int32)
    spk = jnp.asarray(rng.normal(size=(B, cfg.spk_emb_dim)), jnp.float32)
    mel0 = jnp.asarray(rng.uniform(0.05, 0.95, (B, 8, 80)), jnp.float32)
    m = MelSyn(vocab_len=cfg.vocab_len, condition=True,
               spk_emb_dim=cfg.spk_emb_dim, text_emb_dim=cfg.text_emb_dim,
               freq_bins=80, hidden_dim=cfg.hidden_dim, dtype=jnp.bfloat16)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), shift_right(mel0), text, spk)

    unrolls = [int(x) for x in sys.argv[1:]] or [1, 4, 8, 16]
    for u in unrolls:
        dec = make_decoder(m, cfg.max_frame_num, unroll=u)
        y, a, _ = dec(params, text, spk)
        _ = float(jnp.sum(jnp.abs(y[:, ::7, :])))
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(3):
            y, a, _ = dec(params, text + 0 * i, spk)
            acc += float(jnp.sum(jnp.abs(y[:, ::7, :])))
        dt = (time.perf_counter() - t0) / 3
        assert np.isfinite(acc)
        print(f"unroll={u:3d}: {dt*1e3:7.1f} ms  ({B*325/dt:,.0f} frames/s)",
              flush=True)


if __name__ == "__main__":
    main()
