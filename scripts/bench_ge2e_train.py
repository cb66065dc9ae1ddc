#!/usr/bin/env python
"""GE2E training-step throughput (fwd+bwd through the 3-layer LSTM + loss).

Reference regime: N=6 speakers x M=50 utterances of 120-frame crops per step
(GE2E/config/config.yaml:26-34); the reference's own hot loop is bottlenecked
by O(N^2 M) pure-Python loss loops on CPU (GE2E/utils.py:36-55).
Fetch-amortized over K chained steps.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _benchlib import setup_cache as _setup_cache
_setup_cache()

from spoofsv_tpu.config import GE2EConfig  # noqa: E402
from spoofsv_tpu.models import GE2ELoss, SpeechEmbedder  # noqa: E402
from spoofsv_tpu.spoofkit.ge2e_harness import make_ge2e_train_step  # noqa: E402

K = 20


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    ge2e = GE2EConfig()
    for n_spk, m_utt in [(6, 50), (16, 50)]:
        emb = SpeechEmbedder(hidden=768, num_layers=3, proj=256,
                             dtype=jnp.bfloat16)
        init_fn, step_fn = make_ge2e_train_step(emb, GE2ELoss(), lr=0.01)
        rng = np.random.default_rng(0)
        batch = jnp.asarray(rng.normal(size=(n_spk, m_utt, 120, 40)),
                            jnp.float32)
        params, opt_state = init_fn(jax.random.PRNGKey(0), batch)
        # two warmup steps: the first compile specializes to host-uploaded
        # inputs, the second to device-resident chained inputs
        for _ in range(2):
            params, opt_state, loss = step_fn(params, opt_state, batch)
            _ = float(loss)
        t0 = time.perf_counter()
        lf = 0.0
        for _ in range(K):
            params, opt_state, loss = step_fn(params, opt_state, batch)
            lf = float(loss)   # per-step fetch: robust through the tunnel
        dt = (time.perf_counter() - t0) / K
        utts = n_spk * m_utt
        print(f"N={n_spk} M={m_utt}: {dt*1e3:7.1f} ms/step "
              f"({utts/dt:7.0f} utts/s) loss={lf:.3f}", flush=True)


if __name__ == "__main__":
    main()
