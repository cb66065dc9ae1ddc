#!/usr/bin/env python
"""GE2E training-step throughput (fwd+bwd through the 3-layer LSTM + loss).

Reference regime: N=6 speakers x M=50 utterances of 120-frame crops per step
(GE2E/config/config.yaml:26-34); the reference's own hot loop is bottlenecked
by O(N^2 M) pure-Python loss loops on CPU (GE2E/utils.py:36-55).
Fetch-amortized over K chained steps.
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


def bench_loop():
    """Full training-loop comparison at reference dims (N=6, M=50, 120x40
    crops): host SpeakerBatcher + per-step float(loss) fetch (the round-2
    campaign loop, ~0.53 s/step through the tunnel) vs DeviceSpeakerBank +
    donated buffers + amortized loss fetch."""
    import tempfile

    from spoofsv_tpu.models import GE2ELoss, SpeechEmbedder
    from spoofsv_tpu.spoofkit.ge2e_harness import (DeviceSpeakerBank,
                                                   SpeakerBatcher,
                                                   make_ge2e_train_step)

    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    n_spk, m_utt, n_speakers_total, crops = 6, 50, 40, 120
    rng = np.random.default_rng(0)
    tisv = tempfile.mkdtemp(prefix="ge2e_bench_tisv_")
    for s in range(n_speakers_total):
        np.save(f"{tisv}/speaker{s}.npy",
                rng.normal(size=(crops, 40, 120)).astype(np.float32))

    emb = SpeechEmbedder(hidden=768, num_layers=3, proj=256)
    steps = 40
    results = {}
    # device phase FIRST: running it after the host phase's 40 sync fetches
    # inflates its measurement 93->290 ms/step through the tunnel (residual
    # client state) — another instance of the tunnel measurement traps
    for tag in ("device", "host"):
        device_data = tag == "device"
        init_fn, step_fn = make_ge2e_train_step(
            emb, GE2ELoss(), lr=0.01, n_speakers=n_spk, donate=device_data)
        if device_data:
            batcher = DeviceSpeakerBank(tisv, m_utt, seed=0)
        else:
            batcher = SpeakerBatcher(tisv, m_utt, shuffle=True, seed=0)
        b0 = np.asarray(batcher.sample_batch(n_spk)).reshape(
            n_spk, m_utt, 120, 40)
        params, opt_state = init_fn(jax.random.PRNGKey(0), b0)
        # warm up twice (compile + device-chain respecialization)
        for _ in range(2):
            batch = batcher.sample_batch(n_spk)
            if not device_data:
                batch = jnp.asarray(batch)
            params, opt_state, loss = step_fn(params, opt_state, batch)
            _ = float(loss)
        t0 = time.perf_counter()
        pending = []
        for i in range(steps):
            batch = batcher.sample_batch(n_spk)
            if not device_data:
                batch = jnp.asarray(batch)
            params, opt_state, loss = step_fn(params, opt_state, batch)
            if device_data:
                pending.append(loss)
                if (i + 1) % 30 == 0:      # log_interval cadence
                    _ = np.asarray(jnp.stack(pending)); pending = []
            else:
                _ = float(loss)            # the reference's per-step fetch
        if pending:
            _ = np.asarray(jnp.stack(pending))
        dt = (time.perf_counter() - t0) / steps
        results[tag] = dt
        print(f"{tag:6s}: {dt*1e3:7.1f} ms/step", flush=True)
    print(f"speedup: {results['host']/results['device']:.2f}x", flush=True)


if __name__ == "__main__":
    if "--loop" in sys.argv:
        bench_loop()
    else:
        main()
