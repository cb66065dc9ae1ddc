#!/usr/bin/env python
"""True device-side training-step throughput (fetch-amortized).

Chains K steps back-to-back with donated state and fetches one scalar at the
end, so the remote-tunnel roundtrip (~35 ms) is paid once per K steps instead
of once per step. Reports ordinary + WGAN-GP G/D steps at several batch sizes.
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

from spoofsv_tpu.config import Config  # noqa: E402
from spoofsv_tpu.models import MelSyn  # noqa: E402
from spoofsv_tpu.models.discriminator import MelDisc  # noqa: E402
from spoofsv_tpu.train.steps import (  # noqa: E402
    make_adversarial_steps,
    make_ordinary_step,
)

T, NTXT = 200, 100
K = 20  # chained steps per fetch


def bench(B: int, dtype, mesh=None):
    cfg = Config().replace(batch_size=B)
    rng = np.random.default_rng(0)
    batch = dict(
        mel=jnp.asarray(rng.uniform(0.05, 0.95, (B, T, 80)), jnp.float32),
        text=jnp.asarray(rng.integers(1, cfg.vocab_len - 1, (B, NTXT)), jnp.int32),
        spk=jnp.asarray(rng.normal(size=(B, cfg.spk_emb_dim)), jnp.float32),
    )
    if mesh is not None:
        from spoofsv_tpu.parallel.mesh import shard_batch
        batch = shard_batch(batch, mesh)
    gen = MelSyn(vocab_len=cfg.vocab_len, condition=True,
                 spk_emb_dim=cfg.spk_emb_dim, text_emb_dim=cfg.text_emb_dim,
                 freq_bins=80, hidden_dim=cfg.hidden_dim, dtype=dtype)
    disc = MelDisc(disc_dim=cfg.disc_dim, dtype=dtype)

    init_fn, step_fn = make_ordinary_step(gen, cfg, "train_text2mel",
                                          donate=False)
    state = init_fn(jax.random.PRNGKey(0), batch)
    if mesh is not None:
        from spoofsv_tpu.parallel.mesh import replicate_tree
        state = replicate_tree(state, mesh)

    def run_chain(step, state, n):
        m = None
        for i in range(n):
            state, m = step(state, batch, jax.random.PRNGKey(i))
        return state, float(m["loss"])

    # warmup/compile
    state, _ = run_chain(step_fn, state, 2)
    t0 = time.perf_counter()
    state, loss = run_chain(step_fn, state, K)
    dt = (time.perf_counter() - t0) / K
    print(f"B={B:4d} {dtype.__name__:9s} ordinary: {dt*1e3:7.1f} ms/step "
          f"({B/dt:7.0f} utts/s) loss={loss:.3f}", flush=True)

    ainit, g_step, d_step = make_adversarial_steps(gen, disc, cfg,
                                                   "train_text2mel",
                                                   donate=False)
    astate = ainit(jax.random.PRNGKey(1), batch)
    if mesh is not None:
        from spoofsv_tpu.parallel.mesh import replicate_tree
        astate = replicate_tree(astate, mesh)
    astate, _ = g_step(astate, batch, jax.random.PRNGKey(0))
    astate, m = d_step(astate, batch, jax.random.PRNGKey(0))
    _ = float(m["wd"])
    t0 = time.perf_counter()
    mg = md = None
    for i in range(K):
        if i % 6 == 0:
            astate, mg = g_step(astate, batch, jax.random.PRNGKey(i))
        else:
            astate, md = d_step(astate, batch, jax.random.PRNGKey(i))
    tot = float(mg["loss"]) + float(md["wd"])
    dt = (time.perf_counter() - t0) / K
    assert np.isfinite(tot)
    print(f"B={B:4d} {dtype.__name__:9s} wgan-gp : {dt*1e3:7.1f} ms/step "
          f"({B/dt:7.0f} utts/s)", flush=True)


def main():
    argv = sys.argv[1:]
    mesh = None
    if "--mesh" in argv:
        i = argv.index("--mesh")
        n = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
        from spoofsv_tpu.parallel.mesh import force_cpu_backend, make_mesh
        # decide from the env var, NOT len(jax.devices()): probing devices
        # initializes the backend before the host-device-count flag can apply
        if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            force_cpu_backend(n)
        mesh = make_mesh(n)
        print(f"mesh: data-parallel over {n} devices "
              f"(per-chip batch = B/{n})", flush=True)
    dtype = jnp.bfloat16
    if "--dtype" in argv:
        i = argv.index("--dtype")
        dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[argv[i + 1]]
        argv = argv[:i] + argv[i + 2:]
    print("backend:", jax.default_backend(), jax.devices()[0],
          "dtype:", dtype.__name__, flush=True)
    sizes = [int(s) for s in argv] or [16, 64, 128]
    for B in sizes:
        bench(B, dtype, mesh=mesh)


if __name__ == "__main__":
    main()
