"""Shared setup for the bench scripts: compile cache + fetch-forced timing."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def setup_cache() -> None:
    """Persistent XLA compile cache (remote-TPU compiles take minutes)."""
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/spoofsv_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(name: str, fn, *args, reps: int = 3):
    """Time fn with a real data fetch per rep (block_until_ready through the
    remote tunnel can return early; only fetches are trustworthy barriers)."""
    out = fn(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(jnp.abs(first[..., ::173].astype(jnp.float32))))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(reps):
        out = fn(*args)
        first = jax.tree_util.tree_leaves(out)[0]
        acc += float(jnp.sum(jnp.abs(first[..., ::173].astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(acc)
    print(f"{name:34s} {dt * 1e3:9.2f} ms", flush=True)
    return out, dt


def find_campaign_ckpt(root: str, prefix: str,
                       adversarial: bool = False) -> str:
    """Resolve a campaign checkpoint dir (best_model, else latest
    iteration) — the one place that encodes the campaign trainer's
    checkpoint layout (scripts/campaign.py::_ckpt)."""
    import glob
    import sys

    base = os.path.join(root, "checkpoints", "conditional",
                        "adversarial" if adversarial else "not_adversarial",
                        "campaign" + ("_adv" if adversarial else ""))
    best = os.path.join(base, f"{prefix}_best_model")
    if os.path.isdir(best):
        return best
    dirs = [p for p in glob.glob(os.path.join(base, f"{prefix}_iteration_*"))
            if os.path.isdir(p)]
    if not dirs:
        sys.exit(f"[_benchlib] no {prefix} checkpoint under {base} — "
                 "run the campaign's training stages first")
    return max(dirs, key=lambda p: int(p.rsplit("_", 1)[-1]))
