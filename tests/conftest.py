"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere (SURVEY.md §4:
multi-device logic is tested with a forced host-platform device count).
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (single real TPU chip),
# but the test suite runs on a virtual 8-device CPU mesh by design.
if not os.environ.get("SPOOFSV_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: XLA compiles dominate suite wall time on CPU.
# Platform-suffixed dir: entries written under the TPU-site env carry different
# CPU feature flags and spam AOT-mismatch warnings when reloaded.
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/spoofsv_jax_cache_" + ("cpu" if not os.environ.get(
                      "SPOOFSV_TEST_TPU") else "tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

if not os.environ.get("SPOOFSV_TEST_TPU"):
    # The TPU-tunnel site hook force-sets jax_platforms="axon,cpu" at its
    # registration time, trumping the env var — pin the config explicitly and
    # drop any already-initialized backends so tests stay on the CPU mesh.
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb  # noqa: E402

    if _xb.backends_are_initialized():  # pragma: no cover - site-hook dependent
        _xb._clear_backends()
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert jax.device_count() >= 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_cfg():
    """A miniature Config for fast CPU tests (same structure, smaller dims)."""
    from spoofsv_tpu.config import Config

    cfg = Config()
    return cfg.replace(
        hidden_dim=32,
        text_emb_dim=16,
        ssrn_dim=24,
        disc_dim=16,
        spk_emb_dim=20,
        max_text_len=30,
        max_frame_num=24,
    )
