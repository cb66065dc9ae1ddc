"""Parity tests for the Winograd k=3 conv (ops/winograd.py) vs the direct
conv — the algorithmic arm of the SSRN hot-conv investigation (on-chip
timing evidence lives in docs/SSRN_PROFILE.json's ``winograd`` section)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spoofsv_tpu.ops.pallas_conv import highway_conv_reference
from spoofsv_tpu.ops.winograd import winograd_conv1d_k3, winograd_highway_conv


def _direct(x, w, b, causal):
    inp = jnp.pad(x, ((0, 0), (2, 0), (0, 0))) if causal else x
    return jax.lax.conv_general_dilated(
        inp, w, (1,), "VALID" if causal else "SAME",
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32) + b


@pytest.mark.parametrize("T,causal,m", [
    (37, False, 2), (37, False, 4),    # SAME, ragged tiles, both variants
    (64, True, 2), (300, True, 4),     # causal
    (4, False, 4), (1, True, 2),       # shorter than one tile
])
def test_winograd_matches_direct_conv(T, causal, m):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, T, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 16, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(32,)) * 0.1, jnp.float32)
    got = winograd_conv1d_k3(x, w, b, causal=causal, m=m)
    ref = _direct(x, w, b, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("m", [2, 4])
def test_winograd_highway_block_matches_reference(m):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 50, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 32, 64)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)
    lp = [jnp.asarray(rng.normal(size=(32,)) * 0.2 + 1.0, jnp.float32)
          for _ in range(4)]
    got = winograd_highway_conv(x, w, b, *lp, m=m)
    ref = highway_conv_reference(x, w, b, *lp, dilation=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_winograd_bf16_amplification_bounded():
    """The transform coefficients amplify inputs before the bf16 rounding
    into the MXU (F(4,3) by up to ~5); pin that the bf16-weights path stays
    within a small multiple of the direct bf16 conv's own error so the
    on-chip A/B compares like against like."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 128, 64)), jnp.float32)
    wf = jnp.asarray(rng.normal(size=(3, 64, 128)) * 0.1, jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    exact = _direct(x, wf, b, causal=False)
    direct_bf16 = _direct(x.astype(jnp.bfloat16),
                          wf.astype(jnp.bfloat16), b, causal=False)
    err_direct = float(jnp.abs(direct_bf16 - exact).max())
    for m in (2, 4):
        wino_bf16 = winograd_conv1d_k3(x, wf.astype(jnp.bfloat16), b, m=m)
        err_wino = float(jnp.abs(wino_bf16 - exact).max())
        assert err_wino < 8.0 * max(err_direct, 1e-6), \
            (m, err_wino, err_direct)
