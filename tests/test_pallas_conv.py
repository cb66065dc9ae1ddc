"""Parity tests for the fused highway-conv kernel (ops/pallas_conv.py).

Interpret-mode on CPU (the compiled-kernel evidence lives in
docs/SSRN_PROFILE.json + docs/PARITY_TPU.json, written on the live chip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spoofsv_tpu.ops.pallas_conv import (fused_highway_conv,
                                         fused_highway_conv_ad,
                                         highway_conv_reference)


def _params(rng, C, K=3):
    w = jnp.asarray(rng.normal(size=(K, C, 2 * C)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(2 * C,)) * 0.1, jnp.float32)
    s1, b1, s2, b2 = (jnp.asarray(rng.normal(size=(C,)) * 0.2 + 1.0,
                                  jnp.float32) for _ in range(4))
    return w, b, s1, b1, s2, b2


@pytest.mark.parametrize("T,dil,causal", [
    (37, 1, False),    # ragged tail, SAME
    (37, 3, False),    # dilated SAME
    (64, 1, True),     # causal, block-divisible
    (300, 3, True),    # causal dilated, multi-block ragged
    (8, 1, False),     # shorter than one block
])
def test_fused_matches_reference(T, dil, causal):
    rng = np.random.default_rng(0)
    B, C = 2, 64
    x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    w, b, s1, b1, s2, b2 = _params(rng, C)
    y = fused_highway_conv(x, w, b, s1, b1, s2, b2, dilation=dil,
                           causal=causal, block_t=32)
    yr = highway_conv_reference(x, w, b, s1, b1, s2, b2, dilation=dil,
                                causal=causal)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               atol=2e-5, rtol=1e-5)


def test_k1_pointwise():
    """K=1 degenerates to a 1x1 conv — no halo at all."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 17, 64)), jnp.float32)
    w, b, s1, b1, s2, b2 = _params(rng, 64, K=1)
    y = fused_highway_conv(x, w, b, s1, b1, s2, b2, block_t=32)
    yr = highway_conv_reference(x, w, b, s1, b1, s2, b2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               atol=2e-5, rtol=1e-5)


def test_matches_flax_highway_conv():
    """End-to-end vs the actual flax module (same param pytree)."""
    from spoofsv_tpu.models.layers import HighwayConv

    rng = np.random.default_rng(2)
    B, T, C = 2, 50, 64
    x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    for dil, causal in [(1, False), (3, False), (1, True), (3, True)]:
        m = HighwayConv(C, 3, dil, causal)
        p = m.init(jax.random.PRNGKey(0), x)
        y_ref = m.apply(p, x)
        pp = p["params"]
        y = fused_highway_conv(
            x, pp["conv"]["kernel"], pp["conv"]["bias"],
            pp["ln1"]["scale"], pp["ln1"]["bias"],
            pp["ln2"]["scale"], pp["ln2"]["bias"],
            dilation=dil, causal=causal, block_t=32)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=3e-5, rtol=1e-5,
                                   err_msg=f"dil={dil} causal={causal}")


def test_custom_vjp_grads_match():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 37, 64)), jnp.float32)
    w, b, s1, b1, s2, b2 = _params(rng, 64)

    g_fused = jax.grad(lambda *a: jnp.sum(
        fused_highway_conv_ad(*a, 3, False) ** 2))(x, w, b, s1, b1, s2, b2)
    g_ref = jax.grad(lambda *a: jnp.sum(
        highway_conv_reference(*a, dilation=3) ** 2))(x, w, b, s1, b1, s2, b2)
    for a, bb in zip(jax.tree_util.tree_leaves(g_fused),
                     jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-4, rtol=1e-4)
