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


def test_ssrn_fused_conv_impl_matches_xla():
    """Process-wide fused_conv switch (what the inference CLIs apply via
    apply_runtime_knobs(infer=True)): SSRN forward must match the plain
    path through every highway block, including the Upsample2x ones."""
    from spoofsv_tpu.models.layers import set_default_gate_impl
    from spoofsv_tpu.models.ssrn import SSRN

    rng = np.random.default_rng(4)
    mel = jnp.asarray(rng.uniform(0.05, 0.95, (2, 24, 80)), jnp.float32)
    m = SSRN(freq_bins=80, output_bins=129, ssrn_dim=64)
    p = m.init(jax.random.PRNGKey(0), mel)
    y_xla = m.apply(p, mel)
    set_default_gate_impl("fused_conv")
    try:
        y_fused = m.apply(p, mel)
    finally:
        set_default_gate_impl("xla")
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_xla),
                               atol=3e-5, rtol=1e-5)


def test_text2mel_fused_conv_impl_matches_xla():
    """Teacher-forced Text2Mel forward under the fused_conv switch: covers
    the causal highway stacks (dilations 1/3/9/27) and the K=1 blocks; the
    tiny T exercises the pad>min(block,T) fallback for dil-27 blocks."""
    from spoofsv_tpu.models.layers import set_default_gate_impl
    from spoofsv_tpu.models.text2mel import MelSyn
    from spoofsv_tpu.train.steps import shift_right

    rng = np.random.default_rng(5)
    B, N, T = 2, 12, 16
    text = jnp.asarray(rng.integers(1, 30, (B, N)), jnp.int32)
    spk = jnp.asarray(rng.normal(size=(B, 200)), jnp.float32)
    mel = jnp.asarray(rng.uniform(0.05, 0.95, (B, T, 80)), jnp.float32)
    m = MelSyn(vocab_len=34, condition=True, spk_emb_dim=200,
               text_emb_dim=32, freq_bins=80, hidden_dim=64)
    p = m.init(jax.random.PRNGKey(0), shift_right(mel), text, spk)
    out_xla = m.apply(p, shift_right(mel), text, spk)
    set_default_gate_impl("fused_conv")
    try:
        out_fused = m.apply(p, shift_right(mel), text, spk)
    finally:
        set_default_gate_impl("xla")
    for a, b in zip(jax.tree_util.tree_leaves(out_fused),
                    jax.tree_util.tree_leaves(out_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-5)
