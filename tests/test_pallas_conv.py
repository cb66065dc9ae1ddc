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
                                         fused_highway_conv_pair,
                                         fused_highway_conv_pair_ad,
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


@pytest.mark.parametrize("T,da,db,causal,bt", [
    (70, 1, 3, False, 64),    # the SSRN hc1→hc2 / ups pairs (SAME)
    (257, 1, 1, False, 64),   # hc3→hc4, ragged multi-block
    (300, 9, 27, True, 128),  # causal dilation-stack deep pair (72-row halo)
    (33, 1, 3, True, 64),     # causal shallow pair, single short block
    (8, 1, 1, False, 64),     # shorter than one block
])
def test_fused_pair_matches_reference(T, da, db, causal, bt):
    rng = np.random.default_rng(10)
    B, C = 2, 64
    x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    pa = _params(rng, C)
    pb = _params(rng, C)
    y = fused_highway_conv_pair(x, *pa, *pb, dilation_a=da, dilation_b=db,
                                causal=causal, block_t=bt)
    yr = highway_conv_reference(
        highway_conv_reference(x, *pa, dilation=da, causal=causal),
        *pb, dilation=db, causal=causal)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               atol=3e-5, rtol=1e-5)


def test_fused_pair_matches_chained_fused():
    """The pair kernel's contract: computes exactly what two chained
    single-block fused kernels compute (y1 is cast through x.dtype between
    the layers), so enabling it can never change what the single-block
    fusion produces. Tolerance is dot-reduction-order only (the H1-row
    layer-A matmul may partition differently from the block_t-row one)."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(3, 130, 32)), jnp.float32)
    pa = _params(rng, 32)
    pb = _params(rng, 32)
    for da, db, causal in [(1, 3, False), (1, 1, False), (9, 27, True)]:
        pair = fused_highway_conv_pair(x, *pa, *pb, dilation_a=da,
                                       dilation_b=db, causal=causal,
                                       block_t=128)
        chained = fused_highway_conv(
            fused_highway_conv(x, *pa, dilation=da, causal=causal, block_t=128),
            *pb, dilation=db, causal=causal, block_t=128)
        np.testing.assert_allclose(np.asarray(pair), np.asarray(chained),
                                   atol=1e-6, rtol=1e-6,
                                   err_msg=f"{(da, db, causal)}")


def test_pair_custom_vjp_grads_match():
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(2, 37, 64)), jnp.float32)
    pa = _params(rng, 64)
    pb = _params(rng, 64)

    g_fused = jax.grad(lambda *a: jnp.sum(
        fused_highway_conv_pair_ad(*a, 1, 3, False) ** 2))(x, *pa, *pb)
    g_ref = jax.grad(lambda *a: jnp.sum(highway_conv_reference(
        highway_conv_reference(a[0], *a[1:7], dilation=1),
        *a[7:], dilation=3) ** 2))(x, *pa, *pb)
    for a, bb in zip(jax.tree_util.tree_leaves(g_fused),
                     jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-4, rtol=1e-4)


def test_ssrn_fused_pair_impl_matches_xla():
    """Process-wide fused_pair switch: SSRN's three highway pairs (hc1→hc2,
    both Upsample2x pairs, hc3→hc4) each run as one dispatch; output must
    match the plain path, and init under the switch must build the SAME
    param tree (fusion reads the flax submodules' params, it never creates
    its own)."""
    from spoofsv_tpu.models.layers import set_default_gate_impl
    from spoofsv_tpu.models.ssrn import SSRN

    rng = np.random.default_rng(13)
    mel = jnp.asarray(rng.uniform(0.05, 0.95, (2, 24, 80)), jnp.float32)
    m = SSRN(freq_bins=80, output_bins=129, ssrn_dim=64)
    p = m.init(jax.random.PRNGKey(0), mel)
    y_xla = m.apply(p, mel)
    set_default_gate_impl("fused_pair")
    try:
        y_fused = m.apply(p, mel)
        p2 = m.init(jax.random.PRNGKey(0), mel)
    finally:
        set_default_gate_impl("xla")
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_xla),
                               atol=3e-5, rtol=1e-5)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(p2))


def test_text2mel_fused_pair_impl_matches_xla():
    """Causal dilation stacks (1,3)/(9,27) pair-fused inside the full
    teacher-forced Text2Mel forward; tiny T exercises the halo-too-big
    fallback for the (9,27) pair."""
    from spoofsv_tpu.models.layers import set_default_gate_impl
    from spoofsv_tpu.models.text2mel import MelSyn
    from spoofsv_tpu.train.steps import shift_right

    rng = np.random.default_rng(14)
    B, N, T = 2, 12, 16
    text = jnp.asarray(rng.integers(1, 30, (B, N)), jnp.int32)
    spk = jnp.asarray(rng.normal(size=(B, 200)), jnp.float32)
    mel = jnp.asarray(rng.uniform(0.05, 0.95, (B, T, 80)), jnp.float32)
    m = MelSyn(vocab_len=34, condition=True, spk_emb_dim=200,
               text_emb_dim=32, freq_bins=80, hidden_dim=64)
    p = m.init(jax.random.PRNGKey(0), shift_right(mel), text, spk)
    out_xla = m.apply(p, shift_right(mel), text, spk)
    set_default_gate_impl("fused_pair")
    try:
        out_fused = m.apply(p, shift_right(mel), text, spk)
    finally:
        set_default_gate_impl("xla")
    for a, b in zip(jax.tree_util.tree_leaves(out_fused),
                    jax.tree_util.tree_leaves(out_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-5)


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
