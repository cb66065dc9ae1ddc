"""Pallas kernel parity tests (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spoofsv_tpu.ops.pallas_ops import fused_highway_gate, highway_gate_reference


class TestFusedHighwayGate:
    @pytest.mark.parametrize("shape_c", [((6, 40), 32), ((2, 10, 7), 16)])
    def test_matches_reference(self, shape_c):
        lead, c = shape_c
        rng = np.random.default_rng(0)
        h = jnp.asarray(rng.normal(size=(*lead, 2 * c)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(*lead, c)), jnp.float32)
        s1 = jnp.asarray(rng.normal(1, 0.1, (c,)), jnp.float32)
        b1 = jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32)
        s2 = jnp.asarray(rng.normal(1, 0.1, (c,)), jnp.float32)
        b2 = jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32)
        out = fused_highway_gate(h, x, s1, b1, s2, b2, block_rows=8,
                                 interpret=True)
        ref = highway_gate_reference(h, x, s1, b1, s2, b2)
        assert out.shape == x.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_row_padding(self):
        """rows not divisible by block_rows → padded tile, exact output."""
        rng = np.random.default_rng(1)
        c = 8
        h = jnp.asarray(rng.normal(size=(13, 2 * c)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(13, c)), jnp.float32)
        ones = jnp.ones((c,))
        zeros = jnp.zeros((c,))
        out = fused_highway_gate(h, x, ones, zeros, ones, zeros,
                                 block_rows=8, interpret=True)
        ref = highway_gate_reference(h, x, ones, zeros, ones, zeros)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_matches_highwayconv_module(self):
        """The kernel computes exactly HighwayConv's gate (torch-parity-tested
        path), given the conv output and LN params."""
        from spoofsv_tpu.models.layers import HighwayConv

        rng = np.random.default_rng(2)
        hc = HighwayConv(dim=16, kernel_size=3, dilation=1, causal=False)
        xin = jnp.asarray(rng.normal(size=(2, 12, 16)), jnp.float32)
        params = hc.init(jax.random.PRNGKey(0), xin)
        ref = hc.apply(params, xin)

        # reproduce: conv → fused gate
        kernel = params["params"]["conv"]["kernel"]
        bias = params["params"]["conv"]["bias"]
        h = jax.lax.conv_general_dilated(
            xin, kernel, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC")
        ) + bias
        p = params["params"]
        out = fused_highway_gate(
            h, xin, p["ln1"]["scale"], p["ln1"]["bias"],
            p["ln2"]["scale"], p["ln2"]["bias"], block_rows=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestGateImplSwitch:
    """cfg.tpu.highway_gate_impl / set_default_gate_impl wiring: whole models
    produce the same output under either gate implementation."""

    def _toggle(self, impl):
        from spoofsv_tpu.models import layers

        layers.set_default_gate_impl(impl)

    def test_ssrn_forward_parity(self):
        from spoofsv_tpu.models import layers
        from spoofsv_tpu.models.ssrn import SSRN

        rng = np.random.default_rng(3)
        ssrn = SSRN(freq_bins=80, output_bins=513, ssrn_dim=16,
                    dtype=jnp.float32)
        mel = jnp.asarray(rng.uniform(0.05, 0.95, (2, 8, 80)), jnp.float32)
        params = ssrn.init(jax.random.PRNGKey(0), mel)
        try:
            self._toggle("xla")
            ref = ssrn.apply(params, mel)
            self._toggle("pallas")
            out = ssrn.apply(params, mel)
        finally:
            layers.set_default_gate_impl("xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    def test_melsyn_teacher_forced_parity(self):
        from spoofsv_tpu.models import layers
        from spoofsv_tpu.models.text2mel import MelSyn
        from spoofsv_tpu.train.steps import shift_right

        rng = np.random.default_rng(4)
        m = MelSyn(vocab_len=34, condition=True, spk_emb_dim=10,
                   text_emb_dim=8, freq_bins=80, hidden_dim=16,
                   dtype=jnp.float32)
        text = jnp.asarray(rng.integers(1, 30, (2, 9)), jnp.int32)
        spk = jnp.asarray(rng.normal(size=(2, 10)), jnp.float32)
        mel = jnp.asarray(rng.uniform(0.05, 0.95, (2, 6, 80)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), shift_right(mel), text, spk)
        try:
            self._toggle("xla")
            y_ref, a_ref = m.apply(params, shift_right(mel), text, spk)
            self._toggle("pallas")
            y, a = m.apply(params, shift_right(mel), text, spk)
        finally:
            layers.set_default_gate_impl("xla")
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref),
                                   atol=2e-5, rtol=1e-5)


def test_parity_tpu_artifact():
    """The committed on-chip parity artifact (docs/PARITY_TPU.json, written
    by scripts/parity_tpu.py on the live chip) must exist, cover both kernel
    families over >=3 input distributions each, and satisfy the thresholds
    the driver asserts — so a regression that re-runs the driver (or a stale
    hand-edit) fails here loudly."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "PARITY_TPU.json")
    assert os.path.isfile(path), "run scripts/parity_tpu.py on the chip"
    art = json.load(open(path))
    assert art["backend"] == "tpu", art["backend"]

    gl = art["griffin_lim"]
    assert len(gl["distributions"]) >= 3
    for name, r in gl["distributions"].items():
        assert abs(r["sc_delta_bf16"]) < gl["sc_delta_threshold"], (name, r)
        assert abs(r["sc_delta_int8"]) < gl["sc_delta_threshold"], (name, r)
        # the fused kernels must actually have CONVERGED, not just matched
        # a diverged XLA run
        assert r["sc_fused_bf16"] < 0.9, (name, r)

    dec = art["decode"]
    assert len(dec["distributions"]) >= 3
    for name, r in dec["distributions"].items():
        assert r["mel_maxabs"] < dec["mel_threshold"], (name, r)
        assert r["attn_maxabs"] < dec["attn_threshold"], (name, r)


def test_gl_spsi_artifact():
    """The committed trained-checkpoint GL artifact
    (docs/GL_SPSI_CHECK.json, written on the live chip) must keep
    supporting the production default (griffin_lim_init='spsi', 12 iters
    since r5): spectral convergence strictly better than the r3 advance-24
    default on EVERY sentence bucket and ≤0.006 behind the reference's
    random-64; the fused bf16/int8 kernel paths within 1e-3 of the XLA
    number at 12 iters; AND — the r5 decider — the analysis-by-synthesis
    MCD tie with the reference mode on the trained checkpoints (`mcd_ab`:
    within 0.05 dB of random@64 on both legs). A hand-edit or a re-run
    that breaks any of these must fail here loudly."""
    import json
    import os

    from spoofsv_tpu.config import Config

    cfg = Config().tpu
    assert (cfg.griffin_lim_init, cfg.griffin_lim_iters) == ("spsi", 12)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "GL_SPSI_CHECK.json")
    art = json.load(open(path))
    assert art["backend"] == "tpu", art["backend"]
    combos = art["combos"]
    buckets = ["short_sentences", "median_sentences", "long_sentences"]
    for b in buckets:
        spsi12 = combos["spsi@12"][b]
        assert spsi12 < combos["advance@24"][b], (b, combos)
        assert spsi12 < combos["random@64"][b] + 0.006, (b, combos)
        # fused production kernels track the XLA spsi-12 number
        for k in ("spsi12_bf16", "spsi12_int8"):
            assert abs(art["fused_candidate"][k][b] - spsi12) < 1e-3, (k, b)
    # task-metric gate: MCD tie with the reference's random-64 mode
    mcd = art["mcd_ab"]["results_db"]
    for leg in ("copy_synthesis", "tts"):
        assert mcd["spsi@12"][leg] <= mcd["random@64"][leg] + 0.05, mcd
