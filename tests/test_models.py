"""Model-layer tests: shapes, causality, incremental-step equivalence, GE2E golden."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spoofsv_tpu.models import (
    SSRN,
    Critic1D,
    HighwayConv,
    LinDisc,
    MelDisc,
    MelSyn,
)
from spoofsv_tpu.models import ge2e as ge2e_mod


class TestHighwayConv:
    @pytest.mark.parametrize("dilation", [1, 3])
    def test_causality(self, dilation):
        """Changing a future input must not change past outputs."""
        hc = HighwayConv(dim=8, kernel_size=3, dilation=dilation, causal=True)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 12, 8)), jnp.float32)
        params = hc.init(jax.random.PRNGKey(0), x)
        y1 = hc.apply(params, x)
        x2 = x.at[:, 7, :].set(99.0)
        y2 = hc.apply(params, x2)
        np.testing.assert_allclose(np.asarray(y1[:, :7]), np.asarray(y2[:, :7]), atol=1e-6)
        assert not np.allclose(np.asarray(y1[:, 7:]), np.asarray(y2[:, 7:]))

    def test_same_conv_preserves_length(self):
        hc = HighwayConv(dim=8, kernel_size=3, dilation=3, causal=False)
        x = jnp.zeros((2, 20, 8))
        params = hc.init(jax.random.PRNGKey(0), x)
        assert hc.apply(params, x).shape == (2, 20, 8)

    @pytest.mark.parametrize("dilation", [1, 3, 9])
    def test_step_matches_full(self, dilation):
        """Incremental cached step == last column of the full causal conv."""
        hc = HighwayConv(dim=8, kernel_size=3, dilation=dilation, causal=True)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 25, 8)), jnp.float32)
        params = hc.init(jax.random.PRNGKey(0), x)
        full = hc.apply(params, x)

        cache = hc.apply(params, 2, method=HighwayConv.init_cache)
        outs = []
        for t in range(25):
            y_t, cache = hc.apply(params, x[:, t, :], cache, method=HighwayConv.step)
            outs.append(y_t)
        inc = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=1e-5)


def _tiny_melsyn():
    return MelSyn(vocab_len=32, condition=True, spk_emb_dim=10,
                  text_emb_dim=12, freq_bins=8, hidden_dim=16)


class TestMelSyn:
    def setup_method(self):
        self.model = _tiny_melsyn()
        rng = np.random.default_rng(2)
        self.B, self.N, self.T = 2, 9, 11
        self.mel = jnp.asarray(rng.uniform(size=(self.B, self.T, 8)), jnp.float32)
        self.text = jnp.asarray(rng.integers(1, 30, size=(self.B, self.N)))
        self.spk = jnp.asarray(rng.normal(size=(self.B, 10)), jnp.float32)
        self.params = self.model.init(jax.random.PRNGKey(0), self.mel, self.text, self.spk)

    def test_forward_shapes(self):
        Y, A = self.model.apply(self.params, self.mel, self.text, self.spk)
        assert Y.shape == (self.B, self.T, 8)
        assert A.shape == (self.B, self.N, self.T)
        a = np.asarray(A)
        np.testing.assert_allclose(a.sum(axis=1), 1.0, atol=1e-5)
        y = np.asarray(Y)
        assert (y > 0).all() and (y < 1).all()

    def test_teacher_forced_causality(self):
        """Y[:, :t] must not depend on mel_inputs[:, t:] (causal decoder)."""
        Y1, _ = self.model.apply(self.params, self.mel, self.text, self.spk)
        mel2 = self.mel.at[:, 6:, :].set(0.5)
        Y2, _ = self.model.apply(self.params, mel2, self.text, self.spk)
        np.testing.assert_allclose(np.asarray(Y1[:, :6]), np.asarray(Y2[:, :6]), atol=1e-5)

    def test_decode_step_equivalence(self):
        """Scan decode with caches == naive full-prefix teacher-forced forward.

        Feed the decode chain its own outputs; then run the teacher-forced
        parallel forward on [0, y_1..y_{T-1}] (without monotonic masking the
        attention differs, so compare with masking disabled)."""
        m = self.model
        K, V = m.apply(self.params, self.text, method=MelSyn.encode_text)
        state = m.apply(self.params, self.B, method=MelSyn.init_state)

        ys = []
        for _ in range(self.T):
            state, (y_t, a_t) = m.apply(
                self.params, state, K, V, self.spk, None, False,
                method=MelSyn.decode_step)
            ys.append(y_t)
        y_ar = jnp.stack(ys, axis=1)                       # (B, T, F)

        # teacher-forced forward on shifted AR outputs reproduces them exactly
        shifted = jnp.concatenate(
            [jnp.zeros((self.B, 1, 8)), y_ar[:, :-1, :]], axis=1)
        y_tf, _ = m.apply(self.params, shifted, self.text, self.spk)
        np.testing.assert_allclose(np.asarray(y_ar), np.asarray(y_tf), atol=2e-5)

    def test_monotonic_window_masking(self):
        """With monotonic=True, attention mass lives in [pma, pma+2]."""
        m = self.model
        K, V = m.apply(self.params, self.text, method=MelSyn.encode_text)
        state = m.apply(self.params, self.B, method=MelSyn.init_state)
        for _ in range(4):
            prev_pma = np.asarray(state.pma)
            state, (y_t, a_t) = m.apply(
                self.params, state, K, V, self.spk, None, True,
                method=MelSyn.decode_step)
            a = np.asarray(a_t)
            for b in range(self.B):
                lo, hi = prev_pma[b], prev_pma[b] + 2
                outside = np.delete(a[b], np.arange(lo, min(hi + 1, self.N)))
                assert outside.max() < 1e-6
                assert prev_pma[b] <= np.asarray(state.pma)[b] <= hi


class TestSSRN:
    def test_upsamples_4x(self):
        m = SSRN(freq_bins=8, output_bins=33, ssrn_dim=12)
        x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 10, 8)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (2, 40, 33)
        yy = np.asarray(y)
        assert (yy > 0).all() and (yy < 1).all()


class TestCritics:
    @pytest.mark.parametrize("factory,bins", [(MelDisc, 80), (LinDisc, 513)])
    def test_scalar_output(self, factory, bins):
        m = factory(disc_dim=16)
        x = jnp.asarray(np.random.default_rng(0).uniform(size=(3, 64, bins)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (3,)

    def test_sigmoid_variant_in_range(self):
        m = Critic1D(disc_dim=16, sigmoid_out=True)
        x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 32, 80)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y = np.asarray(m.apply(params, x))
        assert ((y > 0) & (y < 1)).all()


# ----------------------------------------------------------------------
# GE2E golden tests: vectorized implementation vs direct loop transcription
# ----------------------------------------------------------------------

def _loop_cossim(emb, centroids):
    """Direct numpy transcription of GE2E/utils.py:36-46."""
    n, m, d = emb.shape
    k = centroids.shape[0]
    out = np.zeros((n, m, k))
    for j in range(n):
        for i in range(m):
            for c in range(k):
                cen = centroids[c]
                if c == j and k == n:
                    cen = (emb[j].sum(0) - emb[j, i]) / (m - 1)
                e = emb[j, i]
                out[j, i, c] = e @ cen / (np.linalg.norm(e) * np.linalg.norm(cen)) + 1e-6
    return out


def _loop_loss(sim):
    """Direct numpy transcription of GE2E/utils.py:48-55."""
    n, m, _ = sim.shape
    per = np.zeros((n, m))
    for j in range(n):
        for i in range(m):
            per[j, i] = -(sim[j, i, j] - np.log(np.exp(sim[j, i]).sum() + 1e-6))
    return per.sum()


class TestGE2E:
    def test_cossim_golden(self):
        rng = np.random.default_rng(3)
        emb = rng.normal(size=(4, 5, 6)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        cen = emb.mean(axis=1)
        ours = np.asarray(ge2e_mod.get_cossim(jnp.asarray(emb), jnp.asarray(cen)))
        ref = _loop_cossim(emb, cen)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_loss_golden(self):
        rng = np.random.default_rng(4)
        emb = rng.normal(size=(3, 4, 8)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        cen = emb.mean(axis=1)
        sim = 10.0 * _loop_cossim(emb, cen) - 5.0
        ref = _loop_loss(sim)
        ours, _ = ge2e_mod.calc_loss(jnp.asarray(sim, jnp.float32))
        np.testing.assert_allclose(float(ours), ref, rtol=1e-5)

    def test_loss_module_smoke(self):
        """Mirror of the reference's own smoke test (GE2E/utils.py:89-96)."""
        emb = jnp.asarray(
            np.array([[0, 1, 0], [0, 0, 1], [0, 1, 0], [0, 1, 0], [1, 0, 0], [1, 0, 0]],
                     dtype=np.float32).reshape(3, 2, 3))
        loss_mod = ge2e_mod.GE2ELoss()
        params = loss_mod.init(jax.random.PRNGKey(0), emb)
        loss = loss_mod.apply(params, emb)
        assert np.isfinite(float(loss))

    def test_embedder_shapes(self):
        m = ge2e_mod.SpeechEmbedder(hidden=16, num_layers=2, proj=8)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 10, 40)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        e = m.apply(params, x)
        assert e.shape == (6, 8)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=1), 1.0, atol=1e-5)

    def test_enrollment_centroids_no_loo(self):
        """K != N path (test harness: verification vs enrollment centroids)."""
        rng = np.random.default_rng(5)
        emb = rng.normal(size=(4, 3, 6)).astype(np.float32)
        cen = rng.normal(size=(4, 6)).astype(np.float32)
        # with K==N but centroids NOT the means of emb, the diag still uses LOO
        # (matches reference get_cossim semantics which keys on index equality)
        ours = np.asarray(ge2e_mod.get_cossim(jnp.asarray(emb), jnp.asarray(cen)))
        ref = _loop_cossim(emb, cen)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestCMVariants:
    def test_v1_no_second_pool(self):
        from spoofsv_tpu.models import Critic1D
        m = Critic1D(disc_dim=16, pool1=2, pool2=None, sigmoid_out=True)
        x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 80)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y = np.asarray(m.apply(params, x))
        assert y.shape == (2,) and ((y > 0) & (y < 1)).all()

    def test_v2_extra_stage(self):
        from spoofsv_tpu.models import Critic1D
        m = Critic1D(disc_dim=16, pool1=2, pool2=2, extra_stage=True, sigmoid_out=True)
        x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 80)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        assert "conv3_2" in params["params"]
        y = np.asarray(m.apply(params, x))
        assert y.shape == (2,)


class TestDRS:
    def test_forward_softmax(self):
        from spoofsv_tpu.models import DRS
        m = DRS(num_classes=2, resnet_blocks=1)
        # 257x400 feature map as in the reference docstring (discriminator.py:107)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 257, 400, 1)), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(variables, x)
        assert y.shape == (2, 2)
        np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, atol=1e-5)
