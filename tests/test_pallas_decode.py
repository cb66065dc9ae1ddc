"""Fused decode kernel vs the scan decoder (interpret mode, CPU).

The kernel re-implements the whole AR rollout of
``models/TTSModel.py:275-300`` on-chip; it must match
:func:`spoofsv_tpu.infer.decode.make_decoder` (itself parity-tested against
the reference's O(T²) loop) frame for frame.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spoofsv_tpu.infer.decode import make_decoder
from spoofsv_tpu.models import MelSyn
from spoofsv_tpu.ops.pallas_decode import make_fused_decoder
from spoofsv_tpu.train.steps import shift_right

# Interpret-mode parity tests: the comparators run eager jnp ops (incl. fft)
# that the experimental axon TPU backend leaves UNIMPLEMENTED — compiled-
# kernel behavior on real TPU is validated at pipeline level by scripts/bench_decode.py
# and the end-to-end benches.
pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu",
    reason="CPU interpret-mode parity suite (axon backend lacks comparator ops)")



def _setup(B=4, N=12, hidden=32, freq=16, condition=True, seed=0):
    rng = np.random.default_rng(seed)
    model = MelSyn(vocab_len=34, condition=condition, spk_emb_dim=10,
                   text_emb_dim=16, freq_bins=freq, hidden_dim=hidden)
    text = jnp.asarray(rng.integers(1, 33, (B, N)), jnp.int32)
    spk = jnp.asarray(rng.normal(size=(B, 10)), jnp.float32)
    mel_ex = jnp.asarray(rng.uniform(0.05, 0.95, (B, 4, freq)), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), shift_right(mel_ex),
                        text, spk)
    return model, params, text, spk


class TestFusedDecodeParity:
    @pytest.mark.parametrize("condition", [True, False])
    def test_matches_scan_decoder(self, condition):
        model, params, text, spk = _setup(condition=condition)
        T = 10
        ref = make_decoder(model, T, unroll=1)
        y0, a0, pma0 = ref(params, text, spk if condition else None)
        fused = make_fused_decoder(model, T, interpret=True)
        y1, a1, pma1 = fused(params, text, spk if condition else None)
        assert y1.shape == y0.shape and a1.shape == a0.shape
        np.testing.assert_allclose(np.asarray(a0), np.asarray(a1),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(pma0), np.asarray(pma1))

    def test_long_rollout_rings_wrap(self):
        """T > 2·27 so every circular ring buffer wraps at least once."""
        model, params, text, spk = _setup(B=2, N=10)
        T = 60
        ref = make_decoder(model, T, unroll=1)
        y0, a0, _ = ref(params, text, spk)
        fused = make_fused_decoder(model, T, interpret=True)
        y1, a1, _ = fused(params, text, spk)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   atol=2e-5, rtol=1e-4)

    def test_batch_tiling(self):
        """B larger than the batch tile → multiple grid steps, rings reset."""
        model, params, text, spk = _setup(B=6, N=12)
        T = 8
        ref = make_decoder(model, T, unroll=1)
        y0, a0, _ = ref(params, text, spk)
        fused = make_fused_decoder(model, T, batch_tile=2, interpret=True)
        y1, a1, _ = fused(params, text, spk)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(a0), np.asarray(a1),
                                   atol=1e-5, rtol=1e-4)
