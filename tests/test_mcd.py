"""Mel-cepstral distortion metric (spoofkit/mcd.py)."""

import numpy as np
import pytest

from spoofsv_tpu.spoofkit.mcd import batch_mcd, dtw_path, mcd, mel_cepstra


@pytest.fixture()
def mel(rng):
    return rng.uniform(0.05, 0.95, (40, 80)).astype(np.float32)


class TestMCD:
    def test_identical_is_zero(self, mel):
        assert mcd(mel, mel) == pytest.approx(0.0, abs=1e-9)
        assert mcd(mel, mel, align="frame") == pytest.approx(0.0, abs=1e-9)

    def test_positive_and_monotone_in_distortion(self, mel, rng):
        noise = rng.normal(size=mel.shape).astype(np.float32)
        small = np.clip(mel * np.exp(0.05 * noise), 1e-5, None)
        big = np.clip(mel * np.exp(0.50 * noise), 1e-5, None)
        m_small = mcd(mel, small, align="frame")
        m_big = mcd(mel, big, align="frame")
        assert 0.0 < m_small < m_big

    def test_known_value_single_coefficient(self):
        """A pure c1 offset of d gives MCD = (10/ln10)·sqrt(2)·|d| exactly."""
        t, f = 8, 80
        base = np.full((t, f), 0.5)
        c = mel_cepstra(base, n_coef=13)
        # craft a second mel whose cepstra differ only in c1 by delta:
        # add delta * dct_basis_1 to log-mel, i.e. multiply mel^(1/p) by exp.
        from scipy.fftpack import idct

        delta = 0.3
        bump = np.zeros(f)
        bump[1] = delta
        log_shift = idct(bump, type=2, norm="ortho")
        other = np.power(np.power(base, 1 / 0.6) * np.exp(log_shift), 0.6)
        c2 = mel_cepstra(other, n_coef=13)
        np.testing.assert_allclose(c2 - c, np.tile(
            np.eye(1, 13, 0) * delta, (t, 1)), atol=1e-9)
        expected = 10.0 / np.log(10.0) * np.sqrt(2.0) * delta
        assert mcd(base, other, align="frame") == pytest.approx(expected,
                                                                rel=1e-6)

    def test_dtw_absorbs_time_shift(self, mel):
        """A time-warped copy scores far better under DTW than frame pairing."""
        warped = np.repeat(mel, 2, axis=0)[::3][: len(mel)]
        assert mcd(mel, warped) < mcd(mel, warped, align="frame")

    def test_dtw_path_monotone(self, rng):
        x = rng.normal(size=(12, 5))
        y = rng.normal(size=(17, 5))
        pi, pj = dtw_path(x, y)
        assert pi[0] == 0 and pj[0] == 0
        assert pi[-1] == 11 and pj[-1] == 16
        assert (np.diff(pi) >= 0).all() and (np.diff(pj) >= 0).all()
        assert ((np.diff(pi) + np.diff(pj)) >= 1).all()

    def test_batch_with_lengths(self, mel, rng):
        b = np.stack([mel, mel])
        syn = b.copy()
        # corrupt only padding rows of item 1 → masked out by lengths
        syn[1, 30:] = 0.9
        val = batch_mcd(b, syn, lengths=np.array([40, 30]), align="frame")
        assert val == pytest.approx(0.0, abs=1e-9)

    def test_silent_rollout_tail_is_trimmed(self, mel):
        """Fixed-budget AR rollouts pad with near-silence; MCD must not let
        that tail dominate (the regression seen at campaign scale)."""
        from spoofsv_tpu.spoofkit.mcd import active_length

        padded = np.concatenate([mel, np.full((200, 80), 1e-4,
                                               np.float32)], axis=0)
        assert active_length(padded) == len(mel)
        assert mcd(mel, padded) == pytest.approx(0.0, abs=1e-9)
