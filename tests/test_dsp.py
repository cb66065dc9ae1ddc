"""DSP parity tests: JAX kernels vs numpy host tier vs independent references.

The reference relied on librosa (not available here, and not wanted); instead we
verify against (a) closed-form properties, (b) torch.stft as an independent
implementation of centered reflect-padded STFT, and (c) round-trip identities.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spoofsv_tpu.config import Config
from spoofsv_tpu.dsp import host, jaxdsp
from spoofsv_tpu.dsp.primitives import hann_window, mel_filterbank


SR = 22050
N_FFT = 1024
HOP = 256


def chirp(n=SR, sr=SR):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * (200 + 300 * t) * t)).astype(np.float32)


class TestWindowAndMel:
    def test_hann_periodic(self):
        w = hann_window(8)
        # periodic hann: w[0]=0, symmetric around N/2, w[N/2]=1
        assert w[0] == 0.0
        assert abs(w[4] - 1.0) < 1e-12
        np.testing.assert_allclose(w[1:4], w[-1:-4:-1], rtol=1e-12)

    def test_mel_filterbank_shape_and_coverage(self):
        fb = mel_filterbank(SR, N_FFT, 80)
        assert fb.shape == (80, 513)
        # every filter has positive area; filters tile the band
        assert (fb.sum(axis=1) > 0).all()
        # Slaney normalization: each filter's area ≈ 2/(width in Hz) * triangle
        # area = 1 in the continuous limit → row sums scale like 1/bandwidth.
        # Check the known equal-area property approximately via integral:
        freqs = np.linspace(0, SR / 2, 513)
        df = freqs[1] - freqs[0]
        areas = fb.sum(axis=1) * df
        # middle filters should have area ~1 (edge effects aside)
        assert np.all(np.abs(areas[5:-5] - 1.0) < 0.2)

    def test_mel_filterbank_vs_torch_audio_free_formula(self):
        # independent check of the Slaney break frequency: filter peaks should
        # be linear below 1kHz and log-spaced above.
        from spoofsv_tpu.dsp.primitives import hz_to_mel, mel_to_hz

        np.testing.assert_allclose(mel_to_hz(hz_to_mel(440.0)), 440.0, rtol=1e-9)
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(4000.0)), 4000.0, rtol=1e-9)
        assert abs(hz_to_mel(1000.0) - 15.0) < 1e-9  # 1000/(200/3) = 15


class TestSTFT:
    def test_host_stft_vs_torch(self):
        import torch

        y = chirp()
        ours = host.stft(y, N_FFT, HOP)  # (F, T)
        ref = torch.stft(
            torch.from_numpy(y), n_fft=N_FFT, hop_length=HOP,
            window=torch.hann_window(N_FFT, periodic=True),
            center=True, pad_mode="reflect", return_complex=True,
        ).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(np.abs(ours), np.abs(ref), atol=2e-4, rtol=1e-4)

    def test_jax_stft_matches_host(self):
        y = chirp(n=8000)
        ours_np = host.stft(y, N_FFT, HOP)                  # (F, T)
        ours_jax = jaxdsp.stft(jnp.asarray(y), N_FFT, HOP)  # (T, F)
        np.testing.assert_allclose(
            np.abs(np.asarray(ours_jax)).T, np.abs(ours_np), atol=2e-4, rtol=1e-4
        )

    def test_jax_stft_batched(self):
        y = np.stack([chirp(4096), 0.3 * chirp(4096)])
        out = jaxdsp.stft(jnp.asarray(y), N_FFT, HOP)
        assert out.shape[0] == 2
        single = jaxdsp.stft(jnp.asarray(y[1]), N_FFT, HOP)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), atol=1e-5)

    def test_istft_roundtrip(self):
        y = chirp(n=HOP * 40)
        spec = jaxdsp.stft(jnp.asarray(y), N_FFT, HOP)
        rec = np.asarray(jaxdsp.istft(spec, N_FFT, HOP))
        assert rec.shape[-1] == HOP * (spec.shape[0] - 1)
        # centered istft∘stft is identity on the interior
        n = min(len(y), len(rec))
        np.testing.assert_allclose(rec[N_FFT: n - N_FFT], y[N_FFT: n - N_FFT], atol=1e-4)

    def test_ge2e_stft_win_ne_nfft(self):
        # GE2E uses n_fft=512, win=400, hop=160 (GE2E/data_preprocess.py:49)
        y = chirp(n=16000, sr=16000)
        S = host.stft(y, 512, 160, win_length=400)
        assert S.shape[0] == 257
        logmel = host.ge2e_logmel(y, 16000, 512, 0.025, 0.01, 40)
        assert logmel.shape[0] == 40
        assert np.isfinite(logmel).all()


class TestFilters:
    def test_preemph_roundtrip(self):
        y = chirp(2048)
        pe = host.preemphasis(y, 0.97)
        back = host.deemphasis(pe, 0.97)
        np.testing.assert_allclose(back, y, atol=1e-4)

    def test_jax_deemphasis_matches_scipy(self):
        y = chirp(4096)
        ref = host.deemphasis(y, 0.97)
        ours = np.asarray(jaxdsp.deemphasis(jnp.asarray(y), coeff=0.97))
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)

    def test_jax_preemphasis_matches_host(self):
        y = chirp(1024)
        np.testing.assert_allclose(
            np.asarray(jaxdsp.preemphasis(jnp.asarray(y), 0.97)),
            host.preemphasis(y, 0.97), atol=1e-6)

    def test_trim_silence(self):
        sig = np.concatenate([np.zeros(8000, np.float32), chirp(8000), np.zeros(8000, np.float32)])
        trimmed, (s, e) = host.trim_silence(sig, 22.0)
        assert 4000 < s < 9000
        assert 15000 < e < 20000
        assert len(trimmed) == e - s


class TestFeatures:
    def test_tts_features_shapes_and_range(self):
        cfg = Config()
        y = chirp(SR)
        mel, lin = host.tts_features(y, SR, cfg)
        tr = mel.shape[0]
        assert lin.shape[0] == 4 * tr
        assert mel.shape[1] == 80 and lin.shape[1] == 513
        # per-utterance max-norm bounds everything in (0, 1]; the global max
        # frame may be dropped by the ×4 time reduction, so only bound it.
        assert 0.0 <= mel.max() <= 1.0 + 1e-6
        assert mel.max() > 0.5
        assert 0.0 <= lin.max() <= 1.0 + 1e-6

    def test_time_reduction_semantics(self):
        # coarse mel keeps frames 0, R, 2R, ... (data/dataset.py:114-118)
        cfg = Config()
        y = chirp(SR // 2)
        mel, lin = host.tts_features(y, SR, cfg)
        assert lin.shape[0] == cfg.mel.reduction * mel.shape[0]


class TestDFTMatmul:
    def test_rfft_matmul_matches_fft(self):
        rng = np.random.default_rng(7)
        frames = jnp.asarray(rng.normal(size=(3, 5, 1024)), jnp.float32)
        re1, im1 = jaxdsp.rfft_ri(frames, 1024, use_matmul=False)
        re2, im2 = jaxdsp.rfft_ri(frames, 1024, use_matmul=True)
        np.testing.assert_allclose(np.asarray(re1), np.asarray(re2), atol=2e-2, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(im1), np.asarray(im2), atol=2e-2, rtol=1e-4)

    def test_irfft_matmul_roundtrip(self):
        rng = np.random.default_rng(8)
        frames = jnp.asarray(rng.normal(size=(2, 1024)), jnp.float32)
        re, im = jaxdsp.rfft_ri(frames, 1024, use_matmul=True)
        back = jaxdsp.irfft_ri(re, im, 1024, use_matmul=True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(frames), atol=1e-3)

    def test_griffinlim_matmul_path_matches_fft_path(self):
        """Same key → identical phase init → the two FFT backends must agree."""
        y = chirp(n=HOP * 20)
        mag = jnp.abs(jaxdsp.stft(jnp.asarray(y), N_FFT, HOP))
        out_mm = jaxdsp.griffin_lim(mag, jax.random.PRNGKey(2), N_FFT, HOP,
                                    N_FFT, n_iter=8, use_matmul=True)
        out_fft = jaxdsp.griffin_lim(mag, jax.random.PRNGKey(2), N_FFT, HOP,
                                     N_FFT, n_iter=8, use_matmul=False)
        denom = float(jnp.abs(out_fft).max())
        np.testing.assert_allclose(np.asarray(out_mm), np.asarray(out_fft),
                                   atol=denom * 5e-3)


class TestGriffinLim:
    def test_reconstruction_quality(self):
        # GL on a true magnitude spectrogram should reconstruct a signal whose
        # magnitude spectrogram is close to the input.
        y = chirp(n=HOP * 60)
        mag = jnp.abs(jaxdsp.stft(jnp.asarray(y), N_FFT, HOP))
        out = jaxdsp.griffin_lim(mag, jax.random.PRNGKey(0), N_FFT, HOP, N_FFT, n_iter=32)
        mag2 = jnp.abs(jaxdsp.stft(out, N_FFT, HOP))
        err = float(jnp.linalg.norm(mag - mag2) / jnp.linalg.norm(mag))
        assert err < 0.12, f"relative spectral error {err}"

    def test_batched(self):
        y = np.stack([chirp(HOP * 20), 0.5 * chirp(HOP * 20)])
        mag = jnp.abs(jaxdsp.stft(jnp.asarray(y), N_FFT, HOP))
        out = jaxdsp.griffin_lim(mag, jax.random.PRNGKey(1), N_FFT, HOP, N_FFT, n_iter=4)
        assert out.shape == (2, HOP * (mag.shape[1] - 1))


class TestResample:
    def test_downsample_tone(self):
        sr1, sr2 = 22050, 16000
        t = np.arange(sr1) / sr1
        y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        z = host.resample(y, sr1, sr2)
        assert abs(len(z) - sr2) <= 2
        # frequency preserved: zero-crossing count ≈ 880
        zc = np.sum(np.diff(np.signbit(z[100:-100])) != 0)
        assert abs(zc - 880 * (len(z) - 200) / len(z)) < 20

    def test_bf16_frames_quality(self):
        """precision=DEFAULT stores istft frames in bf16 — spectral
        convergence must stay within a whisker of the f32 path."""
        y = chirp(n=HOP * 40)
        mag = jnp.abs(jaxdsp.stft(jnp.asarray(y), N_FFT, HOP))
        hi = jaxdsp.griffin_lim(mag, jax.random.PRNGKey(3), N_FFT, HOP, N_FFT,
                                n_iter=16, use_matmul=True,
                                precision=jax.lax.Precision.HIGHEST)
        lo = jaxdsp.griffin_lim(mag, jax.random.PRNGKey(3), N_FFT, HOP, N_FFT,
                                n_iter=16, use_matmul=True,
                                precision=jax.lax.Precision.DEFAULT)
        def err(out):
            m2 = jnp.abs(jaxdsp.stft(out, N_FFT, HOP))
            return float(jnp.linalg.norm(mag - m2) / jnp.linalg.norm(mag))
        e_hi, e_lo = err(hi), err(lo)
        assert e_lo < e_hi * 1.1 + 0.01, (e_hi, e_lo)
