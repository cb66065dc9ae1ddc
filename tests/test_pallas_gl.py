"""Parity tests for the fused Pallas Griffin-Lim kernel (interpret mode on CPU).

The reference implementation is :func:`spoofsv_tpu.dsp.jaxdsp.griffin_lim`
(itself librosa-parity-tested in test_dsp), fed the kernel's deterministic
hash phase init so both runs start from identical angles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spoofsv_tpu.dsp import jaxdsp
from spoofsv_tpu.ops.pallas_gl import (
    _fused_gl_phase,
    griffin_lim_fused,
    hash_phase_init,
)

# Interpret-mode parity tests: the comparators run eager jnp ops (incl. fft)
# that the experimental axon TPU backend leaves UNIMPLEMENTED — compiled-
# kernel behavior on real TPU is validated at pipeline level by scripts/bench_gl_fused.py
# and the end-to-end benches.
pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu",
    reason="CPU interpret-mode parity suite (axon backend lacks comparator ops)")


NFFT, HOP = 1024, 256


def _test_mag(B: int, T: int, seed: int = 0) -> jnp.ndarray:
    """Magnitude spectrogram of a harmonic-ish synthetic signal (so GL has
    realistic structure, not white noise)."""
    rng = np.random.default_rng(seed)
    L = HOP * (T - 1)
    t = np.arange(L) / 22050.0
    sigs = []
    for b in range(B):
        f0 = 110.0 * (1 + b)
        y = sum(np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6)) / k
                for k in range(1, 6))
        y += 0.1 * rng.normal(size=L)
        sigs.append(y * np.hanning(L))
    y = jnp.asarray(np.stack(sigs), jnp.float32)
    re, im = jaxdsp.stft_ri(y, NFFT, HOP, NFFT, use_matmul=False)
    mag = jnp.sqrt(re ** 2 + im ** 2)[:, :T, :]
    return mag.astype(jnp.float32)


def _xla_gl_with_hash_init(mag, n_iter, momentum=0.99):
    B, T, F = mag.shape
    seeds = jax.random.randint(jax.random.PRNGKey(0), (B,), 0,
                               np.iinfo(np.int32).max, dtype=jnp.int32)
    init = hash_phase_init(seeds, T, F)
    return jaxdsp.griffin_lim(mag, jax.random.PRNGKey(0), NFFT, HOP, NFFT,
                              n_iter=n_iter, momentum=momentum,
                              use_matmul=True,
                              precision=jax.lax.Precision.DEFAULT,
                              init_angles=init)


def _fused_gl(mag, n_iter, momentum=0.99, return_angles=False,
              int8_fwd=False):
    B, T, F = mag.shape
    seeds = jax.random.randint(jax.random.PRNGKey(0), (B,), 0,
                               np.iinfo(np.int32).max, dtype=jnp.int32)
    ang_re, ang_im, audio = _fused_gl_phase(mag.astype(jnp.bfloat16), seeds,
                                            NFFT, HOP, n_iter, momentum, True,
                                            int8_fwd)
    if return_angles:
        return ang_re, ang_im, audio
    return audio


def _rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def _spectral_err(audio, mag):
    re, im = jaxdsp.stft_ri(audio, NFFT, HOP, NFFT, use_matmul=False)
    got = jnp.sqrt(re ** 2 + im ** 2)[:, : mag.shape[1], :]
    return float(jnp.linalg.norm(got - mag) / jnp.linalg.norm(mag))


class TestFusedGriffinLim:
    @pytest.mark.parametrize("T", [20, 150])
    def test_single_iteration_matches_xla(self, T):
        """One projection step (momentum 0): fused kernel == XLA path within
        bf16 tolerance, including the wss/reflect edge frames."""
        mag = _test_mag(2, T, seed=1)
        a_x = _xla_gl_with_hash_init(mag, n_iter=1, momentum=0.0)
        a_f = _fused_gl(mag, n_iter=1, momentum=0.0)
        assert a_x.shape == a_f.shape == (2, HOP * (T - 1))
        assert _rel_l2(a_f, a_x) < 0.03

    def test_multi_iteration_with_momentum(self):
        mag = _test_mag(2, 40, seed=2)
        a_x = _xla_gl_with_hash_init(mag, n_iter=4, momentum=0.99)
        a_f = _fused_gl(mag, n_iter=4, momentum=0.99)
        assert _rel_l2(a_f, a_x) < 0.06

    def test_convergence_quality(self):
        """Both implementations converge to comparable spectral error."""
        mag = _test_mag(1, 80, seed=3)
        a_x = _xla_gl_with_hash_init(mag, n_iter=16)
        a_f = _fused_gl(mag, n_iter=16)
        e_x = _spectral_err(a_x, mag)
        e_f = _spectral_err(a_f, mag)
        assert e_f < e_x + 0.02, (e_f, e_x)
        assert e_f < 0.35, e_f

    def test_wrapper_fallback_geometry(self):
        """hop != n_fft/4 falls back to the XLA implementation."""
        mag = _test_mag(1, 20, seed=4)[..., :257]
        out = griffin_lim_fused(mag, jax.random.PRNGKey(0), 512, 128, 512,
                                n_iter=2)
        assert out.shape == (1, 128 * 19)
        assert np.isfinite(np.asarray(out)).all()

    def test_padding_tile_boundary(self):
        """T an exact multiple of the tile size exercises the no-pad path."""
        mag = _test_mag(1, 128, seed=5)
        a_x = _xla_gl_with_hash_init(mag, n_iter=1, momentum=0.0)
        a_f = _fused_gl(mag, n_iter=1, momentum=0.0)
        assert _rel_l2(a_f, a_x) < 0.03

    @pytest.mark.parametrize("T", [40, 140])
    def test_epilogue_matches_reference_istft(self, T):
        """The kernel's in-VMEM overlap-add epilogue == istft_ri(mag·ang)
        (same angles, incl. the wss edge chunks at both ends). T=140 crosses
        the TT=128 tile boundary of the epilogue loop."""
        mag = _test_mag(2, T, seed=6)
        ang_re, ang_im, audio = _fused_gl(mag, n_iter=2, return_angles=True)
        m = mag.astype(jnp.bfloat16).astype(jnp.float32)
        ref = jaxdsp.istft_ri(m * ang_re.astype(jnp.float32),
                              m * ang_im.astype(jnp.float32),
                              NFFT, HOP, NFFT, use_matmul=False)
        assert _rel_l2(audio, ref) < 0.02


    def test_advance_init_matches_xla(self):
        """init_mode='advance': kernel phase init == gl_advance_angles, so
        one projection step matches the XLA path fed the same angles."""
        mag = _test_mag(2, 40, seed=7)
        B, T, F = mag.shape
        a_re, a_im = jaxdsp.gl_advance_angles(T, F, NFFT, HOP,
                                              dtype=jnp.bfloat16)
        ia = (jnp.broadcast_to(a_re, mag.shape),
              jnp.broadcast_to(a_im, mag.shape))
        a_x = jaxdsp.griffin_lim(mag, jax.random.PRNGKey(0), NFFT, HOP, NFFT,
                                 n_iter=1, momentum=0.0, use_matmul=True,
                                 precision=jax.lax.Precision.DEFAULT,
                                 init_angles=ia)
        seeds = jnp.zeros((B,), jnp.int32)
        _, _, a_f = _fused_gl_phase(mag.astype(jnp.bfloat16), seeds, NFFT,
                                    HOP, 1, 0.0, True, False,
                                    init_mode="advance")
        assert _rel_l2(a_f, a_x) < 0.03

    def test_advance_init_quality_and_determinism(self):
        """Advance init must not be worse than random at equal iterations
        (measured: it reaches random-64 quality by 24 iters on the real
        pipeline distributions — see docs/PARITY.md), and is deterministic
        (seed-independent)."""
        mag = _test_mag(1, 80, seed=8)
        e_rand = _spectral_err(_fused_gl(mag, n_iter=8), mag)
        seeds = jnp.asarray([1234], jnp.int32)
        _, _, a1 = _fused_gl_phase(mag.astype(jnp.bfloat16), seeds, NFFT,
                                   HOP, 8, 0.99, True, False,
                                   init_mode="advance")
        _, _, a2 = _fused_gl_phase(mag.astype(jnp.bfloat16),
                                   seeds * 0 + 77, NFFT, HOP, 8, 0.99, True,
                                   False, init_mode="advance")
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        e_adv = _spectral_err(a1, mag)
        assert e_adv < e_rand + 0.02, (e_adv, e_rand)

    def test_spsi_init_matches_xla(self):
        """init_mode='spsi': the kernel consumes externally computed
        gl_spsi_angles, so one projection step matches the XLA path fed the
        same angles."""
        mag = _test_mag(2, 40, seed=11)
        ia = jaxdsp.gl_spsi_angles(mag, NFFT, HOP)
        a_x = jaxdsp.griffin_lim(mag, jax.random.PRNGKey(0), NFFT, HOP, NFFT,
                                 n_iter=1, momentum=0.0, use_matmul=True,
                                 precision=jax.lax.Precision.DEFAULT,
                                 init_angles=ia)
        a_f = griffin_lim_fused(mag, jax.random.PRNGKey(0), NFFT, HOP, NFFT,
                                n_iter=1, momentum=0.0, interpret=True,
                                init_mode="spsi")
        assert _rel_l2(a_f, a_x) < 0.03

    def test_spsi_quality_beats_advance_at_low_iters(self):
        """The instantaneous-frequency init converges faster on harmonic
        audio: measured spsi@4 ≈ half the spectral error of advance@24 on
        this distribution, and GL16-spsi == GL24-advance == random-64 on
        real-audio magnitudes (scripts/exp_gl_init.py). Pin the weak form."""
        mag = _test_mag(2, 80, seed=12)
        key = jax.random.PRNGKey(0)
        e = {}
        for mode, it in (("advance", 8), ("spsi", 8)):
            a = griffin_lim_fused(mag, key, NFFT, HOP, NFFT, n_iter=it,
                                  interpret=True, init_mode=mode)
            e[mode] = _spectral_err(a, mag)
        assert e["spsi"] < e["advance"] + 0.005, e

    def test_spsi_angles_kernel_matches_xla(self):
        """The VMEM-resident SPSI angle kernel (gl_spsi_angles_fused) must
        reproduce jaxdsp.gl_spsi_angles: same f32 log/parabola math; only
        the cumsum association order differs (shift-doubling vs XLA scan,
        measured ≤ 2e-6 cycles here), plus the bf16 output cast. The cast
        makes the kernel's (re, im) pair slightly non-unit (up to ~3e-3 of
        norm — the r4 version of this test folded that into an unnormalized
        dot product and "failed" at 0.99731 on pure quantization), so bound
        the two effects separately: the *phase* agreement on the normalized
        pair (what GL's projection actually consumes — it renormalizes every
        iteration), and the norm deviation at the bf16 rounding scale."""
        from spoofsv_tpu.ops.pallas_gl import gl_spsi_angles_fused

        mag = _test_mag(3, 70, seed=21)
        re_x, im_x = jaxdsp.gl_spsi_angles(mag, NFFT, HOP)
        re_k, im_k = gl_spsi_angles_fused(mag, NFFT, HOP, interpret=True)
        re_k = np.asarray(re_k, np.float32)
        im_k = np.asarray(im_k, np.float32)
        np.testing.assert_allclose(re_k, np.asarray(re_x), atol=2e-2)
        np.testing.assert_allclose(im_k, np.asarray(im_x), atol=2e-2)
        norm = np.sqrt(re_k ** 2 + im_k ** 2)
        np.testing.assert_allclose(norm, 1.0, atol=5e-3)
        cos_dphi = (re_k * np.asarray(re_x) + im_k * np.asarray(im_x)) / norm
        assert float(np.min(cos_dphi)) > 0.99995, float(np.min(cos_dphi))

    def test_spsi_angles_flat_falls_back_to_advance(self):
        """Structureless (flat) magnitudes have no concave log-mag triples,
        so every δ gates to 0 and the SPSI init degenerates to the plain
        advance init exactly."""
        mag = jnp.full((1, 30, 513), 0.25, jnp.float32)
        re, im = jaxdsp.gl_spsi_angles(mag, NFFT, HOP)
        b_re, b_im = jaxdsp.gl_advance_angles(30, 513, NFFT, HOP)
        np.testing.assert_allclose(np.asarray(re[0]), np.asarray(b_re),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(im[0]), np.asarray(b_im),
                                   atol=1e-6)

    def test_vocoder_honors_init_knob(self):
        """make_vocoder routes Config.tpu.griffin_lim_init to the GL call:
        'advance' output is key-independent, 'random' is not."""
        from spoofsv_tpu.config import Config
        from spoofsv_tpu.infer.synthesize import make_vocoder

        import dataclasses

        mag = _test_mag(1, 24, seed=9)
        lin = (mag / jnp.max(mag)) ** 0.6   # pipeline-normalized input
        tpu_a = dataclasses.replace(Config().tpu, griffin_lim_init="advance",
                                    griffin_lim_iters=4)
        tpu_r = dataclasses.replace(Config().tpu, griffin_lim_init="random",
                                    griffin_lim_iters=4)
        cfg_a = Config().replace(tpu=tpu_a)
        cfg_r = Config().replace(tpu=tpu_r)
        va = make_vocoder(cfg_a)
        vr = make_vocoder(cfg_r)
        y1 = np.asarray(va(lin, jax.random.PRNGKey(0)))
        y2 = np.asarray(va(lin, jax.random.PRNGKey(9)))
        np.testing.assert_array_equal(y1, y2)
        r1 = np.asarray(vr(lin, jax.random.PRNGKey(0)))
        r2 = np.asarray(vr(lin, jax.random.PRNGKey(9)))
        assert np.abs(r1 - r2).max() > 0
        assert np.isfinite(y1).all()

    def test_int8_fwd_converges(self):
        """int8 forward-DFT variant (production default on TPU): GL's
        projection absorbs the quantization — spectral convergence within a
        small margin of the bf16 path (waveforms differ sample-level; GL
        solutions are non-unique)."""
        mag = _test_mag(1, 80, seed=3)
        a_f = _fused_gl(mag, n_iter=16)
        a_q = _fused_gl(mag, n_iter=16, int8_fwd=True)
        e_f = _spectral_err(a_f, mag)
        e_q = _spectral_err(a_q, mag)
        assert e_q < e_f + 0.03, (e_q, e_f)
        assert np.isfinite(np.asarray(a_q)).all()
