"""Data-parallel synthesis on the 8-device CPU mesh.

The inference analog of the reference's DataParallel wrap
(``synthesize.py:75-77``): batch sharded over the mesh's ``data`` axis,
params replicated, the whole fused decode→SSRN→Griffin-Lim program
propagating the sharding with no collectives (every op is per-sample).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spoofsv_tpu.config import Config
from spoofsv_tpu.infer.synthesize import Synthesizer
from spoofsv_tpu.models import MelSyn, SSRN
from spoofsv_tpu.parallel.mesh import make_mesh
from spoofsv_tpu.train.steps import shift_right


def _tiny_setup(B=8, N=12, T=8):
    cfg = Config().replace(hidden_dim=16, text_emb_dim=8, ssrn_dim=16,
                           spk_emb_dim=10)
    dt = jnp.float32
    melsyn = MelSyn(vocab_len=cfg.vocab_len, condition=True,
                    spk_emb_dim=cfg.spk_emb_dim, text_emb_dim=cfg.text_emb_dim,
                    freq_bins=cfg.mel.freq_bins, hidden_dim=cfg.hidden_dim,
                    dtype=dt)
    ssrn = SSRN(freq_bins=cfg.mel.freq_bins, output_bins=cfg.lin_bins,
                ssrn_dim=cfg.ssrn_dim, dtype=dt)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, cfg.vocab_len - 1, (B, N)), jnp.int32)
    spk = jnp.asarray(rng.normal(size=(B, cfg.spk_emb_dim)), jnp.float32)
    mel_ex = jnp.asarray(rng.uniform(0.05, 0.95, (B, 4, cfg.mel.freq_bins)),
                         jnp.float32)
    key = jax.random.PRNGKey(0)
    p1 = melsyn.init(key, shift_right(mel_ex), text, spk)
    p2 = ssrn.init(key, mel_ex)
    return cfg, melsyn, ssrn, p1, p2, text, spk, T


class TestDataParallelSynthesizer:
    @pytest.mark.parametrize("init_mode", ["advance", "spsi"])
    def test_sharded_matches_single_device(self, init_mode):
        """Parametrized over GL init modes so the LOOSE audio bound applies
        only where its justification holds (ADVICE r4): the spsi init
        computes starting phases from the magnitudes, folding per-shard
        conv vectorization noise (~2e-5 on mel) into the phase trajectory;
        the advance init is magnitude-independent, so its sharded audio
        must stay within plain float-noise bounds — a genuine sharding
        regression can't hide behind the spsi rationale."""
        import dataclasses

        cfg, melsyn, ssrn, p1, p2, text, spk, T = _tiny_setup()
        cfg = cfg.replace(tpu=dataclasses.replace(
            cfg.tpu, griffin_lim_init=init_mode))
        key = jax.random.PRNGKey(7)

        single = Synthesizer(cfg, melsyn, ssrn, p1, p2, n_frames=T, gl_iters=3)
        a0, m0, at0 = single(text, spk, key)

        mesh = make_mesh(8)
        sharded = Synthesizer(cfg, melsyn, ssrn, p1, p2, n_frames=T,
                              gl_iters=3, mesh=mesh)
        a1, m1, at1 = sharded(text, spk, key)

        # batch actually sharded: one row per device
        assert len(a1.sharding.device_set) == 8
        shard_rows = {s.data.shape[0] for s in a1.addressable_shards}
        assert shard_rows == {1}

        np.testing.assert_allclose(np.asarray(m0), np.asarray(m1),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(at0), np.asarray(at1),
                                   atol=2e-5, rtol=1e-4)
        a0n, a1n = np.asarray(a0), np.asarray(a1)
        if init_mode == "spsi":
            # GL converges to a marginally different (equally valid) phase
            # solution when the init integrates the conv noise (frame
            # cumsum); observed max |Δ| ≈ 1.8e-3 at 3 iters.
            np.testing.assert_allclose(a0n, a1n, atol=1e-2)
            assert np.median(np.abs(a0n - a1n)) < 5e-3
        else:
            # magnitude-independent init: tight r3-era bounds
            np.testing.assert_allclose(a0n, a1n, atol=5e-4)
            assert np.median(np.abs(a0n - a1n)) < 2e-4

    @pytest.mark.parametrize("init_mode", ["advance", "spsi"])
    def test_shard_map_fused_kernels_match_single_device(self, init_mode):
        """The fused Pallas decode + GL kernels under a mesh: Synthesizer
        wraps the whole per-sample pipeline in shard_map over the data axis
        (pallas_call is not pjit-auto-partitionable), with GL seeds drawn
        globally — sharded audio must equal single-device audio. Closes the
        r2 'fused decode and DP synthesis are mutually exclusive' gap.
        Parametrized over GL init modes (ADVICE r4): only spsi earns the
        loose audio bound (its init folds per-shard conv noise into the
        starting phases); advance keeps the tighter bound."""
        import dataclasses

        cfg, melsyn, ssrn, p1, p2, text, spk, T = _tiny_setup()
        cfg = cfg.replace(tpu=dataclasses.replace(
            cfg.tpu, decode_impl="pallas", griffin_lim_impl="pallas",
            griffin_lim_init=init_mode))
        key = jax.random.PRNGKey(7)

        single = Synthesizer(cfg, melsyn, ssrn, p1, p2, n_frames=T, gl_iters=3)
        assert not single._shard_map
        a0, m0, at0 = single(text, spk, key)

        mesh = make_mesh(8)
        sharded = Synthesizer(cfg, melsyn, ssrn, p1, p2, n_frames=T,
                              gl_iters=3, mesh=mesh)
        assert sharded._shard_map
        a1, m1, at1 = sharded(text, spk, key)

        assert len(a1.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(m0), np.asarray(m1),
                                   atol=2e-5, rtol=1e-4)
        # audio: GL's iterative phase recovery amplifies the per-shard float
        # vectorization noise in the upstream convs (mel differs by ~2e-5 at
        # B=1-per-device vs B=8); seeds are shared so the phase TRAJECTORY is
        # the same — bound the amplified noise rather than demand bitwise
        a0n, a1n = np.asarray(a0), np.asarray(a1)
        if init_mode == "spsi":
            # spsi folds the conv noise into the starting phases, lifting
            # the median to the ~5e-3 scale of the dedicated spsi test below
            np.testing.assert_allclose(a0n, a1n, atol=4e-2)
            assert np.median(np.abs(a0n - a1n)) < 5e-3
        else:
            # advance: GL amplifies only trajectory noise — 38/63k samples
            # sat just above 2e-2 at max 0.024 when this was measured, but
            # the median stays at plain float-noise scale
            np.testing.assert_allclose(a0n, a1n, atol=2.5e-2)
            assert np.median(np.abs(a0n - a1n)) < 1e-3

    def test_shard_map_spsi_init_matches_single_device(self):
        """griffin_lim_init='spsi' under the shard_map DP pipeline: the init
        angles are computed per-shard from per-sample magnitudes (no
        cross-shard deps), so sharded audio must match single-device."""
        import dataclasses

        cfg, melsyn, ssrn, p1, p2, text, spk, T = _tiny_setup()
        cfg = cfg.replace(tpu=dataclasses.replace(
            cfg.tpu, decode_impl="pallas", griffin_lim_impl="pallas",
            griffin_lim_init="spsi"))
        key = jax.random.PRNGKey(7)

        single = Synthesizer(cfg, melsyn, ssrn, p1, p2, n_frames=T, gl_iters=3)
        a0 = np.asarray(single(text, spk, key)[0])

        mesh = make_mesh(8)
        sharded = Synthesizer(cfg, melsyn, ssrn, p1, p2, n_frames=T,
                              gl_iters=3, mesh=mesh)
        assert sharded._shard_map
        a1 = np.asarray(sharded(text, spk, key)[0])
        # looser than the advance-init bound: the SPSI init is magnitude-
        # dependent, and its frame cumsum integrates the ~2e-5 per-shard conv
        # vectorization noise into the starting phases — GL then converges to
        # a marginally different (equally valid) phase solution.
        np.testing.assert_allclose(a0, a1, atol=4e-2)
        assert np.median(np.abs(a0 - a1)) < 5e-3

    def test_bench_mesh_flag_throughput_smoke(self):
        """The --mesh bench path: repeated sharded batches execute and
        return finite audio (throughput measured on real multi-chip HW)."""
        cfg, melsyn, ssrn, p1, p2, text, spk, T = _tiny_setup(B=16)
        mesh = make_mesh(8)
        syn = Synthesizer(cfg, melsyn, ssrn, p1, p2, n_frames=T,
                          gl_iters=2, mesh=mesh)
        for i in range(3):
            audio, _, _ = syn(text, spk, jax.random.PRNGKey(i))
            chk = float(jnp.sum(jnp.abs(audio)))
            assert np.isfinite(chk) and chk > 0
