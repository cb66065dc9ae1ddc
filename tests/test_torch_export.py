"""torch_export: exact inverse of torch_import (export → import round trip),
plus the reference checkpoint file schema."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from spoofsv_tpu.models import Critic1D, MelSyn, SSRN, SpeechEmbedder
from spoofsv_tpu.train.steps import shift_right
from spoofsv_tpu.utils import torch_export, torch_import


def _assert_tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _assert_tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0,
                                   rtol=0, err_msg=path)


class TestRoundTrip:
    def test_melsyn(self, rng):
        m = MelSyn(vocab_len=34, condition=True, spk_emb_dim=10,
                   text_emb_dim=8, freq_bins=80, hidden_dim=16)
        text = jnp.asarray(rng.integers(1, 30, (2, 7)), jnp.int32)
        spk = jnp.asarray(rng.normal(size=(2, 10)), jnp.float32)
        mel = jnp.asarray(rng.uniform(0.1, 0.9, (2, 5, 80)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), shift_right(mel), text, spk)
        sd = torch_export.export_melsyn(params)
        back = torch_import.import_melsyn(sd)
        _assert_tree_equal(jax.tree.map(np.asarray, dict(params)), back)

    def test_ssrn(self, rng):
        s = SSRN(freq_bins=80, output_bins=513, ssrn_dim=16)
        mel = jnp.asarray(rng.uniform(0.1, 0.9, (2, 4, 80)), jnp.float32)
        params = s.init(jax.random.PRNGKey(0), mel)
        back = torch_import.import_ssrn(torch_export.export_ssrn(params))
        _assert_tree_equal(jax.tree.map(np.asarray, dict(params)), back)

    def test_critic(self, rng):
        c = Critic1D(disc_dim=16)
        x = jnp.asarray(rng.normal(size=(2, 16, 80)), jnp.float32)
        params = c.init(jax.random.PRNGKey(0), x)
        back = torch_import.import_critic(torch_export.export_critic(params))
        _assert_tree_equal(jax.tree.map(np.asarray, dict(params)), back)

    def test_ge2e_embedder(self, rng):
        e = SpeechEmbedder(hidden=24, num_layers=3, proj=12)
        x = jnp.asarray(rng.normal(size=(4, 10, 40)), jnp.float32)
        params = e.init(jax.random.PRNGKey(0), x)
        back = torch_import.import_ge2e_embedder(
            torch_export.export_ge2e_embedder(params))
        _assert_tree_equal(jax.tree.map(np.asarray, dict(params)), back)


class TestCheckpointFile:
    def test_reference_schema_roundtrip(self, rng, tmp_path):
        """Written file follows the reference checkpoint schema
        (train/ordinary.py:271-284) and loads through the framework's own
        .tar.pth loader (utils.checkpoints.load_generator_params path)."""
        s = SSRN(freq_bins=80, output_bins=513, ssrn_dim=16)
        mel = jnp.asarray(rng.uniform(0.1, 0.9, (2, 4, 80)), jnp.float32)
        params = s.init(jax.random.PRNGKey(0), mel)
        path = os.path.join(tmp_path, "ssrn_iteration_7.tar.pth")
        torch_export.save_reference_checkpoint(
            path, torch_export.export_ssrn(params), epoch=1, iteration=7)

        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        assert ckpt["epoch"] == 1 and ckpt["iteration"] == 7
        assert "model_state_dict" in ckpt
        back = torch_import.import_ssrn(path)
        _assert_tree_equal(jax.tree.map(np.asarray, dict(params)), back)

        # exported weights drive the model to the same output
        y0 = s.apply(params, mel)
        y1 = s.apply(back, mel)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   atol=1e-6, rtol=1e-6)


class TestExportCLI:
    def test_critic_from_adversarial_trainer_checkpoint(self, rng, tmp_path):
        """spoofsv-export --kind critic must read AdvTrainState.disc_params
        (regression: it used to route through load_generator_params and
        KeyError on the generator tree)."""
        import orbax.checkpoint as ocp

        from spoofsv_tpu.cli import export as export_cli

        c = Critic1D(disc_dim=16)
        x = jnp.asarray(rng.normal(size=(2, 16, 80)), jnp.float32)
        params = c.init(jax.random.PRNGKey(0), x)
        ckpt_dir = os.path.join(tmp_path, "text2mel_iteration_5")
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(ckpt_dir, {"disc_params": params,
                                  "gen_params": {"params": {}},
                                  "step": np.int32(5)})
        out = os.path.join(tmp_path, "critic.tar.pth")
        export_cli.main(["--ckpt", ckpt_dir, "--kind", "critic", "--out", out])

        import torch

        saved = torch.load(out, map_location="cpu", weights_only=False)
        assert "disc_state_dict" in saved
        back = torch_import.import_critic(out)
        _assert_tree_equal(jax.tree.map(np.asarray, dict(params)), back)

    def test_critic_tar_pth_roundtrip(self, rng, tmp_path):
        from spoofsv_tpu.cli import export as export_cli

        c = Critic1D(disc_dim=16)
        x = jnp.asarray(rng.normal(size=(2, 16, 80)), jnp.float32)
        params = c.init(jax.random.PRNGKey(0), x)
        src = os.path.join(tmp_path, "ref_critic.tar.pth")
        torch_export.save_reference_checkpoint(
            src, torch_export.export_critic(params), key="disc_state_dict")
        out = os.path.join(tmp_path, "again.tar.pth")
        export_cli.main(["--ckpt", src, "--kind", "critic", "--out", out])
        back = torch_import.import_critic(out)
        _assert_tree_equal(jax.tree.map(np.asarray, dict(params)), back)
