"""CLI surface tests: flag compatibility and an end-to-end training smoke
through the real `main` entry point on the miniature corpus."""

import json
import os

import numpy as np
import pytest


class TestFlagSurface:
    @pytest.mark.parametrize("module", [
        "spoofsv_tpu.cli.main", "spoofsv_tpu.cli.metagen",
        "spoofsv_tpu.cli.generate_test_utterances", "spoofsv_tpu.cli.ge2e",
        "spoofsv_tpu.cli.ivector", "spoofsv_tpu.cli.antispoof",
        "spoofsv_tpu.cli.curve",
    ])
    def test_help_exits_zero(self, module, capsys):
        import importlib

        mod = importlib.import_module(module)
        with pytest.raises(SystemExit) as e:
            mod.main(["--help"])
        assert e.value.code == 0

    def test_main_reference_flags_accepted(self, capsys):
        """The reference surface (main.py:10-16) parses: positional step,
        -P, -R, -C, --adversarial, --save_spectrogram, -T."""
        from spoofsv_tpu.cli.main import main

        with pytest.raises(SystemExit):
            main(["train_text2mel", "-P", "bogus", "-T", "x"])  # bad choice → exit 2


class TestTrainingSmoke:
    def test_ordinary_training_via_cli(self, mini_corpus, tmp_path, monkeypatch):
        """Drive main('train_text2mel') on the mini corpus for a few steps."""
        from spoofsv_tpu.cli import main as cli_main

        cfg_dict = mini_corpus.replace(
            src_root_dir=str(tmp_path) + "/",
            hidden_dim=16, text_emb_dim=8, ssrn_dim=8, disc_dim=8,
            batch_size=2, val_every_iter=4, max_epochs=6,
        ).to_reference_dict()
        # the mini corpus has 200-dim embeddings; keep dims matching
        cfg_path = tmp_path / "config.json"
        cfg_path.write_text(json.dumps(cfg_dict))

        cli_main.main(["train_text2mel", "-C", str(cfg_path), "-T", "smoke",
                       "--max_iterations", "5", "--masked_loss"])

        ckpt_base = os.path.join(str(tmp_path), "checkpoints", "conditional",
                                 "not_adversarial", "smoke")
        entries = os.listdir(ckpt_base)
        assert any(e.startswith("text2mel_iteration_") for e in entries)
        metrics = [json.loads(l) for l in
                   open(os.path.join(ckpt_base, "metrics.jsonl"))]
        train_steps = [m for m in metrics if m.get("split") == "train"]
        assert len(train_steps) >= 5
        assert all(np.isfinite(m["loss"]) for m in train_steps)

    def test_mesh_training_via_cli(self, mini_corpus, tmp_path):
        """Data-parallel training through the REAL CLI on the 8-device mesh
        (--mesh 8 + --device_data on → sharded DeviceReplayLoader batches):
        the production path the reference gates on MULTI_GPU
        (train/ordinary.py:165-173, config.json:34)."""
        from spoofsv_tpu.cli import main as cli_main

        cfg_dict = mini_corpus.replace(
            src_root_dir=str(tmp_path) + "/",
            hidden_dim=16, text_emb_dim=8, ssrn_dim=8, disc_dim=8,
            batch_size=4, val_every_iter=4, max_epochs=20,
        ).to_reference_dict()
        cfg_path = tmp_path / "config.json"
        cfg_path.write_text(json.dumps(cfg_dict))

        # mini corpus has 4 train examples → 4-wide batches over 4 shards
        cli_main.main(["train_text2mel", "-C", str(cfg_path), "-T", "mesh8",
                       "--max_iterations", "5", "--mesh", "4",
                       "--device_data", "on"])

        ckpt_base = os.path.join(str(tmp_path), "checkpoints", "conditional",
                                 "not_adversarial", "mesh8")
        metrics = [json.loads(l) for l in
                   open(os.path.join(ckpt_base, "metrics.jsonl"))]
        train_steps = [m for m in metrics if m.get("split") == "train"]
        assert len(train_steps) >= 4
        assert all(np.isfinite(m["loss"]) for m in train_steps)
        # validation (AR decode with replicated params) + checkpoint ran
        assert any(e.startswith("text2mel_iteration_")
                   for e in os.listdir(ckpt_base))

    def test_adversarial_ssrn_via_cli(self, mini_corpus, tmp_path):
        from spoofsv_tpu.cli import main as cli_main

        cfg_dict = mini_corpus.replace(
            src_root_dir=str(tmp_path) + "/",
            hidden_dim=16, text_emb_dim=8, ssrn_dim=8, disc_dim=8,
            batch_size=2, val_every_iter=100, max_epochs=1,
        ).to_reference_dict()
        cfg_path = tmp_path / "config.json"
        cfg_path.write_text(json.dumps(cfg_dict))

        cli_main.main(["train_ssrn", "-C", str(cfg_path), "-T", "smoke_adv",
                       "--adversarial", "--max_iterations", "3"])
        base = os.path.join(str(tmp_path), "checkpoints", "conditional",
                            "adversarial", "smoke_adv")
        assert os.path.exists(os.path.join(base, "metrics.jsonl"))


class TestGraftEntry:
    def test_entry_compiles_single_device(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        import jax

        fn, args = g.entry()
        y, a = jax.jit(fn)(*args)
        assert y.shape[0] == args[0].shape[0]
        assert np.isfinite(np.asarray(a)).all()
