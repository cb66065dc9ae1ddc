"""Learning-dynamics smoke test on the toy corpus through the REAL stack.

The full monotonic-attention emergence run lives in
``scripts/train_toy_e2e.py`` (2500 steps, documented in docs/PARITY.md);
this test keeps a CI-sized slice of it: the prepare→features→bucketing→
trainer chain must reduce both the total and the guided-attention loss
within ~120 optimizer steps on a corpus whose text↔audio alignment is
strictly monotonic by construction.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spoofsv_tpu.data.pipeline import BucketedLoader, TTSDataSource
from spoofsv_tpu.data.toy import (
    attention_monotonicity,
    generate_toy_corpus,
    synth_sentence,
    toy_config,
)
from spoofsv_tpu.data.vctk import prepare_vctk
from spoofsv_tpu.models import MelSyn
from spoofsv_tpu.train.loop import Trainer


class TestToyCorpus:
    def test_generator_layout_and_audio(self, tmp_path):
        root = str(tmp_path / "corpus")
        emb = str(tmp_path / "emb")
        spks = generate_toy_corpus(root, emb, n_speakers=2, utts_per_spk=4)
        assert len(spks) == 2
        for s in spks:
            wavs = os.listdir(os.path.join(root, "wav48", s))
            txts = os.listdir(os.path.join(root, "txt", s))
            assert len(wavs) == 4 and len(txts) == 4
            assert os.path.exists(os.path.join(emb, s + ".npy"))
        y = synth_sentence("abc", 22050, 1.0, np.random.default_rng(0))
        assert len(y) == 3 * int(0.093 * 22050)
        assert 0.1 < np.abs(y).max() <= 0.61

    def test_monotonicity_metric(self):
        att = np.zeros((5, 10))
        att[np.repeat(np.arange(5), 2), np.arange(10)] = 1.0  # perfect path
        m = attention_monotonicity(att, 5, 10)
        assert m["forward_frac"] == 1.0 and m["coverage"] == 1.0
        att2 = np.zeros((5, 10))
        att2[::-1][np.repeat(np.arange(5), 2), np.arange(10)] = 1.0  # reversed
        m2 = attention_monotonicity(att2, 5, 10)
        # dwell frames (equal argmax) count as forward; a reversed path with
        # 2-frame dwells has 4/9 backward steps
        assert m2["forward_frac"] < 0.6 < m["forward_frac"]


@pytest.mark.slow
class TestLearningDynamics:
    def test_losses_decrease_on_learnable_corpus(self, tmp_path):
        work = str(tmp_path)
        root = os.path.join(work, "corpus")
        emb = os.path.join(work, "emb")
        generate_toy_corpus(root, emb, n_speakers=2, utts_per_spk=16)
        cfg = toy_config(root, emb, work, hidden_dim=48, batch_size=8)
        prepare_vctk(cfg, verbose=False)
        source = TTSDataSource(cfg, mode="train",
                               spec_dir=os.path.join(work, "spec"))
        loader = BucketedLoader(source, cfg.batch_size, seed=0)
        model = MelSyn(vocab_len=cfg.vocab_len, condition=True,
                       spk_emb_dim=cfg.spk_emb_dim,
                       text_emb_dim=cfg.text_emb_dim,
                       freq_bins=cfg.mel.freq_bins, hidden_dim=cfg.hidden_dim)
        trainer = Trainer(cfg, model, "train_text2mel", ctime="toy-test",
                          validate_with_decode=False)
        key = jax.random.PRNGKey(0)
        first, last, att_first, att_last = [], [], [], []
        it, steps = 0, 120
        while it < steps:
            for batch in loader:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                if trainer.state is None:
                    trainer.init(jax.random.PRNGKey(0), batch)
                key, sub = jax.random.split(key)
                m = trainer.train_iteration(batch, sub)
                if it < 10:
                    first.append(m["loss"])
                    att_first.append(m["att"])
                if it >= steps - 10:
                    last.append(m["loss"])
                    att_last.append(m["att"])
                it += 1
                if it >= steps:
                    break
        assert np.mean(last) < np.mean(first) * 0.97, (
            np.mean(first), np.mean(last))
        assert np.mean(att_last) < np.mean(att_first), (
            np.mean(att_first), np.mean(att_last))
