"""Architecture parity vs the reference PyTorch models.

Builds the reference torch modules (imported from /root/reference, skipped if
absent), exports their randomly-initialized state_dicts through
``utils.torch_import``, and checks our JAX models produce the same outputs on
the same inputs. This pins the architecture bit-for-bit (up to float32
accumulation) — the strongest parity evidence available without trained
checkpoints.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def torch_models():
    import torch
    torch.manual_seed(0)
    from models.TTSModel import SSRN as TorchSSRN
    from models.TTSModel import melSyn as TorchMelSyn

    m1 = TorchMelSyn(vocab_len=34, condition=True, spkemb_dim=200,
                     textemb_dim=128, freq_bins=80, hidden_dim=64)
    m2 = TorchSSRN(freq_bins=80, output_bins=513, ssrn_dim=32)
    return m1, m2


class TestMelSynParity:
    def test_teacher_forced_forward_matches(self, torch_models):
        import torch

        from spoofsv_tpu.models import MelSyn
        from spoofsv_tpu.utils.torch_import import import_melsyn

        tm, _ = torch_models
        tm.train()
        B, T, N = 2, 13, 11
        rng = np.random.default_rng(0)
        mel = rng.uniform(0.05, 0.95, (B, 80, T)).astype(np.float32)
        text = rng.integers(1, 33, (B, 1, N)).astype(np.int64)
        spk = rng.normal(size=(B, 200, 1)).astype(np.float32)

        with torch.no_grad():
            y_t, a_t = tm(torch.from_numpy(mel), torch.from_numpy(text),
                          torch.from_numpy(spk))

        ours = MelSyn(vocab_len=34, condition=True, spk_emb_dim=200,
                      text_emb_dim=128, freq_bins=80, hidden_dim=64)
        params = import_melsyn(tm.state_dict())
        y_j, a_j = ours.apply(params, jnp.asarray(mel.transpose(0, 2, 1)),
                              jnp.asarray(text[:, 0, :]),
                              jnp.asarray(spk[:, :, 0]))
        np.testing.assert_allclose(np.asarray(y_j).transpose(0, 2, 1),
                                   y_t.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(a_j), a_t.numpy(), atol=2e-4)

    def test_ar_decode_matches_reference_inference(self, torch_models):
        """Our O(T) cached scan decode == the reference's O(T²) eval loop."""
        import torch

        from spoofsv_tpu.infer.decode import make_decoder
        from spoofsv_tpu.models import MelSyn
        from spoofsv_tpu.utils.torch_import import import_melsyn

        tm, _ = torch_models
        tm.eval()
        B, N, T = 2, 9, 7
        rng = np.random.default_rng(1)
        text = rng.integers(1, 33, (B, 1, N)).astype(np.int64)
        spk = rng.normal(size=(B, 200, 1)).astype(np.float32)

        with torch.no_grad():
            init = torch.zeros((B, 80, 1))
            Y, A, pma, K, V = tm(melspec=init, textid=torch.from_numpy(text),
                                 spkemb=torch.from_numpy(spk),
                                 pma=torch.zeros((B,)).long())
            inputs = torch.cat((init, Y), dim=-1)
            for _ in range(T - 1):
                Y, A, pma = tm(melspec=inputs, textid=None,
                               spkemb=torch.from_numpy(spk), K=K, V=V,
                               A_last=A, pma=pma)
                inputs = torch.cat((inputs, Y[:, :, -1:]), dim=-1)
        y_ref = Y.numpy()            # (B, 80, T)
        a_ref = A.numpy()            # (B, N, T)

        ours = MelSyn(vocab_len=34, condition=True, spk_emb_dim=200,
                      text_emb_dim=128, freq_bins=80, hidden_dim=64)
        params = import_melsyn(tm.state_dict())
        decode = make_decoder(ours, T)
        y_j, a_j, _ = decode(params, jnp.asarray(text[:, 0, :]),
                             jnp.asarray(spk[:, :, 0]))
        np.testing.assert_allclose(np.asarray(y_j).transpose(0, 2, 1), y_ref,
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(a_j), a_ref, atol=5e-4)


class TestSSRNParity:
    def test_forward_matches(self, torch_models):
        import torch

        from spoofsv_tpu.models import SSRN
        from spoofsv_tpu.utils.torch_import import import_ssrn

        _, ts = torch_models
        ts.eval()
        B, T = 2, 10
        rng = np.random.default_rng(2)
        mel = rng.uniform(0.05, 0.95, (B, 80, T)).astype(np.float32)
        with torch.no_grad():
            y_t = ts(torch.from_numpy(mel))
        ours = SSRN(freq_bins=80, output_bins=513, ssrn_dim=32)
        params = import_ssrn(ts.state_dict())
        y_j = ours.apply(params, jnp.asarray(mel.transpose(0, 2, 1)))
        np.testing.assert_allclose(np.asarray(y_j).transpose(0, 2, 1),
                                   y_t.numpy(), atol=2e-4)


class TestCriticParity:
    def test_meldisc_matches(self):
        import torch
        torch.manual_seed(1)
        from models.discriminator import melDisc as TorchMelDisc

        from spoofsv_tpu.models import MelDisc
        from spoofsv_tpu.utils.torch_import import import_critic

        td = TorchMelDisc(freq_bins=80, disc_dim=32)
        td.eval()
        B, T = 3, 64
        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, (B, 80, T)).astype(np.float32)
        with torch.no_grad():
            y_t = td(torch.from_numpy(x)).numpy().reshape(B)
        ours = MelDisc(disc_dim=32)
        params = import_critic(td.state_dict())
        y_j = ours.apply(params, jnp.asarray(x.transpose(0, 2, 1)),
                         deterministic=True)
        np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-4)


class TestGE2EParity:
    def test_embedder_matches(self):
        import torch
        torch.manual_seed(2)
        sys.path.insert(0, os.path.join(REF, "GE2E"))
        # the reference embedder reads a global yaml config at import; build an
        # equivalent torch LSTM stack directly instead.
        lstm = torch.nn.LSTM(40, 32, num_layers=2, batch_first=True)
        proj = torch.nn.Linear(32, 16)
        sd = {f"LSTM_stack.{k}": v for k, v in lstm.state_dict().items()}
        sd.update({f"projection.{k}": v for k, v in proj.state_dict().items()})

        rng = np.random.default_rng(4)
        x = rng.normal(size=(5, 12, 40)).astype(np.float32)
        with torch.no_grad():
            h, _ = lstm(torch.from_numpy(x))
            e_t = proj(h[:, -1])
            e_t = (e_t / e_t.norm(dim=1, keepdim=True)).numpy()

        from spoofsv_tpu.models import SpeechEmbedder
        from spoofsv_tpu.utils.torch_import import import_ge2e_embedder

        ours = SpeechEmbedder(hidden=32, num_layers=2, proj=16)
        params = import_ge2e_embedder({k: v for k, v in sd.items()})
        e_j = ours.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(e_j), e_t, atol=2e-4)


class TestDropoutVariantParity:
    def test_eval_mode_matches_base(self):
        """The dropout variant in eval mode == base model (dropout inactive);
        our dropout_rate flag must reproduce TTSModel_dropout's eval forward
        when fed its weights."""
        import torch
        torch.manual_seed(3)
        from models.TTSModel_dropout import melSyn as TorchMelSynDp

        from spoofsv_tpu.models import MelSyn
        from spoofsv_tpu.utils.torch_import import import_melsyn

        tm = TorchMelSynDp(vocab_len=34, condition=True, spkemb_dim=200,
                           textemb_dim=128, freq_bins=80, hidden_dim=48)
        tm.train()  # training branch of forward, but disable dropout layers:
        for m in tm.modules():
            if isinstance(m, torch.nn.Dropout):
                m.eval()
        B, T, N = 2, 9, 7
        rng = np.random.default_rng(5)
        mel = rng.uniform(0.05, 0.95, (B, 80, T)).astype(np.float32)
        text = rng.integers(1, 33, (B, 1, N)).astype(np.int64)
        spk = rng.normal(size=(B, 200, 1)).astype(np.float32)
        with torch.no_grad():
            y_t, a_t = tm(torch.from_numpy(mel), torch.from_numpy(text),
                          torch.from_numpy(spk))

        ours = MelSyn(vocab_len=34, condition=True, spk_emb_dim=200,
                      text_emb_dim=128, freq_bins=80, hidden_dim=48,
                      dropout_rate=0.05)
        params = import_melsyn(tm.state_dict())
        y_j, a_j = ours.apply(params, jnp.asarray(mel.transpose(0, 2, 1)),
                              jnp.asarray(text[:, 0, :]),
                              jnp.asarray(spk[:, :, 0]),
                              deterministic=True)
        np.testing.assert_allclose(np.asarray(y_j).transpose(0, 2, 1),
                                   y_t.numpy(), atol=3e-4)
        np.testing.assert_allclose(np.asarray(a_j), a_t.numpy(), atol=3e-4)
