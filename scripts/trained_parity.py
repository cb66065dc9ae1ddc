#!/usr/bin/env python
"""Trained-checkpoint cross-framework AR parity (VERDICT r4 #5).

Round-trips the TRAINED campaign Text2Mel/SSRN through the torch exporter
(``utils/torch_export.py``), loads the state dicts into the ACTUAL reference
modules (``/root/reference/models/TTSModel.py``), runs the reference's own
inference branch (``TTSModel.py:275-300`` — the O(T²) full-prefix eval loop
with forced monotonic attention) against our fused scan decode, and pins the
mel/attention deltas at the PARITY_TPU.json thresholds (mel ≤ 0.05,
attn ≤ 0.02 at f32/T=64 — beyond that frame count AR-feedback chaos
amplifies ulp noise; see PARITY_TPU.json bf16_full_rollout_context).

Random-init architecture parity already lives in tests/test_torch_parity.py;
this script adds the *trained-weights* leg — proving a user can export the
campaign checkpoint to the reference framework and get the same speech.

Also verifies export→import is the identity on the trained pytree, and that
``save_reference_checkpoint`` emits a file the reference's resume branch
(train/ordinary.py:185-197) can read (model + optimizer_state_dict +
loss_val_log keys).

Usage:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/trained_parity.py \
      [--root /root/repo/_campaign_r5] [--frames 64] [--batch 4]

Writes docs/TRAINED_PARITY.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import numpy as np

sys.path.insert(0, os.path.join(REPO, "scripts"))
from _benchlib import find_campaign_ckpt  # noqa: E402

OUT = os.path.join(REPO, "docs", "TRAINED_PARITY.json")


def parse_args():
    ps = argparse.ArgumentParser()
    ps.add_argument("--root", default=os.path.join(REPO, "_campaign_r5"))
    ps.add_argument("--frames", type=int, default=64)
    ps.add_argument("--batch", type=int, default=4)
    ps.add_argument("--mel_threshold", type=float, default=0.05)
    ps.add_argument("--attn_threshold", type=float, default=0.02)
    return ps.parse_args()


def tree_maxdiff(a, b) -> float:
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb), (len(la), len(lb))
    return max(float(np.max(np.abs(np.asarray(x, np.float32)
                                   - np.asarray(y, np.float32))))
               for x, y in zip(la, lb))


def main():
    args = parse_args()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        _xb._clear_backends()
    import jax.numpy as jnp
    import torch

    from models.TTSModel import SSRN as TorchSSRN          # reference modules
    from models.TTSModel import melSyn as TorchMelSyn
    from spoofsv_tpu.config import Config
    from spoofsv_tpu.data.text import encode_texts
    from spoofsv_tpu.infer.decode import make_decoder
    from spoofsv_tpu.models import MelSyn, SSRN
    from spoofsv_tpu.utils import torch_export, torch_import
    from spoofsv_tpu.utils.checkpoints import load_generator_params

    cfg = Config.from_reference_dict(
        json.load(open(os.path.join(args.root, "config.json"))))
    t2m_ck = find_campaign_ckpt(args.root, "text2mel")
    ssrn_ck = find_campaign_ckpt(args.root, "ssrn")
    print(f"[trained_parity] text2mel: {t2m_ck}")
    print(f"[trained_parity] ssrn:     {ssrn_ck}")

    melsyn = MelSyn(vocab_len=cfg.vocab_len, condition=True,
                    spk_emb_dim=cfg.spk_emb_dim,
                    text_emb_dim=cfg.text_emb_dim,
                    freq_bins=cfg.mel.freq_bins, hidden_dim=cfg.hidden_dim)
    ssrn = SSRN(freq_bins=cfg.mel.freq_bins, output_bins=cfg.lin_bins,
                ssrn_dim=cfg.ssrn_dim)
    p1 = load_generator_params(t2m_ck, melsyn, cfg, kind="text2mel")
    p2 = load_generator_params(ssrn_ck, ssrn, cfg, kind="ssrn")

    # ---- export to the reference schema; strict load IS a parity check ----
    sd1 = torch_export.export_melsyn(p1)
    sd2 = torch_export.export_ssrn(p2)
    tm = TorchMelSyn(vocab_len=cfg.vocab_len, condition=True,
                     spkemb_dim=cfg.spk_emb_dim,
                     textemb_dim=cfg.text_emb_dim,
                     freq_bins=cfg.mel.freq_bins, hidden_dim=cfg.hidden_dim)
    ts = TorchSSRN(freq_bins=cfg.mel.freq_bins, output_bins=cfg.lin_bins,
                   ssrn_dim=cfg.ssrn_dim)
    tm.load_state_dict({k: torch.from_numpy(np.asarray(v, np.float32).copy())
                        for k, v in sd1.items()}, strict=True)
    ts.load_state_dict({k: torch.from_numpy(np.asarray(v, np.float32).copy())
                        for k, v in sd2.items()}, strict=True)
    tm.eval()
    ts.eval()

    # ---- export→import identity on the trained pytree ----
    rt1 = tree_maxdiff(p1, torch_import.import_melsyn(sd1))
    rt2 = tree_maxdiff(p2, torch_import.import_ssrn(sd2))
    print(f"[trained_parity] export→import roundtrip maxdiff: "
          f"t2m {rt1:.2e}, ssrn {rt2:.2e}")
    assert rt1 == 0.0 and rt2 == 0.0, (rt1, rt2)

    # ---- the reference's resume-compatible checkpoint file ----
    ck_path = os.path.join(args.root, "export_text2mel.tar.pth")
    torch_export.save_reference_checkpoint(ck_path, sd1, epoch=1, iteration=1)
    ck = torch.load(ck_path, weights_only=False)
    assert {"model_state_dict", "optimizer_state_dict",
            "loss_val_log"} <= set(ck)
    opt = torch.optim.Adam(tm.parameters(), lr=2e-4, betas=(0.5, 0.9),
                           eps=1e-6)
    opt.load_state_dict(ck["optimizer_state_dict"])   # resume-branch contract

    # ---- AR decode: reference O(T²) eval loop vs our scan decode ----
    sentences = [
        "the birch canoe slid on the smooth planks.",
        "glue the sheet to the dark blue background.",
        "it's easy to tell the depth of a well.",
        "these days a chicken leg is a rare dish.",
        "rice is often served in round bowls.",
        "the juice of lemons makes fine punch.",
    ][: args.batch]
    text_np = encode_texts(sentences, cfg.vocabulary)
    B, N = text_np.shape
    spk_files = sorted(glob.glob(os.path.join(args.root, "spk_emb", "*.npy")))
    assert len(spk_files) >= B, "campaign spk_emb dir missing"
    spk_np = np.stack([np.load(f) for f in spk_files[:B]]).astype(np.float32)
    T = args.frames

    with torch.no_grad():
        text_t = torch.from_numpy(text_np.astype(np.int64))[:, None, :]
        spk_t = torch.from_numpy(spk_np)[:, :, None]
        init = torch.zeros((B, cfg.mel.freq_bins, 1))
        Y, A, pma, K, V = tm(melspec=init, textid=text_t, spkemb=spk_t,
                             pma=torch.zeros((B,)).long())
        inputs = torch.cat((init, Y), dim=-1)
        for _ in range(T - 1):
            Y, A, pma = tm(melspec=inputs, textid=None, spkemb=spk_t,
                           K=K, V=V, A_last=A, pma=pma)
            inputs = torch.cat((inputs, Y[:, :, -1:]), dim=-1)
        lin_ref = ts(Y).numpy()      # (B, 513, 4T)
    y_ref = Y.numpy()                # (B, 80, T)
    a_ref = A.numpy()                # (B, N, T)

    decode = make_decoder(melsyn, T)
    y_j, a_j, _ = decode(p1, jnp.asarray(text_np), jnp.asarray(spk_np))
    mel_mean = float(np.mean(np.abs(y_ref)))
    assert mel_mean > 0.01, (
        f"reference rollout is near-silent (mean |mel| {mel_mean:.5f}) — "
        "the parity comparison would be vacuous")
    mel_diff = float(np.max(np.abs(
        np.asarray(y_j).transpose(0, 2, 1) - y_ref)))
    attn_diff = float(np.max(np.abs(np.asarray(a_j) - a_ref)))
    lin_j = ssrn.apply(p2, y_j)
    lin_diff = float(np.max(np.abs(
        np.asarray(lin_j).transpose(0, 2, 1) - lin_ref)))
    print(f"[trained_parity] B={B} T={T}: mel maxabs {mel_diff:.5f}, "
          f"attn maxabs {attn_diff:.5f}, ssrn lin maxabs {lin_diff:.5f}")

    ok = (mel_diff <= args.mel_threshold
          and attn_diff <= args.attn_threshold
          and lin_diff <= args.mel_threshold)
    art = {
        "ok": bool(ok),
        "checkpoints": {"text2mel": t2m_ck, "ssrn": ssrn_ck},
        "frames": T, "batch": B, "dtype": "float32",
        "ref_mel_mean_abs": mel_mean,
        "mel_maxabs": mel_diff, "attn_maxabs": attn_diff,
        "ssrn_lin_maxabs": lin_diff,
        "mel_threshold": args.mel_threshold,
        "attn_threshold": args.attn_threshold,
        "roundtrip_maxdiff": {"text2mel": rt1, "ssrn": rt2},
        "resume_checkpoint_keys_ok": True,
        "reference_loop": "models/TTSModel.py:275-300 via synthesize.py:104-109",
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)
    print(f"[trained_parity] wrote {OUT} ok={ok}")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
