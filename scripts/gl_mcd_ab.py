#!/usr/bin/env python
"""Judge the Griffin-Lim default on the TASK metric (VERDICT r4 #4).

The synthesize CLI's ``--mcd`` measures the DECODED mel vs GT — it cannot
see the vocoder at all. This script closes that gap with
analysis-by-synthesis MCD: vocode → audio → re-extract the coarse mel with
the exact reference feature pipeline (``dsp_host.tts_features``,
data/dataset.py:94-118) → DTW-MCD vs the GT mel. Two legs per candidate:

* ``copy_synthesis`` — GT linear magnitudes through the vocoder. Isolates
  pure GL phase-reconstruction quality (no TTS error in the loop). The
  cleanest A/B of GL configs.
* ``tts`` — the trained campaign TTS's predicted linear magnitudes through
  the vocoder: the end-to-end task metric (TTS error is identical across
  candidates, so ranking differences are the vocoder's).

Candidates: the reference mode (random@64 — synthesize.py:144's
librosa.griffinlim n_iter=64, run reference-faithfully as f32 XLA GL),
the production default (spsi@12 since r5), spsi@16/24, and the r3
default (advance@24) — the non-reference candidates run the production
fused kernel.

Run on the live TPU after the campaign's synthesize stage:
  python scripts/gl_mcd_ab.py [--root /root/repo/_campaign_r5] [--batches 3]

Merges results into docs/GL_SPSI_CHECK.json under "mcd_ab".
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np

from _benchlib import find_campaign_ckpt
from _benchlib import setup_cache as _setup_cache

_setup_cache()

OUT = os.path.join(REPO, "docs", "GL_SPSI_CHECK.json")
CANDIDATES = [("random", 64), ("spsi", 16), ("spsi", 24), ("advance", 24),
              ("spsi", 12)]


def main():
    ps = argparse.ArgumentParser()
    ps.add_argument("--root", default=os.path.join(REPO, "_campaign_r5"))
    ps.add_argument("--batches", type=int, default=3)
    ps.add_argument("--batch_size", type=int, default=16)
    args = ps.parse_args()

    import jax
    import jax.numpy as jnp

    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.data.pipeline import BucketedLoader, TTSDataSource
    from spoofsv_tpu.dsp import host as dsp_host
    from spoofsv_tpu.infer.synthesize import Synthesizer, make_vocoder
    from spoofsv_tpu.models import MelSyn, SSRN
    from spoofsv_tpu.spoofkit.mcd import batch_mcd
    from spoofsv_tpu.utils.checkpoints import load_generator_params

    cfg = load_config(os.path.join(args.root, "config.json"))
    melsyn = MelSyn(vocab_len=cfg.vocab_len, condition=True,
                    spk_emb_dim=cfg.spk_emb_dim,
                    text_emb_dim=cfg.text_emb_dim,
                    freq_bins=cfg.mel.freq_bins, hidden_dim=cfg.hidden_dim,
                    dtype=jnp.bfloat16)
    ssrn = SSRN(freq_bins=cfg.mel.freq_bins, output_bins=cfg.lin_bins,
                ssrn_dim=cfg.ssrn_dim, dtype=jnp.bfloat16)
    p1 = load_generator_params(find_campaign_ckpt(args.root, "text2mel"), melsyn, cfg)
    p2 = load_generator_params(find_campaign_ckpt(args.root, "ssrn"), ssrn, cfg,
                               kind="ssrn")

    spec_dir = os.path.join(args.root, "spec")
    src = TTSDataSource(cfg, "synthesize", spec_dir, need_lin=True)
    loader = BucketedLoader(src, args.batch_size, with_lin=True,
                            shuffle=False)

    def audio_to_mel(a: np.ndarray) -> np.ndarray:
        m, _ = dsp_host.tts_features(np.asarray(a, np.float32),
                                     cfg.sampling_rate, cfg)
        return m

    vocoders = {}
    for init, iters in CANDIDATES:
        if (init, iters) == ("random", 64):
            # the REFERENCE mode must be reference-faithful: the f32 XLA
            # Griffin-Lim (librosa-equivalent math, synthesize.py:144) —
            # NOT the production fused int8 kernel, which would gate the
            # candidates against a potentially-degraded baseline
            c = cfg.replace(tpu=dataclasses.replace(
                cfg.tpu, griffin_lim_init=init, griffin_lim_iters=iters,
                griffin_lim_impl="xla", griffin_lim_precision="highest"))
        else:
            # candidates run the production path (fused kernel, int8 per
            # Config) — that is what ships
            c = cfg.replace(tpu=dataclasses.replace(
                cfg.tpu, griffin_lim_init=init, griffin_lim_iters=iters))
        vocoders[(init, iters)] = make_vocoder(c, iters)

    results = {f"{i}@{n}": {"copy_synthesis": [], "tts": []}
               for i, n in CANDIDATES}
    syns = {}
    key = jax.random.PRNGKey(0)
    for bi, batch in enumerate(loader):
        if bi >= args.batches:
            break
        t = batch["mel"].shape[1]
        if t not in syns:
            syns[t] = Synthesizer(cfg, melsyn, ssrn, p1, p2, n_frames=t)
        key, sub = jax.random.split(key)
        _, mel_pred, _ = syns[t](jnp.asarray(batch["text"]),
                                 jnp.asarray(batch["spk"]), sub)
        lin_pred = syns[t]._ssrn_apply(p2, mel_pred)
        mel_gt = np.asarray(batch["mel"])
        lin_gt = jnp.asarray(batch["lin"])
        lengths = np.asarray(batch["mel_mask"]).sum(1).astype(int)
        for (init, iters), voc in vocoders.items():
            name = f"{init}@{iters}"
            for leg, lin in (("copy_synthesis", lin_gt), ("tts", lin_pred)):
                key, sub = jax.random.split(key)
                audio = np.asarray(voc(lin, sub))
                mels = [audio_to_mel(audio[b]) for b in range(audio.shape[0])]
                v = batch_mcd(mel_gt, mels, lengths,
                              analysis_power=cfg.norm.analysis_power)
                results[name][leg].append(v)
                print(f"[gl_mcd_ab] batch {bi} {name:12s} {leg:14s} "
                      f"{v:.3f} dB", flush=True)

    summary = {
        name: {leg: round(float(np.mean(vs)), 3) for leg, vs in legs.items()}
        for name, legs in results.items()}
    print(json.dumps(summary, indent=1))

    art = json.load(open(OUT)) if os.path.isfile(OUT) else {}
    art["mcd_ab"] = {
        "note": ("analysis-by-synthesis MCD (vocode -> audio -> re-extract "
                 "mel -> DTW-MCD vs GT mel); copy_synthesis feeds GT linear "
                 "mags (pure GL quality), tts feeds the trained TTS's "
                 "prediction (end-to-end task metric). Lower is better; "
                 "production default is chosen by this table. random@64 is "
                 "the reference-faithful f32 XLA GL (librosa math); the "
                 "other candidates run the production fused kernel "
                 "(int8 per Config) - what ships."),
        "batches": args.batches, "batch_size": args.batch_size,
        "backend": jax.default_backend(),
        "results_db": summary,
    }
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)
    print(f"[gl_mcd_ab] merged into {OUT}")


if __name__ == "__main__":
    main()
