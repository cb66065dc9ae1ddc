#!/usr/bin/env python
"""Why does speculative serving escalate 57% at the throughput point?

Decodes every (campaign text x real speaker) pair once at a full 160-frame
rollout on the trained checkpoints and extracts each pair's COMPLETION
frame (first frame whose furthest attended text position reaches the end,
the same criterion serve.py's speculative path checks). Because the AR
decode is causal, done-by-frame-f at a 160-frame rollout is exactly
done-at-a-rollout-of-f-frames, so this one sweep predicts the escalation
behavior of ANY bucket ladder / frames_per_char policy without re-running
the serving bench per configuration.

Reports the per-pair frames/char distribution (the corpus-level 2.0
figure hides per-speaker variance) and the implied escalation rate of the
arm-C policy from scripts/r4_spec_throughput.sh (buckets [48,96,160],
fpc 2.5, min 24) -> docs feed for SPECULATIVE_THROUGHPUT.json's diagnosis.

Usage: python scripts/spec_rate_diag.py --config _campaign_r4/config.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts._benchlib import setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ps = argparse.ArgumentParser()
    ps.add_argument("--config", type=str, required=True)
    ps.add_argument("--n_frames", type=int, default=160)
    ps.add_argument("--batch", type=int, default=64)
    ps.add_argument("--spec_margin", type=int, default=1)
    ps.add_argument("--out", type=str, default=None)
    args = ps.parse_args()

    from spoofsv_tpu.cli.main import (apply_runtime_knobs, build_models,
                                      inference_dtype)
    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.data.text import encode_texts
    from spoofsv_tpu.infer.synthesize import Synthesizer
    from spoofsv_tpu.utils.checkpoints import load_generator_params

    cfg = load_config(args.config)
    apply_runtime_knobs(cfg, infer=True)
    melsyn, ssrn, _, _ = build_models(cfg, "conditional",
                                      dtype=inference_dtype(cfg))
    p1 = load_generator_params(cfg.inference_text2mel_model, melsyn, cfg)
    p2 = load_generator_params(cfg.inference_ssrn_model, ssrn, cfg,
                               kind="ssrn")
    syn = Synthesizer(cfg, melsyn, ssrn, p1, p2, n_frames=args.n_frames)

    texts = [ln.strip() for ln in
             open(os.path.join(os.path.dirname(args.config), "texts.txt"))
             if ln.strip()]
    ids = encode_texts(texts, cfg.vocabulary, max_len=cfg.max_text_len)
    n_valid = (ids > 0).sum(axis=1).astype(np.int32)
    spk_files = sorted(os.listdir(cfg.spk_emb_dir))
    embs = np.stack([np.load(os.path.join(cfg.spk_emb_dir, f))
                     for f in spk_files]).astype(np.float32)

    # all pairs, decoded in fixed-size batches (one compile)
    pair_t, pair_s = np.meshgrid(np.arange(len(texts)), np.arange(len(embs)),
                                 indexing="ij")
    pair_t, pair_s = pair_t.ravel(), pair_s.ravel()
    comp = np.full(len(pair_t), -1, np.int32)   # completion frame (or -1)
    all_pos = []                                # furthest attended position
    for lo in range(0, len(pair_t), args.batch):
        sel = slice(lo, min(lo + args.batch, len(pair_t)))
        ti, si = pair_t[sel], pair_s[sel]
        pad = args.batch - len(ti)
        tb = np.concatenate([ids[ti], ids[ti[:1]].repeat(pad, 0)])
        sb = np.concatenate([embs[si], embs[si[:1]].repeat(pad, 0)])
        _, _, attn = syn(tb, sb, jax.random.PRNGKey(lo))
        # attn: (B, N_text, F); furthest attended position per frame
        pos = np.asarray(jax.device_get(attn.argmax(axis=1)))[:len(ti)]
        all_pos.append(pos)
        tgt = (n_valid[ti] - 1 - args.spec_margin)[:, None]
        done = pos >= tgt
        any_done = done.any(axis=1)
        comp[sel] = np.where(any_done, done.argmax(axis=1) + 1, -1)
        print(f"[spec_rate_diag] {sel.stop}/{len(pair_t)} decoded",
              flush=True)

    chars = n_valid[pair_t].astype(np.float64)
    fin = comp > 0
    fpc = comp[fin] / chars[fin]
    # implied escalation under the arm-C policy (buckets 48/96/160, fpc 2.5,
    # min 24): first rung's rollout must contain the completion frame
    buckets = np.array([48, 96, 160])
    est = np.maximum(24, np.ceil(2.5 * chars)).astype(int)
    rung = buckets[np.argmax(est[:, None] <= buckets[None, :], axis=1)]
    escal = (~fin) | (comp > rung)
    # spec_margin sensitivity: from the SAME attention paths, how many pairs
    # would never fire the completion check at looser margins? (A margin-only
    # fix is viable iff this decays fast; truncation risk rises with margin.)
    pos_all = np.concatenate(all_pos)           # (pairs, F)
    margin_sweep = {}
    for m in range(0, 6):
        never = ~(pos_all >= (n_valid[pair_t] - 1 - m)[:, None]).any(axis=1)
        margin_sweep[m] = round(float(never.mean()), 3)
    per_spk = {}
    for s, f in zip(pair_s[fin], fpc):
        per_spk.setdefault(int(s), []).append(float(f))
    spk_mean = {spk_files[k]: round(float(np.mean(v)), 2)
                for k, v in sorted(per_spk.items())}
    out = {
        "metric": "real_speaker_frames_per_char",
        "value": round(float(np.median(fpc)), 2),
        "unit": "frames/char",
        "detail": {
            "n_pairs": int(len(pair_t)),
            "n_never_completed_at_160": int((~fin).sum()),
            "fpc_p10": round(float(np.percentile(fpc, 10)), 2),
            "fpc_p50": round(float(np.percentile(fpc, 50)), 2),
            "fpc_p90": round(float(np.percentile(fpc, 90)), 2),
            "fpc_max": round(float(fpc.max()), 2),
            "implied_escalation_rate_armC": round(float(escal.mean()), 3),
            "never_completed_rate_by_margin": margin_sweep,
            "per_speaker_mean_fpc_min": min(spk_mean.values()),
            "per_speaker_mean_fpc_max": max(spk_mean.values()),
            "spec_margin": args.spec_margin,
            "n_frames": args.n_frames,
            "backend": jax.default_backend(),
        },
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
