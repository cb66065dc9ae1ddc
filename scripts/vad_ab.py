#!/usr/bin/env python
"""A/B the WebRTC-transcription VAD (the r5 default) vs the energy detector
(VERDICT r4 #6 / §missing-3).

Scope note: in the reference, webrtcvad feeds exactly ONE consumer — the
d-vector creator (``GE2E/dvector_create.py:92`` → ``VAD_segments.py:17``,
``Vad(2)``). GE2E train/test staging crops spectrograms with librosa trim,
not VAD, so EER/SR do not pass through the classifier; the faithful A/B
surface is the d-vector pipeline: segment spans, chunk counts, voiced
seconds, and (when a trained GE2E checkpoint is given) the aligned segment
embeddings the uis-rnn files are built from.

Usage (after the campaign corpus exists):
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/vad_ab.py \
      [--root /root/repo/_campaign_r5] [--utts 60] [--ge2e_ck <dir>]

Writes docs/VAD_AB.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

OUT = os.path.join(REPO, "docs", "VAD_AB.json")


def main():
    ps = argparse.ArgumentParser()
    ps.add_argument("--root", default=os.path.join(REPO, "_campaign_r5"))
    ps.add_argument("--utts", type=int, default=60)
    ps.add_argument("--ge2e_ck", default=None,
                    help="trained GE2E checkpoint dir (campaign ge2e_ck); "
                         "adds an embedding-level comparison")
    args = ps.parse_args()

    from spoofsv_tpu.dsp import host as dsp_host
    from spoofsv_tpu.spoofkit.vad import vad_chunk, vad_collector

    wavs = sorted(glob.glob(os.path.join(args.root, "corpus", "wav48",
                                         "*", "*.wav")))
    if not wavs:
        sys.exit(f"[vad_ab] no corpus wavs under {args.root}")
    rng = np.random.default_rng(0)
    wavs = [wavs[i] for i in
            rng.choice(len(wavs), min(args.utts, len(wavs)), replace=False)]

    def run_condition(condition):
        """A/B both classifiers over the sample; ``condition`` transforms
        each waveform (identity for the clean campaign audio; additive
        noise for the marginal-SNR leg where the detectors can differ)."""
        stats = {c: {"segments": 0, "voiced_s": 0.0, "chunks": 0,
                     "utts_empty": 0} for c in ("webrtc", "energy")}
        span_agreement = []
        for i, path in enumerate(wavs):
            y, sr = dsp_host.load_wav(path, sr=16000)
            y = condition(y, i)
            masks = {}
            for c in ("webrtc", "energy"):
                segs = vad_collector(y, sr, classifier=c)
                chunks, spans = vad_chunk(y, sr, classifier=c)
                st = stats[c]
                st["segments"] += len(segs)
                st["voiced_s"] += sum((e - s) for s, e in segs) / sr
                st["chunks"] += len(chunks)
                st["utts_empty"] += not segs
                m = np.zeros(len(y), bool)
                for s, e in segs:
                    m[s:e] = True
                masks[c] = m
            inter = float(np.sum(masks["webrtc"] & masks["energy"]))
            union = float(np.sum(masks["webrtc"] | masks["energy"]))
            span_agreement.append(inter / union if union else 1.0)
        return {
            "per_classifier": {
                c: {"segments": s["segments"],
                    "voiced_s": round(s["voiced_s"], 1),
                    "chunks_0p4s": s["chunks"],
                    "utts_with_no_voiced": s["utts_empty"]}
                for c, s in stats.items()},
            "voiced_mask_iou_mean": round(float(np.mean(span_agreement)), 4),
            "voiced_mask_iou_min": round(float(np.min(span_agreement)), 4),
        }

    noise_rng = np.random.default_rng(1)

    def add_noise(y, i, snr_db=5.0):
        sig = float(np.sqrt(np.mean(y ** 2) + 1e-12))
        n = noise_rng.normal(size=len(y)).astype(np.float32)
        n *= sig / 10 ** (snr_db / 20) / float(np.sqrt(np.mean(n ** 2)))
        return (y + n).astype(np.float32)

    def gapped(noise_rel_db):
        """1 s noise-only flanks + a mid-utterance noise gap around the
        speech — the detectors must actually LOCATE speech here (the raw
        corpus wavs are voiced end-to-end, so every classifier saturates
        on them)."""
        def f(y, i):
            sig = float(np.sqrt(np.mean(y ** 2) + 1e-12))
            amp = sig * 10 ** (noise_rel_db / 20)

            def noise(n_samp):
                return (amp * noise_rng.normal(size=n_samp)).astype(np.float32)

            half = len(y) // 2
            return np.concatenate([
                noise(16000), y[:half], noise(8000), y[half:], noise(16000)])
        return f

    art = {
        "n_utts": len(wavs),
        "corpus": os.path.join(args.root, "corpus"),
        "clean": run_condition(lambda y, i: y),
        "noisy_5db_snr": run_condition(add_noise),
        "gapped_quiet_floor": run_condition(gapped(-35.0)),
        "gapped_loud_floor": run_condition(gapped(-12.0)),
        "scope_note": ("VAD feeds only the d-vector creator in the reference "
                       "(dvector_create.py:92); GE2E EER/SR staging does not "
                       "pass through it. The raw campaign corpus is voiced "
                       "end-to-end, so both detectors saturate on it (IoU "
                       "1.0 — the default flip is behavior-preserving "
                       "there); the gapped legs insert noise-only flanks/"
                       "gaps so the detectors must locate speech, which is "
                       "where the fixed-point GMM and the energy heuristic "
                       "genuinely differ."),
    }

    if args.ge2e_ck:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb

        if _xb.backends_are_initialized():
            _xb._clear_backends()
        import jax.numpy as jnp

        from spoofsv_tpu.config import GE2EConfig
        from spoofsv_tpu.models import SpeechEmbedder
        from spoofsv_tpu.spoofkit.dvector import (align_embeddings,
                                                  concat_segs, get_stfts)
        from spoofsv_tpu.spoofkit.ge2e_harness import load_ge2e_params

        ge2e = GE2EConfig()
        emb = SpeechEmbedder(hidden=ge2e.model.hidden,
                             num_layers=ge2e.model.num_layer,
                             proj=ge2e.model.proj)
        ck = args.ge2e_ck
        if os.path.isdir(ck):
            cands = sorted(glob.glob(os.path.join(ck, "*.npz")))
            assert cands, f"no .npz under {ck}"
            ck = cands[-1]
        params = load_ge2e_params(ck, emb, ge2e.model.proj)
        sims, counts = [], {"webrtc": 0, "energy": 0}
        for path in wavs[:20]:
            y, sr = dsp_host.load_wav(path, sr=16000)
            means = {}
            for c in ("webrtc", "energy"):
                chunks, spans = vad_chunk(y, sr, classifier=c)
                if not chunks:
                    continue
                segs, _ = concat_segs(spans, chunks)
                windows = get_stfts(segs, ge2e)
                if not windows:
                    continue
                e = np.asarray(emb.apply(params,
                                         jnp.asarray(np.stack(windows))))
                aligned = align_embeddings(e)
                counts[c] += len(aligned)
                means[c] = aligned.mean(axis=0)
            if len(means) == 2:
                a, b = means["webrtc"], means["energy"]
                sims.append(float(np.dot(a, b)
                                  / (np.linalg.norm(a) * np.linalg.norm(b))))
        art["embedding_leg"] = {
            "ge2e_ck": args.ge2e_ck,
            "aligned_counts": counts,
            "n_compared": len(sims),
            "mean_dvector_cos_mean": (round(float(np.mean(sims)), 4)
                                      if sims else None),
            "mean_dvector_cos_min": (round(float(np.min(sims)), 4)
                                     if sims else None),
        }

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art, indent=1))
    print(f"[vad_ab] wrote {OUT}")


if __name__ == "__main__":
    main()
