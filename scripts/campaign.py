#!/usr/bin/env python
"""Realistic-scale quality campaign: train the full stack well past toy scale
and run the reference's complete tri-system evaluation.

No real multi-speaker speech exists in this environment (zero egress, no
VCTK), so the corpus is the rich-voice synthetic corpus from
``spoofsv_tpu.data.toy`` scaled to ≥50 speakers × ≥100 utterances — every
speaker gets an individual pitch + 6-harmonic timbre, so speaker
verification is a real discrimination task. Everything downstream is the
genuine reference workflow (SURVEY.md §3 call stacks) at reference model
dims, driven through the real CLIs:

  corpus       rich toy corpus + TTS texts + fake ASVspoof-LA sides
               (bonafide = extra disjoint speakers; CM train spoofs =
               Griffin-Lim copy-synthesis, the classic vocoder-artifact class)
  prepare      metagen splits + warm feature cache
  train_t2m    ordinary Text2Mel          (main.py train_text2mel)
  train_ssrn   ordinary SSRN              (main.py train_ssrn)
  train_adv    WGAN-GP Text2Mel           (main.py --adversarial)
  synthesize   held-out-split synthesis losses (main.py synthesize)
  spoofgen     spoof set + tri-system staging (generate_test_utterances.py)
  ge2e         GE2E train + staged-nospoof evaluation → EER/FRR/spoof rate
  ivector      i-vector/PLDA pipeline (cached models) → EER/spoof rate
  ivector_ref  one reference-scale (1024 Gauss / 400-dim) run (run.sh:105-129)
  cm           countermeasure train + dev scoring → CM EER
  curve        SR-vs-FRR curves (curve.py)
  report       <root>/RESULTS.json

Stages are resumable: each writes <root>/state/<stage>.json and is skipped
when that marker exists. Usage:

  python scripts/campaign.py [--root /root/repo/_campaign] [--speakers 60]
         [--utts 110] [--t2m_steps 40000] [--only stage | --skip stage ...]
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def parse_args():
    ps = argparse.ArgumentParser(description="realistic-scale quality campaign")
    ps.add_argument("--root", default=os.path.join(REPO, "_campaign"))
    ps.add_argument("--speakers", type=int, default=60)
    ps.add_argument("--utts", type=int, default=110)
    ps.add_argument("--train_spk", type=int, default=40)
    ps.add_argument("--enroll", type=int, default=3)
    ps.add_argument("--eval_num", type=int, default=20)
    ps.add_argument("--batch_size", type=int, default=64)
    ps.add_argument("--t2m_steps", type=int, default=40000)
    ps.add_argument("--ssrn_steps", type=int, default=30000)
    ps.add_argument("--adv_steps", type=int, default=20000)
    ps.add_argument("--ge2e_epochs", type=int, default=600)
    ps.add_argument("--ge2e_n", type=int, default=6)
    ps.add_argument("--ge2e_m", type=int, default=50)
    ps.add_argument("--ge2e_hidden", type=int, default=768)
    ps.add_argument("--ge2e_layers", type=int, default=3)
    ps.add_argument("--ge2e_proj", type=int, default=256)
    ps.add_argument("--ivec_gauss", type=int, default=256)
    ps.add_argument("--ivec_dim", type=int, default=100)
    ps.add_argument("--cm_cap", type=int, default=3500)
    ps.add_argument("--cm_steps", type=int, default=4000)
    ps.add_argument("--speaker_batch", type=int, default=20)
    ps.add_argument("--metrics_every", type=int, default=50)
    ps.add_argument("--hidden_dim", type=int, default=256)
    ps.add_argument("--val_every_iter", type=int, default=2000)
    ps.add_argument("--only", type=str, default=None)
    ps.add_argument("--skip", action="append", default=[])
    ps.add_argument("--force", action="append", default=[],
                    help="re-run these stages even if their marker exists")
    ps.add_argument("--split_suffix", type=str, default="",
                    help="run a speaker-split variant (the reference's "
                         "S1/S2/S3 --train_spk_num schemes, "
                         "generate_test_utterances.py:47) reusing the base "
                         "campaign's corpus + trained TTS/CM models: only the "
                         "staging + verification stages re-run, with stage "
                         "markers/dirs suffixed (e.g. --split_suffix _s50 "
                         "--train_spk 50)")
    return ps.parse_args()


ARGS = parse_args()
ROOT = ARGS.root
STATE = os.path.join(ROOT, "state")
SUFFIX = ARGS.split_suffix
BASE_TAG = "campaign"            # checkpoints (TTS, CM) always come from the
BASE_TAG_ADV = "campaign_adv"    # base campaign's training stages
TAG = BASE_TAG + SUFFIX
TAG_ADV = BASE_TAG + SUFFIX + "_adv"
DATA_ROOT = os.path.join(ROOT, "corpus")
SPK_EMB = os.path.join(ROOT, "spk_emb")
ANTISPOOF = os.path.join(ROOT, "antispoof") + "/"
TEXTS = os.path.join(ROOT, "texts.txt")
CFG_PATH = os.path.join(ROOT, "config.json")
os.makedirs(STATE, exist_ok=True)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/spoofsv_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# stages that depend on the train/test speaker split: their state markers,
# output dirs and result files are suffixed in --split_suffix mode. Training
# stages (corpus/prepare/train_*/synthesize) are split-independent and always
# come from the base campaign.
SPLIT_STAGES = {"spoofgen", "ge2e", "ivector", "cm", "curve", "spoofgen_adv",
                "ge2e_adv", "ivector_adv", "cm_adv", "curve_adv", "report"}


def run_stage(name, fn):
    mname = name + SUFFIX if (SUFFIX and name in SPLIT_STAGES) else name
    marker = os.path.join(STATE, f"{mname}.json")
    if ARGS.only and name != ARGS.only:
        print(f"[campaign] {mname}: skipped (--only {ARGS.only})", flush=True)
        return json.load(open(marker)) if os.path.exists(marker) else {}
    if name in ARGS.skip:
        print(f"[campaign] {mname}: skipped (--skip)", flush=True)
        return json.load(open(marker)) if os.path.exists(marker) else {}
    if os.path.exists(marker) and name not in ARGS.force:
        print(f"[campaign] {mname}: already done", flush=True)
        return json.load(open(marker))
    print(f"[campaign] {mname}: start", flush=True)
    t0 = time.time()
    out = fn() or {}
    out["_wall_s"] = round(time.time() - t0, 1)
    with open(marker, "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(f"[campaign] {mname}: done in {out['_wall_s']}s", flush=True)
    return out


# ----------------------------------------------------------------------
# corpus
# ----------------------------------------------------------------------

def stage_corpus():
    from spoofsv_tpu.config import Config
    from spoofsv_tpu.data.toy import (generate_toy_corpus, random_sentence,
                                      synth_sentence)
    from spoofsv_tpu.data.vctk import prepare_vctk
    from spoofsv_tpu.dsp import host as dsp_host

    speakers = generate_toy_corpus(
        DATA_ROOT, SPK_EMB, n_speakers=ARGS.speakers, utts_per_spk=ARGS.utts,
        seed=0, rich_speakers=True, min_chars=18, max_chars=36, verbose=False)

    rng = np.random.default_rng(777)
    with open(TEXTS, "w") as f:
        for _ in range(ARGS.eval_num):
            f.write(random_sentence(rng, 18, 36) + "\n")

    cfg = Config().replace(
        data_root_dir=DATA_ROOT, spk_emb_dir=SPK_EMB,
        src_root_dir=ROOT + "/", antispoof_dir=ANTISPOOF, tts_texts=TEXTS,
        hidden_dim=ARGS.hidden_dim, batch_size=ARGS.batch_size,
        val_every_iter=ARGS.val_every_iter)
    prepare_vctk(cfg, verbose=False)
    with open(CFG_PATH, "w") as f:
        json.dump(cfg.to_reference_dict(), f, indent=2)

    # ---- fake ASVspoof2019-LA sides from 10 extra (disjoint) speakers ----
    # dev bonafide: utts 1..30 per speaker; train spoof: Griffin-Lim
    # copy-synthesis of utts 31..50 (vocoder-artifact spoof class, like the
    # LA train attacks the reference CM trains against)
    sr = 22050
    brng = np.random.default_rng(4242)
    dev_flac = os.path.join(ANTISPOOF, "ASVspoof2019_LA_dev", "flac")
    trn_flac = os.path.join(ANTISPOOF, "ASVspoof2019_LA_train", "flac")
    proto = os.path.join(ANTISPOOF, "ASVspoof2019_LA_cm_protocols")
    for d in (dev_flac, trn_flac, proto):
        os.makedirs(d, exist_ok=True)

    bona, to_copy_synth = [], []
    for s in range(10):
        scale = float(0.8 + 0.55 * brng.random())
        h = brng.uniform(0.08, 1.0, 6)
        h = (h / h.sum()).tolist()
        for j in range(50):
            text = random_sentence(brng, 18, 36)
            y = synth_sentence(text, sr, scale, brng, harmonics=h)
            (bona if j < 30 else to_copy_synth).append((f"B{s:02d}", j, y))

    with open(os.path.join(proto, "ASVspoof2019.LA.cm.dev.trl.txt"), "w") as f:
        for k, (spk, j, y) in enumerate(bona):
            name = f"LA_D_BONA{k:04d}"
            dsp_host.write_flac(os.path.join(dev_flac, name + ".flac"),
                                dsp_host.resample(y, sr, 16000), 16000)
            f.write(f"{spk} {name} - - bonafide\n")

    # copy-synthesis in one fixed-shape batched Griffin-Lim dispatch
    import jax.numpy as jnp

    from spoofsv_tpu.dsp import jaxdsp

    cfg_stft = cfg.stft
    n_fft, hop = cfg_stft.fft_length, cfg_stft.hop_length
    mags, lens = [], []
    max_t = 0
    for _, _, y in to_copy_synth:
        m = dsp_host.stft_mag(dsp_host.preemphasis(y, cfg.preemph), n_fft, hop)
        mags.append(m.T)                       # (T, bins)
        lens.append(len(y))
        max_t = max(max_t, m.shape[1])
    batch = np.zeros((len(mags), max_t, n_fft // 2 + 1), np.float32)
    for i, m in enumerate(mags):
        batch[i, : m.shape[0]] = m
    audio = jaxdsp.griffin_lim(jnp.asarray(batch), jax.random.PRNGKey(0),
                               n_fft, hop, n_fft, n_iter=64)
    audio = np.asarray(jaxdsp.deemphasis(audio, cfg.preemph))
    with open(os.path.join(proto, "ASVspoof2019.LA.cm.train.trn.txt"), "w") as f:
        for k, (spk, j, _) in enumerate(to_copy_synth):
            name = f"LA_T_COPY{k:04d}"
            w = audio[k][: lens[k]]
            w = 0.75 * w / max(1e-6, np.abs(w).max())
            dsp_host.write_flac(os.path.join(trn_flac, name + ".flac"),
                                dsp_host.resample(w, sr, 16000), 16000)
            f.write(f"{spk} {name} - - spoof\n")
    return {"speakers": speakers[:3] + ["..."], "n_speakers": ARGS.speakers,
            "utts_per_spk": ARGS.utts, "bona": len(bona),
            "cm_train_spoof": len(to_copy_synth)}


# ----------------------------------------------------------------------
# prepare: warm the feature cache
# ----------------------------------------------------------------------

def stage_prepare():
    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.data.pipeline import TTSDataSource

    cfg = load_config(CFG_PATH)
    spec_dir = os.path.join(ROOT, "spec")
    os.makedirs(spec_dir, exist_ok=True)
    counts = {}
    for mode in ("train", "validate", "synthesize"):
        src = TTSDataSource(cfg, mode, spec_dir, need_lin=True)
        src.warm_cache(workers=16)
        counts[mode] = len(src.wav_paths)
    return counts


# ----------------------------------------------------------------------
# training via the reference CLI surface
# ----------------------------------------------------------------------

def _train(step, tag, steps, adversarial):
    from spoofsv_tpu.cli import main as cli_main

    argv = [step, "-C", CFG_PATH, "-T", tag, "--save_spectrogram",
            "--masked_loss", "--max_iterations", str(steps),
            "--metrics_every", str(ARGS.metrics_every), "-R", "latest"]
    if adversarial:
        argv.append("--adversarial")
    cli_main.main(argv)
    return {"steps": steps, "tag": tag, "adversarial": adversarial}


def _ckpt(tag, prefix, adversarial=False):
    base = os.path.join(ROOT, "checkpoints", "conditional",
                        "adversarial" if adversarial else "not_adversarial",
                        tag)
    best = os.path.join(base, f"{prefix}_best_model")
    if os.path.isdir(best):
        return best
    dirs = [p for p in glob.glob(os.path.join(base, f"{prefix}_iteration_*"))
            if os.path.isdir(p)]
    assert dirs, (base, prefix)
    return max(dirs, key=lambda p: int(p.rsplit("_", 1)[-1]))


def _set_inference_ckpts(t2m, ssrn):
    d = json.load(open(CFG_PATH))
    d["INFERENCE_TEXT2MEL_MODEL"] = t2m
    d["INFERENCE_SSRN_MODEL"] = ssrn
    with open(CFG_PATH, "w") as f:
        json.dump(d, f, indent=2)


def stage_synthesize():
    from spoofsv_tpu.cli import main as cli_main

    _set_inference_ckpts(_ckpt(BASE_TAG, "text2mel"), _ckpt(BASE_TAG, "ssrn"))
    import contextlib
    import io
    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

    with contextlib.redirect_stdout(Tee()):
        cli_main.main(["synthesize", "-C", CFG_PATH, "-T", TAG, "--mcd"])
    t2m_losses, ssrn_losses, mcds = [], [], []
    for line in buf.getvalue().splitlines():
        if line.startswith("syn set text2mel loss:"):
            t2m_losses.append(float(line.split()[-1]))
        elif line.startswith("syn set ssrn loss:"):
            ssrn_losses.append(float(line.split()[-1]))
        elif line.startswith("syn set mcd:"):
            mcds.append(float(line.split()[-2]))
    return {"n_batches": len(t2m_losses),
            "text2mel_loss": float(np.mean(t2m_losses)) if t2m_losses else None,
            "ssrn_loss": float(np.mean(ssrn_losses)) if ssrn_losses else None,
            "mcd_db": float(np.mean(mcds)) if mcds else None}


def stage_spoofgen(tag=TAG, cfg_path=None):
    from spoofsv_tpu.cli import generate_test_utterances as gtu

    gtu.main(["-C", cfg_path or CFG_PATH, "-T", tag,
              "--train_spk_num", str(ARGS.train_spk),
              "--enroll_utt_num", str(ARGS.enroll),
              "--eval_utt_num", str(ARGS.eval_num),
              "--speaker_batch", str(ARGS.speaker_batch)])
    test_root = os.path.join(ROOT, "test", tag)
    n = len(glob.glob(os.path.join(test_root, "spoof_data", "*", "*.wav")))
    return {"spoof_wavs": n, "test_root": test_root}


def stage_spoofgen_adv():
    """Spoof set from the WGAN-GP Text2Mel (ordinary SSRN — the adversarial
    campaign trains the generator adversarially; SSRN is shared)."""
    cfg_adv = os.path.join(ROOT, f"config_adv{SUFFIX}.json")
    d = json.load(open(CFG_PATH))
    d["INFERENCE_TEXT2MEL_MODEL"] = _ckpt(BASE_TAG_ADV, "text2mel",
                                          adversarial=True)
    d["INFERENCE_SSRN_MODEL"] = _ckpt(BASE_TAG, "ssrn")
    with open(cfg_adv, "w") as f:
        json.dump(d, f, indent=2)
    return stage_spoofgen(tag=TAG_ADV, cfg_path=cfg_adv)


# ----------------------------------------------------------------------
# GE2E
# ----------------------------------------------------------------------

def _ge2e_config(tag=None, extra=""):
    from spoofsv_tpu.config import GE2EConfig

    tag = tag or TAG
    suffix = SUFFIX + extra     # split variants keep their own dirs/ckpts
    test_root = os.path.join(ROOT, "test", tag)
    ge2e = GE2EConfig()
    n_test = ARGS.speakers - ARGS.train_spk
    return dataclasses.replace(
        ge2e,
        unprocessed_data=os.path.join(test_root, "ge2e_data", "*", "*.wav"),
        save_simmat_dir=os.path.join(ROOT, "simmat" + suffix),
        data=dataclasses.replace(
            ge2e.data, train_path=os.path.join(ROOT, "tisv_train" + suffix),
            test_path=os.path.join(ROOT, "tisv_test" + suffix)),
        model=dataclasses.replace(ge2e.model, hidden=ARGS.ge2e_hidden,
                                  num_layer=ARGS.ge2e_layers,
                                  proj=ARGS.ge2e_proj),
        train=dataclasses.replace(
            ge2e.train, N=ARGS.ge2e_n, M=ARGS.ge2e_m, checkpoint_interval=200,
            checkpoint_dir=os.path.join(ROOT, "ge2e_ck" + SUFFIX),
            log_file=os.path.join(ROOT, "ge2e_ck" + SUFFIX, "Stats")),
        test=dataclasses.replace(
            ge2e.test, N=n_test,
            M=2 * (ARGS.enroll + 2 * ARGS.eval_num), epochs=1))


def stage_ge2e():
    from spoofsv_tpu.spoofkit import ge2e_harness as gh

    ge2e = _ge2e_config()
    gh.save_spectrogram_tisv(ge2e, train_spk_num=ARGS.train_spk,
                             enroll_num=ARGS.enroll + ARGS.eval_num,
                             eval_num=ARGS.eval_num, seed=0, verbose=False)
    gh.train_ge2e(ge2e, max_epochs=ARGS.ge2e_epochs, verbose=True)
    ck = sorted(glob.glob(os.path.join(ROOT, "ge2e_ck" + SUFFIX, "final_*.npz")))
    test_root = os.path.join(ROOT, "test", TAG)
    res = gh.run_ge2e_evaluation(
        ge2e, enroll_num=ARGS.enroll, eval_num=ARGS.eval_num,
        model_path=ck[-1], verbose=True,
        nospoof_data=os.path.join(test_root, "ivector_data", "test_nospoof",
                                  "*", "*.wav"), seed=0)
    res["checkpoint"] = ck[-1]
    return res


def stage_ge2e_adv():
    """Re-stage the adversarial spoof set through the SAME trained embedder:
    only the spoof crops change, so EER/threshold transfer is apples-to-apples
    with the ordinary chain."""
    from spoofsv_tpu.spoofkit import ge2e_harness as gh

    ge2e = _ge2e_config(tag=TAG_ADV, extra="_adv")
    gh.save_spectrogram_tisv(ge2e, train_spk_num=ARGS.train_spk,
                             enroll_num=ARGS.enroll + ARGS.eval_num,
                             eval_num=ARGS.eval_num, seed=0, verbose=False)
    ck = json.load(open(os.path.join(STATE, f"ge2e{SUFFIX}.json")))["checkpoint"]
    test_root = os.path.join(ROOT, "test", TAG_ADV)
    res = gh.run_ge2e_evaluation(
        ge2e, enroll_num=ARGS.enroll, eval_num=ARGS.eval_num,
        model_path=ck, verbose=True,
        nospoof_data=os.path.join(test_root, "ivector_data", "test_nospoof",
                                  "*", "*.wav"), seed=0)
    res["checkpoint"] = ck
    return res


# ----------------------------------------------------------------------
# i-vector
# ----------------------------------------------------------------------

def stage_ivector():
    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.spoofkit.ivector import run_ivector_pipeline

    cfg = load_config(CFG_PATH)
    return run_ivector_pipeline(
        cfg, TAG, enroll_num=ARGS.enroll, eval_num=ARGS.eval_num,
        num_gauss=ARGS.ivec_gauss, ivec_dim=ARGS.ivec_dim, workers=8,
        models_dir=os.path.join(ROOT, "ivector_models" + SUFFIX), verbose=True)


def stage_ivector_adv():
    """Score the adversarial spoof set with the CACHED i-vector models
    (run.sh [1] semantics — UBM/T/PLDA reused, scoring only)."""
    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.spoofkit.ivector import run_ivector_pipeline

    cfg = load_config(CFG_PATH)
    return run_ivector_pipeline(
        cfg, TAG_ADV, enroll_num=ARGS.enroll, eval_num=ARGS.eval_num,
        num_gauss=ARGS.ivec_gauss, ivec_dim=ARGS.ivec_dim, workers=8,
        models_dir=os.path.join(ROOT, "ivector_models" + SUFFIX), verbose=True)


def stage_ivector_ref():
    """One reference-scale run: 1024 Gaussians / 400-dim i-vectors
    (kaldi_ivectors/run.sh:105-129) on a reduced utterance set."""
    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.spoofkit.ivector import run_ivector_pipeline

    cfg = load_config(CFG_PATH)
    return run_ivector_pipeline(
        cfg, TAG, enroll_num=ARGS.enroll, eval_num=ARGS.eval_num,
        num_gauss=1024, ivec_dim=400, workers=8,
        max_train_utts_per_spk=20, ubm_frames_cap=400_000,
        models_dir=os.path.join(ROOT, "ivector_models_ref"), verbose=True)


# ----------------------------------------------------------------------
# countermeasure
# ----------------------------------------------------------------------

def stage_cm():
    from spoofsv_tpu.cli import antispoof as cm_cli
    from spoofsv_tpu.spoofkit.antispoof import cm_eer

    if SUFFIX:
        # split variant: the CM train set (LA-train analog) is
        # split-independent — reuse the base campaign's trained classifier
        # and only score this split's dev protocol
        return _score_cm(TAG)
    cwd = os.getcwd()
    os.chdir(ROOT)
    try:
        cm_cli.main(["train", "-C", CFG_PATH, "-T", TAG,
                     "--bonafide_cap", str(ARGS.cm_cap),
                     "--max_iterations", str(ARGS.cm_steps),
                     "--save_interval", "2000"])
        ck = os.path.join(ROOT, "checkpoints", BASE_TAG, "final.npz")
        cm_cli.main(["dev", "-C", CFG_PATH, "-T", TAG, "-R", ck,
                     "--bonafide_cap", str(ARGS.cm_cap)])
    finally:
        os.chdir(cwd)
    scores_path = os.path.join(ROOT, "cm_scores", f"scores_{TAG}.txt")
    labels, scores = [], []
    with open(scores_path) as f:
        for line in f:
            parts = line.split()
            labels.append(1.0 if parts[2] == "bonafide" else 0.0)
            scores.append(float(parts[3]))
    labels, scores = np.asarray(labels), np.asarray(scores)
    eer, thr = cm_eer(labels, scores)
    return {"cm_eer": float(eer), "threshold": float(thr),
            "n_bonafide": int(labels.sum()), "n_spoof": int((1 - labels).sum()),
            "scores": scores_path}


def _score_cm(tag):
    from spoofsv_tpu.cli import antispoof as cm_cli
    from spoofsv_tpu.spoofkit.antispoof import cm_eer

    ck = os.path.join(ROOT, "checkpoints", BASE_TAG, "final.npz")
    cwd = os.getcwd()
    os.chdir(ROOT)
    try:
        cm_cli.main(["dev", "-C", CFG_PATH, "-T", tag, "-R", ck,
                     "--bonafide_cap", str(ARGS.cm_cap)])
    finally:
        os.chdir(cwd)
    scores_path = os.path.join(ROOT, "cm_scores", f"scores_{tag}.txt")
    labels, scores = [], []
    with open(scores_path) as f:
        for line in f:
            parts = line.split()
            labels.append(1.0 if parts[2] == "bonafide" else 0.0)
            scores.append(float(parts[3]))
    labels, scores = np.asarray(labels), np.asarray(scores)
    eer, thr = cm_eer(labels, scores)
    return {"cm_eer": float(eer), "threshold": float(thr),
            "n_bonafide": int(labels.sum()), "n_spoof": int((1 - labels).sum()),
            "scores": scores_path}


def stage_cm_adv():
    """Score the adversarial spoof set with the SAME trained countermeasure."""
    return _score_cm(TAG_ADV)


def _curve(tag, suffix, out_name):
    from spoofsv_tpu.cli import curve as curve_cli

    test_root = os.path.join(ROOT, "test", tag)
    simmats = sorted(glob.glob(os.path.join(ROOT, "simmat" + suffix, "*.npy")))
    out_png = os.path.join(ROOT, out_name)
    curve_cli.main(["--simmat", simmats[0],
                    "--ivector_score",
                    os.path.join(test_root, "ivector_data", "scores",
                                 "plda_scores_mixed.txt"),
                    "--n_speakers", str(ARGS.speakers - ARGS.train_spk),
                    "--eval_num", str(ARGS.eval_num),
                    "--out", out_png])
    return {"curve": out_png}


def stage_curve():
    return _curve(TAG, SUFFIX, f"curve{SUFFIX}.png")


def stage_curve_adv():
    return _curve(TAG_ADV, SUFFIX + "_adv", f"curve{SUFFIX}_adv.png")


def stage_report():
    out = {}
    for name in ("corpus", "prepare", "train_t2m", "train_ssrn", "train_adv",
                 "synthesize", "spoofgen", "ge2e", "ivector", "ivector_ref",
                 "cm", "curve", "spoofgen_adv", "ge2e_adv", "ivector_adv",
                 "cm_adv", "curve_adv"):
        mname = name + SUFFIX if (SUFFIX and name in SPLIT_STAGES) else name
        marker = os.path.join(STATE, f"{mname}.json")
        if os.path.exists(marker):
            out[name] = json.load(open(marker))
    results = os.path.join(ROOT, f"RESULTS{SUFFIX}.json")
    with open(results, "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(json.dumps({k: v for k, v in out.items()
                      if k in ("ge2e", "ivector", "ivector_ref", "cm",
                               "synthesize", "ge2e_adv", "ivector_adv",
                               "cm_adv")}, indent=2, default=float))
    return {"results": results}


def main():
    if SUFFIX:
        # split-scheme variant: the base campaign must have trained everything
        for req in ("corpus", "train_t2m", "train_ssrn", "train_adv",
                    "synthesize", "cm"):
            assert os.path.exists(os.path.join(STATE, f"{req}.json")), (
                f"--split_suffix needs the base campaign stage '{req}' done")
    else:
        run_stage("corpus", stage_corpus)
        run_stage("prepare", stage_prepare)
        run_stage("train_t2m",
                  lambda: _train("train_text2mel", TAG, ARGS.t2m_steps, False))
        run_stage("train_ssrn",
                  lambda: _train("train_ssrn", TAG, ARGS.ssrn_steps, False))
        run_stage("train_adv",
                  lambda: _train("train_text2mel", TAG_ADV, ARGS.adv_steps,
                                 True))
        run_stage("synthesize", stage_synthesize)
    run_stage("spoofgen", stage_spoofgen)
    run_stage("ge2e", stage_ge2e)
    run_stage("ivector", stage_ivector)
    run_stage("ivector_ref", stage_ivector_ref)
    run_stage("cm", stage_cm)
    run_stage("curve", stage_curve)
    # adversarial chain: spoofs from the WGAN-GP generator scored by the
    # SAME trained verifiers/countermeasure (the paper's core comparison)
    run_stage("spoofgen_adv", stage_spoofgen_adv)
    run_stage("ge2e_adv", stage_ge2e_adv)
    run_stage("ivector_adv", stage_ivector_adv)
    run_stage("cm_adv", stage_cm_adv)
    run_stage("curve_adv", stage_curve_adv)
    run_stage("report", stage_report)


if __name__ == "__main__":
    main()
