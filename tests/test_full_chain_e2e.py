"""Whole-reference-workflow integration test on the toy corpus.

Drives every stage a user of the reference would run, end to end, through the
real CLIs and harnesses (SURVEY.md §3 call stacks):

  metagen → train_text2mel → train_ssrn → synthesize →
  generate_test_utterances (spoof set + i-vector/GE2E/anti-spoof staging) →
  i-vector+PLDA pipeline → GE2E preprocess/train/eval → CM train/score →
  SR-vs-FRR curve.

Everything runs at miniature dims on CPU; the assertions are plumbing-level
(artifacts exist, metrics finite, formats parse) — quality is covered by the
unit/parity tests and the learning-dynamics run.
"""

import glob
import json
import os

import numpy as np
import pytest

from spoofsv_tpu.data.toy import generate_toy_corpus, toy_config
from spoofsv_tpu.data.vctk import prepare_vctk


@pytest.mark.slow
class TestFullReferenceWorkflow:
    def test_whole_pipeline(self, tmp_path, monkeypatch):
        work = str(tmp_path)
        root = os.path.join(work, "corpus")
        emb = os.path.join(work, "emb")
        generate_toy_corpus(root, emb, n_speakers=3, utts_per_spk=12,
                            seed=0)
        texts = os.path.join(work, "texts.txt")
        with open(texts, "w") as f:
            f.write("ab cd ef gh ij kl\nmn op qr st uv\nwx yz ab cd ef\n")

        antispoof_dir = os.path.join(work, "antispoof") + "/"
        # keep the reference MAX_TEXT_LEN/MAX_FRAME_NUM (the default bucket
        # tables assume them); the toy utterances just use the small buckets
        cfg = toy_config(root, emb, work + "/", hidden_dim=16,
                         text_emb_dim=8, batch_size=2, val_every_iter=4,
                         antispoof_dir=antispoof_dir, tts_texts=texts)
        prepare_vctk(cfg, verbose=False)
        cfg_path = os.path.join(work, "config.json")
        with open(cfg_path, "w") as f:
            json.dump(cfg.to_reference_dict(), f)

        # fake ASVspoof2019-LA bonafide side (exercises the FLAC reader in
        # the CM chain, generate_test_utterances.py:236-245)
        proto_dir = os.path.join(antispoof_dir, "ASVspoof2019_LA_cm_protocols")
        flac_dir = os.path.join(antispoof_dir, "ASVspoof2019_LA_dev", "flac")
        os.makedirs(proto_dir)
        os.makedirs(flac_dir)
        from spoofsv_tpu.dsp import host as dsp_host
        rng = np.random.default_rng(1)
        with open(os.path.join(proto_dir,
                               "ASVspoof2019.LA.cm.dev.trl.txt"), "w") as f:
            for i in range(4):
                name = f"LA_D_FAKE{i}"
                t = np.arange(24000) / 16000.0
                y = 0.3 * np.sin(2 * np.pi * (200 + 40 * i) * t)
                y += 0.01 * rng.normal(size=len(t))
                dsp_host.write_flac(os.path.join(flac_dir, name + ".flac"),
                                    y.astype(np.float32), 16000)
                f.write(f"SPK{i} {name} - - bonafide\n")

        # ---- train both nets via the reference CLI surface ----
        from spoofsv_tpu.cli import main as cli_main
        cli_main.main(["train_text2mel", "-C", cfg_path, "-T", "e2e",
                       "--max_iterations", "6", "--masked_loss"])
        cli_main.main(["train_ssrn", "-C", cfg_path, "-T", "e2e",
                       "--max_iterations", "6", "--masked_loss"])
        ckpt_base = os.path.join(work, "checkpoints", "conditional",
                                 "not_adversarial", "e2e")
        def latest_ckpt(prefix):
            dirs = [p for p in glob.glob(os.path.join(ckpt_base, prefix + "_iteration_*"))
                    if os.path.isdir(p)]
            assert dirs, prefix
            return max(dirs, key=lambda p: int(p.rsplit("_", 1)[-1]))

        t2m = [latest_ckpt("text2mel")]
        ssrn = [latest_ckpt("ssrn")]

        d = json.load(open(cfg_path))
        d["INFERENCE_TEXT2MEL_MODEL"] = t2m[-1]
        d["INFERENCE_SSRN_MODEL"] = ssrn[-1]
        with open(cfg_path, "w") as f:
            json.dump(d, f)

        # ---- synthesize the held-out split (data-parallel over the mesh —
        # the reference's DataParallel wrap, synthesize.py:75-77) ----
        cli_main.main(["synthesize", "-C", cfg_path, "-T", "e2e",
                       "--mesh", "4"])
        wavs = glob.glob(os.path.join(work, "samples", "e2e", "*.wav"))
        assert wavs, "synthesize produced no audio"

        # ---- two-way torch interop on the REAL trained checkpoint:
        # export to the reference .tar.pth schema, reload through the same
        # loader the inference CLIs use, outputs must match ----
        from spoofsv_tpu.cli import export as export_cli
        from spoofsv_tpu.cli.main import build_models
        from spoofsv_tpu.utils.checkpoints import load_generator_params

        exported = os.path.join(work, "ssrn_exported.tar.pth")
        export_cli.main(["--ckpt", ssrn[-1], "--kind", "ssrn",
                         "--out", exported, "-C", cfg_path])
        from spoofsv_tpu.config import load_config as _lc
        cfgx = _lc(cfg_path)
        _, ssrn_model, _, _ = build_models(cfgx, "conditional")
        p_orbax = load_generator_params(ssrn[-1], ssrn_model, cfgx, kind="ssrn")
        p_torch = load_generator_params(exported, ssrn_model, cfgx, kind="ssrn")
        import jax.numpy as jnp

        mel_probe = jnp.asarray(
            np.random.default_rng(3).uniform(0.1, 0.9, (2, 8, 80)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(ssrn_model.apply(p_orbax, mel_probe)),
            np.asarray(ssrn_model.apply(p_torch, mel_probe)),
            atol=1e-6, rtol=1e-6)

        # ---- spoof set + i-vector/GE2E/anti-spoof staging ----
        from spoofsv_tpu.cli import generate_test_utterances as gtu
        # --mesh 4: DP spoof-set synthesis with ragged-batch padding
        # (3 speakers x 3 utts = 9 rows -> padded to 12 over 4 shards)
        gtu.main(["-C", cfg_path, "-T", "e2e", "--train_spk_num", "1",
                  "--enroll_utt_num", "2", "--eval_utt_num", "3",
                  "--speaker_batch", "3", "--mesh", "4"])
        test_root = os.path.join(work, "test", "e2e")
        spoof_wavs = glob.glob(os.path.join(test_root, "spoof_data", "*", "*.wav"))
        assert len(spoof_wavs) == 3 * 3          # 3 speakers x 3 utts
        assert os.path.isdir(os.path.join(test_root, "ivector_data", "wav", "test"))
        assert os.path.isdir(os.path.join(test_root, "ge2e_data"))
        staged_flacs = glob.glob(os.path.join(antispoof_dir, "e2e", "flac", "*.flac"))
        assert staged_flacs, "anti-spoof staging wrote no flacs"

        # ---- i-vector + PLDA pipeline (full-covariance default) ----
        from spoofsv_tpu.config import load_config
        from spoofsv_tpu.spoofkit.ivector import run_ivector_pipeline
        cfg2 = load_config(cfg_path)
        models_dir = os.path.join(work, "ivector_models")
        res = run_ivector_pipeline(cfg2, "e2e", enroll_num=2, eval_num=3,
                                   num_gauss=4, ivec_dim=3, workers=2,
                                   ubm_frames_cap=20000, verbose=False,
                                   models_dir=models_dir)
        for k in ("mixed_eer", "clean_eer", "clean_threshold", "spoof_rate"):
            assert np.isfinite(res[k]), (k, res)
        score_dir = os.path.join(test_root, "ivector_data", "scores")
        assert os.path.exists(os.path.join(score_dir, "plda_scores_mixed.txt"))

        # second run must reuse the cached models (run.sh [1] semantics):
        # hide the training wavs — scoring must still succeed and agree.
        # (moved aside, not deleted: ge2e_data symlinks into ivector_data)
        train_wavs = os.path.join(test_root, "ivector_data", "wav", "train")
        os.rename(train_wavs, train_wavs + ".hidden")
        try:
            res2 = run_ivector_pipeline(cfg2, "e2e", enroll_num=2, eval_num=3,
                                        num_gauss=4, ivec_dim=3, workers=2,
                                        ubm_frames_cap=20000, verbose=False,
                                        models_dir=models_dir)
        finally:
            os.rename(train_wavs + ".hidden", train_wavs)
        for k in ("mixed_eer", "clean_eer", "clean_threshold", "spoof_rate"):
            assert res2[k] == pytest.approx(res[k], rel=1e-9), (k, res, res2)

        # standalone EER recompute from the saved score file (ivector_eer.sh)
        from spoofsv_tpu.spoofkit.ivector import recompute_eer_from_scores
        eer_ns, thr_ns = recompute_eer_from_scores(
            os.path.join(score_dir, "plda_scores_nospoof.txt"))
        assert eer_ns == pytest.approx(res["clean_eer"], rel=1e-9)
        assert thr_ns == pytest.approx(res["clean_threshold"], rel=1e-9)

        # ---- GE2E: preprocess / short train / full evaluation protocol ----
        import dataclasses
        from spoofsv_tpu.config import GE2EConfig
        from spoofsv_tpu.spoofkit import ge2e_harness as gh
        ge2e = GE2EConfig()
        ge2e = dataclasses.replace(
            ge2e,
            unprocessed_data=os.path.join(test_root, "ge2e_data", "*", "*.wav"),
            save_simmat_dir=os.path.join(work, "simmat"),
            data=dataclasses.replace(ge2e.data,
                                     train_path=os.path.join(work, "tisv_train"),
                                     test_path=os.path.join(work, "tisv_test")),
            model=dataclasses.replace(ge2e.model, hidden=32, num_layer=2,
                                      proj=16),
            train=dataclasses.replace(ge2e.train, N=1, M=4,
                                      checkpoint_interval=1,
                                      checkpoint_dir=os.path.join(work, "ge2e_ck")),
            test=dataclasses.replace(ge2e.test, N=2, M=16, epochs=1))
        # enroll_num here = real utts per test speaker (2 enroll + 3 eval),
        # eval_num = spoof utts — the reference's calling convention
        # (GE2E/data_preprocess.py:102)
        gh.save_spectrogram_tisv(ge2e, train_spk_num=1, enroll_num=5,
                                 eval_num=3, seed=0, verbose=False)
        assert len(os.listdir(os.path.join(work, "tisv_test"))) == 2
        gh.train_ge2e(ge2e, max_epochs=1, verbose=False)
        ck = sorted(glob.glob(os.path.join(work, "ge2e_ck", "*.npz")))
        assert ck
        res2 = gh.run_ge2e_evaluation(ge2e, enroll_num=2, eval_num=3,
                                      model_path=ck[-1], epochs=1,
                                      verbose=False)
        for k in ("EER", "clean_threshold", "spoof_rate", "gt_FRR"):
            assert np.isfinite(res2[k]), (k, res2)
        simmats = glob.glob(os.path.join(work, "simmat", "*.npy"))
        assert simmats

        # ---- anti-spoofing countermeasure: train + dev scoring ----
        monkeypatch.chdir(work)       # CM CLI writes ./checkpoints, ./cm_scores
        from spoofsv_tpu.cli import antispoof as cm_cli
        cm_cli.main(["train", "-C", cfg_path, "-T", "e2e",
                     "--max_iterations", "3"])
        cm_ck = os.path.join(work, "checkpoints", "e2e", "final.npz")
        assert os.path.exists(cm_ck)
        cm_cli.main(["dev", "-C", cfg_path, "-T", "e2e", "-R", cm_ck])
        score_files = glob.glob(os.path.join(work, "cm_scores", "*e2e*"))
        assert score_files
        lines = open(score_files[0]).read().strip().splitlines()
        # dev = TTS-train-list tail (empty here, list < 20k) + the protocol's
        # 9 spoof FLACs (anti_spoofing/spoof_conv1d.py:9-68 semantics); the
        # spoof rows exercise the native FLAC decode path end-to-end
        assert len(lines) == 9, lines[:3]

        # ---- SR-vs-FRR curves from both systems' outputs ----
        from spoofsv_tpu.cli import curve as curve_cli
        out_png = os.path.join(work, "curve.png")
        curve_cli.main(["--simmat", simmats[0],
                        "--ivector_score",
                        os.path.join(test_root, "ivector_data", "scores",
                                     "plda_scores_mixed.txt"),
                        "--n_speakers", "2", "--eval_num", "3",
                        "--out", out_png])
        assert os.path.exists(out_png) and os.path.getsize(out_png) > 0
