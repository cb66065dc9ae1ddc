#!/usr/bin/env python
"""GL spsi-16 campaign-level check (the gl24_check.py pattern).

scripts/gl_init_check.py measures spectral convergence of the SPSI
instantaneous-frequency init on trained-TTS magnitudes; this script closes
the verification-metric question — do EER / spoof-rate / CM numbers hold
when every spoof wav is vocoded with 16 SPSI-init iterations instead of the
24 advance-init production default? It regenerates the spoof set from the
SAME trained ordinary TTS with ``griffin_lim_iters=16,
griffin_lim_init="spsi"`` and re-scores all three systems with the SAME
trained verifiers, writing ``<root>/state/gl_spsi_check.json``.

Run after the base campaign: ``python scripts/gl_spsi_check.py``
(root via --root on campaign.py's argv convention or the default).
"""

import glob
import json
import os
import sys

sys.argv = [sys.argv[0]]            # campaign.py parses argv at import
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import campaign as C  # noqa: E402

TAG = "campaign_glspsi"
ITERS, INIT = 16, "spsi"


def main():
    for req in ("synthesize", "ge2e", "ivector", "cm"):
        assert os.path.exists(os.path.join(C.STATE, f"{req}.json")), (
            f"base campaign stage '{req}' must be done first")

    out = {}

    # ---- spoof set at spsi-16 from the same ordinary checkpoints ----
    cfg_path = os.path.join(C.ROOT, "config_glspsi.json")
    d = json.load(open(C.CFG_PATH))
    d.setdefault("TPU", {})["griffin_lim_iters"] = ITERS
    d["TPU"]["griffin_lim_init"] = INIT
    with open(cfg_path, "w") as f:
        json.dump(d, f, indent=2)
    marker = os.path.join(C.ROOT, "test", TAG)
    if not glob.glob(os.path.join(marker, "spoof_data", "*", "*.wav")):
        out["spoofgen"] = C.stage_spoofgen(tag=TAG, cfg_path=cfg_path)
        print("[glspsi] spoofgen done", flush=True)

    # ---- GE2E: same trained embedder, new staging ----
    from spoofsv_tpu.spoofkit import ge2e_harness as gh

    ge2e = C._ge2e_config(tag=TAG, extra="_glspsi")
    gh.save_spectrogram_tisv(ge2e, train_spk_num=C.ARGS.train_spk,
                             enroll_num=C.ARGS.enroll + C.ARGS.eval_num,
                             eval_num=C.ARGS.eval_num, seed=0, verbose=False)
    ck = json.load(open(os.path.join(C.STATE, "ge2e.json")))["checkpoint"]
    test_root = os.path.join(C.ROOT, "test", TAG)
    out["ge2e"] = gh.run_ge2e_evaluation(
        ge2e, enroll_num=C.ARGS.enroll, eval_num=C.ARGS.eval_num,
        model_path=ck, verbose=True,
        nospoof_data=os.path.join(test_root, "ivector_data", "test_nospoof",
                                  "*", "*.wav"), seed=0)
    print("[glspsi] ge2e done", flush=True)

    # ---- i-vector: cached UBM/T/PLDA, scoring only ----
    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.spoofkit.ivector import run_ivector_pipeline

    cfg = load_config(C.CFG_PATH)
    out["ivector"] = run_ivector_pipeline(
        cfg, TAG, enroll_num=C.ARGS.enroll, eval_num=C.ARGS.eval_num,
        num_gauss=C.ARGS.ivec_gauss, ivec_dim=C.ARGS.ivec_dim, workers=8,
        models_dir=os.path.join(C.ROOT, "ivector_models"), verbose=True)
    print("[glspsi] ivector done", flush=True)

    # ---- CM: same trained countermeasure ----
    out["cm"] = C._score_cm(TAG)
    print("[glspsi] cm done", flush=True)

    base = {k: json.load(open(os.path.join(C.STATE, f"{k}.json")))
            for k in ("ge2e", "ivector", "cm")}
    out["base_production"] = {
        "ge2e": {k: base["ge2e"][k] for k in
                 ("EER", "clean_threshold", "spoof_rate", "spoof_rate_at_eer",
                  "gt_FRR")},
        "ivector": {k: base["ivector"][k] for k in
                    ("mixed_eer", "clean_eer", "spoof_rate")},
        "cm": {k: base["cm"][k] for k in ("cm_eer",)},
    }
    out["candidate"] = {"griffin_lim_iters": ITERS, "griffin_lim_init": INIT}
    with open(os.path.join(C.STATE, "gl_spsi_check.json"), "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(json.dumps({k: v for k, v in out.items() if k != "spoofgen"},
                     indent=2, default=float))


if __name__ == "__main__":
    main()
