#!/usr/bin/env python
"""GL advance-24 campaign-level check.

advance-24 measures spectral convergence EQUAL to the reference's
random-init-64 (docs/PARITY.md); this script closes the remaining question —
do the *verification metrics* hold when every spoof wav goes through 24
iterations instead of the production default 32? It regenerates the spoof
set from the SAME trained ordinary TTS with ``griffin_lim_iters=24`` and
re-scores all three systems with the SAME trained verifiers (the campaign's
adversarial-chain pattern), writing ``<root>/state/gl24_check.json``.

Run after the base campaign: ``python scripts/gl24_check.py``.
"""

import dataclasses
import glob
import json
import os
import sys

sys.argv = [sys.argv[0]]            # campaign.py parses argv at import
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import campaign as C  # noqa: E402

TAG24 = "campaign_gl24"


def main():
    for req in ("synthesize", "ge2e", "ivector", "cm"):
        assert os.path.exists(os.path.join(C.STATE, f"{req}.json")), (
            f"base campaign stage '{req}' must be done first")

    out = {}

    # ---- spoof set at GL24 from the same ordinary checkpoints ----
    cfg24 = os.path.join(C.ROOT, "config_gl24.json")
    d = json.load(open(C.CFG_PATH))
    d.setdefault("TPU", {})["griffin_lim_iters"] = 24
    with open(cfg24, "w") as f:
        json.dump(d, f, indent=2)
    marker = os.path.join(C.ROOT, "test", TAG24)
    if not glob.glob(os.path.join(marker, "spoof_data", "*", "*.wav")):
        out["spoofgen"] = C.stage_spoofgen(tag=TAG24, cfg_path=cfg24)
        print("[gl24] spoofgen done", flush=True)

    # ---- GE2E: same trained embedder, new staging ----
    from spoofsv_tpu.spoofkit import ge2e_harness as gh

    ge2e = C._ge2e_config(tag=TAG24, extra="_gl24")
    gh.save_spectrogram_tisv(ge2e, train_spk_num=C.ARGS.train_spk,
                             enroll_num=C.ARGS.enroll + C.ARGS.eval_num,
                             eval_num=C.ARGS.eval_num, seed=0, verbose=False)
    ck = json.load(open(os.path.join(C.STATE, "ge2e.json")))["checkpoint"]
    test_root = os.path.join(C.ROOT, "test", TAG24)
    out["ge2e"] = gh.run_ge2e_evaluation(
        ge2e, enroll_num=C.ARGS.enroll, eval_num=C.ARGS.eval_num,
        model_path=ck, verbose=True,
        nospoof_data=os.path.join(test_root, "ivector_data", "test_nospoof",
                                  "*", "*.wav"), seed=0)
    print("[gl24] ge2e done", flush=True)

    # ---- i-vector: cached UBM/T/PLDA, scoring only ----
    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.spoofkit.ivector import run_ivector_pipeline

    cfg = load_config(C.CFG_PATH)
    out["ivector"] = run_ivector_pipeline(
        cfg, TAG24, enroll_num=C.ARGS.enroll, eval_num=C.ARGS.eval_num,
        num_gauss=C.ARGS.ivec_gauss, ivec_dim=C.ARGS.ivec_dim, workers=8,
        models_dir=os.path.join(C.ROOT, "ivector_models"), verbose=True)
    print("[gl24] ivector done", flush=True)

    # ---- CM: same trained countermeasure ----
    out["cm"] = C._score_cm(TAG24)
    print("[gl24] cm done", flush=True)

    base = {k: json.load(open(os.path.join(C.STATE, f"{k}.json")))
            for k in ("ge2e", "ivector", "cm")}
    out["base_gl32"] = {
        "ge2e": {k: base["ge2e"][k] for k in
                 ("EER", "clean_threshold", "spoof_rate", "spoof_rate_at_eer",
                  "gt_FRR")},
        "ivector": {k: base["ivector"][k] for k in
                    ("mixed_eer", "clean_eer", "spoof_rate")},
        "cm": {k: base["cm"][k] for k in ("cm_eer",)},
    }
    with open(os.path.join(C.STATE, "gl24_check.json"), "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(json.dumps({k: v for k, v in out.items() if k != "spoofgen"},
                     indent=2, default=float))


if __name__ == "__main__":
    main()
