#!/usr/bin/env python
"""GL spsi campaign-level check (the gl24_check.py pattern).

scripts/gl_init_check.py measures spectral convergence of the SPSI
instantaneous-frequency init on trained-TTS magnitudes; this script closes
the verification-metric question — do EER / spoof-rate / CM numbers hold
when every spoof wav is vocoded with 16 (and 12) SPSI-init iterations
instead of the 24 advance-init production default? For each candidate it
regenerates the spoof set from the SAME trained ordinary TTS and re-scores
all three systems with the SAME trained verifiers, writing
``<root>/state/gl_spsi_check.json``.

Run after the base campaign: ``python scripts/gl_spsi_check.py``.
"""

import glob
import json
import os
import sys

# campaign.py parses argv at import; forward only the campaign root
# (SPOOFSV_CAMPAIGN_ROOT or --root/--root=PATH, default the base _campaign)
_root = os.environ.get("SPOOFSV_CAMPAIGN_ROOT")
for _i, _a in enumerate(sys.argv[1:], 1):
    if _a == "--root":
        if _i + 1 >= len(sys.argv):
            sys.exit("--root requires a path argument")
        _root = sys.argv[_i + 1]
    elif _a.startswith("--root="):
        _root = _a.split("=", 1)[1]
sys.argv = [sys.argv[0]] + (["--root", _root] if _root else [])
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import campaign as C  # noqa: E402

CANDIDATES = [(16, "spsi"), (12, "spsi")]


def score_candidate(iters, init):
    tag = f"campaign_gl{init}{iters}"
    out = {"griffin_lim_iters": iters, "griffin_lim_init": init}

    cfg_path = os.path.join(C.ROOT, f"config_gl{init}{iters}.json")
    d = json.load(open(C.CFG_PATH))
    d.setdefault("TPU", {})["griffin_lim_iters"] = iters
    d["TPU"]["griffin_lim_init"] = init
    with open(cfg_path, "w") as f:
        json.dump(d, f, indent=2)
    marker = os.path.join(C.ROOT, "test", tag)
    if not glob.glob(os.path.join(marker, "spoof_data", "*", "*.wav")):
        out["spoofgen"] = C.stage_spoofgen(tag=tag, cfg_path=cfg_path)
        print(f"[{tag}] spoofgen done", flush=True)

    # ---- GE2E: same trained embedder, new staging ----
    from spoofsv_tpu.spoofkit import ge2e_harness as gh

    ge2e = C._ge2e_config(tag=tag, extra=f"_gl{init}{iters}")
    gh.save_spectrogram_tisv(ge2e, train_spk_num=C.ARGS.train_spk,
                             enroll_num=C.ARGS.enroll + C.ARGS.eval_num,
                             eval_num=C.ARGS.eval_num, seed=0, verbose=False)
    ck = json.load(open(os.path.join(C.STATE, "ge2e.json")))["checkpoint"]
    test_root = os.path.join(C.ROOT, "test", tag)
    out["ge2e"] = gh.run_ge2e_evaluation(
        ge2e, enroll_num=C.ARGS.enroll, eval_num=C.ARGS.eval_num,
        model_path=ck, verbose=True,
        nospoof_data=os.path.join(test_root, "ivector_data", "test_nospoof",
                                  "*", "*.wav"), seed=0)
    print(f"[{tag}] ge2e done", flush=True)

    # ---- i-vector: cached UBM/T/PLDA, scoring only ----
    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.spoofkit.ivector import run_ivector_pipeline

    cfg = load_config(C.CFG_PATH)
    out["ivector"] = run_ivector_pipeline(
        cfg, tag, enroll_num=C.ARGS.enroll, eval_num=C.ARGS.eval_num,
        num_gauss=C.ARGS.ivec_gauss, ivec_dim=C.ARGS.ivec_dim, workers=8,
        models_dir=os.path.join(C.ROOT, "ivector_models"), verbose=True)
    print(f"[{tag}] ivector done", flush=True)

    # ---- CM: same trained countermeasure ----
    out["cm"] = C._score_cm(tag)
    print(f"[{tag}] cm done", flush=True)
    return out


def main():
    for req in ("synthesize", "ge2e", "ivector", "cm"):
        assert os.path.exists(os.path.join(C.STATE, f"{req}.json")), (
            f"base campaign stage '{req}' must be done first")

    out = {"candidates": [score_candidate(i, m) for i, m in CANDIDATES]}

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
    with open(os.path.join(C.STATE, "gl_spsi_check.json"), "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(json.dumps({"base_production": out["base_production"],
                      "candidates": [
                          {k: v for k, v in c.items() if k != "spoofgen"}
                          for c in out["candidates"]]},
                     indent=2, default=float))


if __name__ == "__main__":
    main()
