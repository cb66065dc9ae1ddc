#!/usr/bin/env python
"""Quantify the add-deltas front-end change on the campaign's spoof set.

Round 4 added Kaldi-parity delta features (order 2, window 3) to the
i-vector front-end (VERDICT r3, missing #2 — the sid/ scripts the reference
drives apply ``add-deltas`` before CMVN, so the attacked system models
60-dim features). This driver re-scores the EXISTING round-3 campaign
staging (``_campaign/test/campaign``) at reference scale (1024 Gaussians /
400-dim i-vectors) both ways:

  a. cached no-delta models from round 3 (scoring only — run.sh [1]
     semantics), the before;
  b. freshly trained delta models (60-dim UBM/T/PLDA), the after;

and writes ``docs/IVECTOR_DELTAS.json`` with the EER / threshold /
spoof-rate shift, which CAMPAIGN.md quotes.

Run: ``python scripts/ivector_delta_rescore.py [--root /root/repo/_campaign]``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts._benchlib import setup_cache  # noqa: E402

setup_cache()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "IVECTOR_DELTAS.json")


def main():
    ps = argparse.ArgumentParser()
    ps.add_argument("--root", default=os.path.join(REPO, "_campaign"))
    ps.add_argument("--tag", default="campaign")
    ps.add_argument("--enroll", type=int, default=3)
    ps.add_argument("--eval_num", type=int, default=20)
    args = ps.parse_args()

    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.spoofkit.ivector import run_ivector_pipeline

    cfg = load_config(os.path.join(args.root, "config.json"))
    common = dict(enroll_num=args.enroll, eval_num=args.eval_num,
                  num_gauss=1024, ivec_dim=400, workers=8,
                  max_train_utts_per_spk=20, ubm_frames_cap=400_000,
                  verbose=True)

    results = {}
    # (a) before: round-3 cached no-delta models (meta pins use_deltas=False)
    t0 = time.perf_counter()
    results["no_deltas_cached_r3"] = run_ivector_pipeline(
        cfg, args.tag,
        models_dir=os.path.join(args.root, "ivector_models_ref"), **common)
    results["no_deltas_cached_r3"]["_wall_s"] = round(
        time.perf_counter() - t0, 1)

    # (b) after: fresh reference-scale training on 60-dim delta features
    t0 = time.perf_counter()
    results["deltas_fresh"] = run_ivector_pipeline(
        cfg, args.tag, use_deltas=True,
        models_dir=os.path.join(args.root, "ivector_models_ref_deltas"),
        **common)
    results["deltas_fresh"]["_wall_s"] = round(time.perf_counter() - t0, 1)

    for k in ("mixed_eer", "clean_eer", "clean_threshold", "spoof_rate"):
        a = results["no_deltas_cached_r3"].get(k)
        b = results["deltas_fresh"].get(k)
        if a is not None and b is not None:
            results.setdefault("shift", {})[k] = round(b - a, 5)

    art = {"scale": "1024 Gaussians / 400-dim (run.sh:105-129)",
           "staging": os.path.join(args.root, "test", args.tag),
           "feature_front_end": {
               "before": "MFCC20 + sliding CMVN + energy VAD (r3)",
               "after": "MFCC20 + add-deltas(order2,window3) -> 60-dim + "
                        "sliding CMVN + energy VAD (Kaldi sid/ parity)"},
           "results": results}
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1, default=float)
    print(json.dumps(art, indent=1, default=float))
    print(f"[ivector_delta_rescore] wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
