"""i-vector pipeline CLI — the ``kaldi_ivectors/run.sh`` equivalent.

``spoofsv-ivector -C config.json -T <ctime>`` runs feature extraction
(MFCC + deltas + sliding CMVN + energy VAD), UBM / T-matrix / PLDA training
at the reference's Kaldi scale (1024 Gaussians / 400-dim i-vectors,
run.sh:105-129; ``--num_gauss/--ivec_dim`` scale it down), mixed + no-spoof
scoring, EER and spoof rate — no external Kaldi install.

``--models_dir <dir>`` caches UBM/T/PLDA between invocations (the
reference's first-run-only training, ``run.sh [0|1]``): the first run trains
and saves there; later runs load and skip straight to scoring.

``--recompute_eer <scores.txt>`` recomputes EER + threshold from a saved
score file (``ivector_eer.sh:30``); add ``--spoof_threshold`` to also report
the spoof rate at that threshold (``ivector_spoofrate.py``).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> None:
    ps = argparse.ArgumentParser(description="i-vector + PLDA evaluation")
    ps.add_argument("-C", "--configuration", type=str)
    ps.add_argument("-T", "--current_time", type=str)
    ps.add_argument("--enroll_num", type=int, default=3)
    ps.add_argument("--eval_num", type=int, default=20)
    ps.add_argument("--num_gauss", type=int, default=1024)
    ps.add_argument("--ivec_dim", type=int, default=400)
    ps.add_argument("--no_deltas", action="store_true",
                    help="disable Kaldi add-deltas (order 2, window 3) in "
                         "the MFCC front-end; default ON for parity with "
                         "the sid/ scripts' 60-dim features")
    ps.add_argument("--max_train_utts_per_spk", type=int, default=40)
    ps.add_argument("--workers", type=int, default=8)
    ps.add_argument("--diag_ubm", action="store_true",
                    help="skip the full-covariance UBM upgrade "
                         "(run.sh:110-118) and stay diagonal")
    ps.add_argument("--full_ubm_iters", type=int, default=3)
    ps.add_argument("--models_dir", type=str, default=None,
                    help="cache trained UBM/T/PLDA here and reuse on later "
                         "runs (run.sh first-run-only training)")
    ps.add_argument("--backend", type=str, default="auto",
                    choices=["auto", "jax", "native"],
                    help="EM/stats/extraction compute backend: batched XLA "
                         "einsums (jax — MXU on TPU) or the scalar C++ "
                         "reference path (native)")
    ps.add_argument("--recompute_eer", type=str, default=None, metavar="SCORES",
                    help="recompute EER from a saved score file and exit "
                         "(ivector_eer.sh)")
    ps.add_argument("--spoof_threshold", type=float, default=None,
                    help="with --recompute_eer: also report spoof rate at "
                         "this threshold (ivector_spoofrate.py)")
    args = ps.parse_args(argv)

    if args.recompute_eer:
        from spoofsv_tpu.spoofkit.ivector import (
            recompute_eer_from_scores, spoof_rate_from_scores)

        eer, thr = recompute_eer_from_scores(args.recompute_eer)
        out = {"eer": eer, "threshold": thr}
        if args.spoof_threshold is not None:
            rate, n = spoof_rate_from_scores(
                args.recompute_eer, args.spoof_threshold,
                args.enroll_num, args.eval_num)
            out.update({"spoof_rate": rate, "n_spoof_targets": n,
                        "spoof_threshold": args.spoof_threshold})
        print(json.dumps(out))
        return

    if not args.configuration or not args.current_time:
        ps.error("-C and -T are required unless --recompute_eer is given")

    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.spoofkit.ivector import run_ivector_pipeline

    cfg = load_config(args.configuration)
    run_ivector_pipeline(cfg, args.current_time, args.enroll_num,
                         args.eval_num, args.num_gauss, args.ivec_dim,
                         args.max_train_utts_per_spk, workers=args.workers,
                         use_full_ubm=not args.diag_ubm,
                         full_ubm_iters=args.full_ubm_iters,
                         models_dir=args.models_dir, backend=args.backend,
                         use_deltas=not args.no_deltas)


if __name__ == "__main__":
    main()
