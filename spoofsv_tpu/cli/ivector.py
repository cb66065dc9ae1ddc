"""i-vector pipeline CLI — the ``kaldi_ivectors/run.sh`` equivalent.

``spoofsv-ivector -C config.json -T <ctime> [--num_gauss 256 --ivec_dim 100]``
runs feature extraction, UBM / T-matrix / PLDA training, mixed + no-spoof
scoring, EER and spoof rate — all via the native libspoofkit backend, no
external Kaldi install.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ps = argparse.ArgumentParser(description="i-vector + PLDA evaluation")
    ps.add_argument("-C", "--configuration", type=str, required=True)
    ps.add_argument("-T", "--current_time", type=str, required=True)
    ps.add_argument("--enroll_num", type=int, default=3)
    ps.add_argument("--eval_num", type=int, default=20)
    ps.add_argument("--num_gauss", type=int, default=256)
    ps.add_argument("--ivec_dim", type=int, default=100)
    ps.add_argument("--max_train_utts_per_spk", type=int, default=40)
    ps.add_argument("--workers", type=int, default=8)
    ps.add_argument("--diag_ubm", action="store_true",
                    help="skip the full-covariance UBM upgrade "
                         "(run.sh:110-118) and stay diagonal")
    ps.add_argument("--full_ubm_iters", type=int, default=3)
    args = ps.parse_args(argv)

    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.spoofkit.ivector import run_ivector_pipeline

    cfg = load_config(args.configuration)
    run_ivector_pipeline(cfg, args.current_time, args.enroll_num,
                         args.eval_num, args.num_gauss, args.ivec_dim,
                         args.max_train_utts_per_spk, workers=args.workers,
                         use_full_ubm=not args.diag_ubm,
                         full_ubm_iters=args.full_ubm_iters)


if __name__ == "__main__":
    main()
