"""GE2E subsystem CLI: preprocess / train / test / dvector.

Covers the reference's three GE2E entry points with one dispatcher:
``GE2E/data_preprocess.py`` (``preprocess``), ``GE2E/train_speech_embedder.py``
(``train``/``test`` — the reference switches on the yaml ``training`` flag),
and ``GE2E/dvector_create.py`` (``dvector``).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ps = argparse.ArgumentParser(description="GE2E speaker verification (TPU-native)")
    ps.add_argument("command", choices=["preprocess", "train", "test", "dvector"])
    ps.add_argument("--config", type=str, default=None,
                    help="GE2E config.yaml (reference schema)")
    ps.add_argument("--train_spk_num", type=int, default=88)
    ps.add_argument("--enroll_num", type=int, default=3)
    ps.add_argument("--eval_num", type=int, default=20)
    ps.add_argument("--model_path", type=str, default=None)
    ps.add_argument("--epochs", type=int, default=None)
    ps.add_argument("--out_dir", type=str, default=".")
    ps.add_argument("--nospoof_data", type=str, default=None,
                    help="glob over the staged real-only test_nospoof copy "
                         "(e.g. <test_root>/ivector_data/test_nospoof/*/*.wav); "
                         "runs the reference's second test_nospoof pass for "
                         "the clean threshold instead of the slice fast path")
    args = ps.parse_args(argv)

    from spoofsv_tpu.config import GE2EConfig

    ge2e = GE2EConfig.from_yaml(args.config) if args.config else GE2EConfig()

    if args.command == "preprocess":
        from spoofsv_tpu.spoofkit.ge2e_harness import save_spectrogram_tisv

        # reference passes enroll_num+eval_num as the real-crop threshold
        # (GE2E/data_preprocess.py:102)
        save_spectrogram_tisv(ge2e, args.train_spk_num,
                              args.enroll_num + args.eval_num, args.eval_num)
    elif args.command == "train":
        from spoofsv_tpu.spoofkit.ge2e_harness import train_ge2e

        train_ge2e(ge2e, max_epochs=args.epochs)
    elif args.command == "test":
        from spoofsv_tpu.spoofkit.ge2e_harness import run_ge2e_evaluation

        run_ge2e_evaluation(ge2e, args.enroll_num, args.eval_num,
                            model_path=args.model_path, epochs=args.epochs,
                            nospoof_data=args.nospoof_data)
    elif args.command == "dvector":
        import jax

        from spoofsv_tpu.models.ge2e import SpeechEmbedder
        from spoofsv_tpu.spoofkit.dvector import create_dvectors
        from spoofsv_tpu.spoofkit.ge2e_harness import load_ge2e_params

        embedder = SpeechEmbedder(hidden=ge2e.model.hidden,
                                  num_layers=ge2e.model.num_layer,
                                  proj=ge2e.model.proj)
        params = load_ge2e_params(args.model_path or ge2e.model.model_path,
                                  embedder, ge2e.model.proj)
        create_dvectors(ge2e, embedder, params, out_dir=args.out_dir)


if __name__ == "__main__":
    main()
