"""``generate_test_utterances.py`` CLI equivalent: spoof set + staging.

Same flags (``generate_test_utterances.py:44-51``): ``-C``, ``--train_spk_num``,
``--enroll_utt_num``, ``--eval_utt_num``, ``-T``.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ps = argparse.ArgumentParser(
        description="Adversarial Conditional Text-to-speech (spoof set)")
    ps.add_argument("-C", "--configuration", type=str, required=True)
    ps.add_argument("--train_spk_num", type=int, default=88)
    ps.add_argument("--enroll_utt_num", type=int, default=3)
    ps.add_argument("--eval_utt_num", type=int, default=20)
    ps.add_argument("-T", "--current_time", type=str, required=True)
    ps.add_argument("--speaker_batch", type=int, default=8,
                    help="speakers synthesized per device batch")
    ps.add_argument("--skip_synthesis", action="store_true")
    ps.add_argument("--skip_staging", action="store_true")
    ps.add_argument("--mesh", type=str, default=None, metavar="N|all",
                    help="data-parallel spoof-set synthesis over an N-device "
                         "mesh (speaker_batch must divide the data axis)")
    args = ps.parse_args(argv)

    from spoofsv_tpu.cli.main import (apply_runtime_knobs, build_models,
                                      inference_dtype, resolve_mesh)
    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.infer.synthesize import Synthesizer
    from spoofsv_tpu.spoofkit import spoofgen
    from spoofsv_tpu.utils.checkpoints import load_generator_params

    cfg = load_config(args.configuration)
    apply_runtime_knobs(cfg, infer=True)

    if not args.skip_synthesis:
        melsyn, ssrn, _, _ = build_models(cfg, "conditional",
                                          dtype=inference_dtype(cfg))
        m1 = load_generator_params(cfg.inference_text2mel_model, melsyn, cfg)
        m2 = load_generator_params(cfg.inference_ssrn_model, ssrn, cfg, kind="ssrn")
        syn = Synthesizer(cfg, melsyn, ssrn, m1, m2,
                          n_frames=cfg.max_frame_num,  # 325-frame rollout
                          mesh=resolve_mesh(args, cfg))
        spoofgen.generate_spoof_set(cfg, args.current_time, syn,
                                    eval_utt_num=args.eval_utt_num,
                                    speaker_batch=args.speaker_batch)

    if not args.skip_staging:
        print("I-VECTORs test data generation")
        spoofgen.stage_ivector_data(cfg, args.current_time, args.train_spk_num,
                                    args.enroll_utt_num, args.eval_utt_num)
        print("GE2E test data generation")
        spoofgen.stage_ge2e_data(cfg, args.current_time)
        print("Anti-spoofing test data generation")
        spoofgen.stage_antispoof_data(cfg, args.current_time)


if __name__ == "__main__":
    main()
