"""``spoofsv-export``: save a framework checkpoint as a reference ``.tar.pth``.

Two-way interop closer (the importer direction is
``utils/torch_import.py``): point it at an orbax checkpoint directory saved
by the Trainer (or any checkpoint ``utils.checkpoints.load_generator_params``
accepts) and it writes a PyTorch checkpoint in the reference repo's schema
(``train/ordinary.py:271-284``) that the reference's ``melSyn``/``SSRN``/
``SpeechEmbedder`` classes load unchanged.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ps = argparse.ArgumentParser(description="export to reference .tar.pth")
    ps.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir (Trainer layout) or .tar.pth")
    ps.add_argument("--kind", required=True,
                    choices=["text2mel", "ssrn", "critic", "ge2e"])
    ps.add_argument("--out", required=True, help="output .tar.pth path")
    ps.add_argument("-C", "--configuration", type=str, default=None)
    ps.add_argument("--pattern", default="conditional",
                    choices=["universal", "conditional", "ubm-finetune"])
    ps.add_argument("--iteration", type=int, default=0)
    args = ps.parse_args(argv)

    from spoofsv_tpu.cli.main import build_models
    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.utils import torch_export
    from spoofsv_tpu.utils.checkpoints import load_generator_params

    # critic/ge2e exports don't need model dims; -C is required only for
    # the generator kinds (their flax modules must be rebuilt to re-load
    # orbax checkpoints)
    cfg = load_config(args.configuration) if args.configuration else None
    if args.kind in ("text2mel", "ssrn") and cfg is None:
        ps.error("--kind text2mel/ssrn requires -C <config.json>")

    if args.kind == "ge2e":
        # GE2E checkpoints are bare param trees (ge2e_harness save format)
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            import os

            params = ckptr.restore(os.path.abspath(args.ckpt))
        sd = torch_export.export_ge2e_embedder(params)
        key = None
    elif args.kind == "critic":
        # critics live in AdvTrainState.disc_params (adversarial Trainer
        # checkpoints) or under 'disc_state_dict' in reference .tar.pth —
        # load_generator_params handles neither.
        if args.ckpt.endswith((".pth", ".pt", ".tar")):
            from spoofsv_tpu.utils.torch_import import import_critic

            params = import_critic(args.ckpt)
        else:
            import os

            import orbax.checkpoint as ocp

            with ocp.PyTreeCheckpointer() as ckptr:
                restored = ckptr.restore(os.path.abspath(args.ckpt))
            if isinstance(restored, dict) and "disc_params" in restored:
                params = restored["disc_params"]
            else:
                params = restored
        sd = torch_export.export_critic(params)
        key = "disc_state_dict"
    else:
        melsyn, ssrn, _, _ = build_models(cfg, args.pattern)
        model = {"text2mel": melsyn, "ssrn": ssrn}[args.kind]
        params = load_generator_params(args.ckpt, model, cfg, kind=args.kind)
        export = {"text2mel": torch_export.export_melsyn,
                  "ssrn": torch_export.export_ssrn}[args.kind]
        sd = export(params)
        key = "model_state_dict"

    if key is None:
        # reference GE2E checkpoints are bare state_dicts
        # (GE2E/train_speech_embedder.py:98-109)
        import torch
        import numpy as np

        torch.save({k: torch.from_numpy(np.asarray(v, np.float32).copy())
                    for k, v in sd.items()}, args.out)
    else:
        torch_export.save_reference_checkpoint(args.out, sd, key=key,
                                               iteration=args.iteration)
    print(f"[export] wrote {args.kind} checkpoint ({len(sd)} tensors) "
          f"to {args.out}")


if __name__ == "__main__":
    main()
