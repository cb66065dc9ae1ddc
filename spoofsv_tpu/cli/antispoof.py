"""Anti-spoofing CM CLI — ``anti_spoofing/main_spoof_conv1d.py`` equivalent.

``spoofsv-antispoof {train,dev} -C config.json -T <ctime> [-R ckpt]``.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    ps = argparse.ArgumentParser(description="Anti-spoofing countermeasure")
    ps.add_argument("step", choices=["train", "dev"], metavar="s")
    ps.add_argument("-T", "--time", type=str, required=True)
    ps.add_argument("-R", "--resume", type=str, default=None)
    ps.add_argument("-C", "--configuration", type=str, required=True)
    ps.add_argument("--variant", type=str, default=None)
    ps.add_argument("--feat", choices=["mel", "lin"], default="mel")
    ps.add_argument("--max_iterations", type=int, default=None)
    ps.add_argument("--save_interval", type=int, default=1000)
    ps.add_argument("--bonafide_cap", type=int, default=20000,
                    help="TTS-train-list utterances used as train bonafide; "
                         "the remainder becomes the dev bonafide side "
                         "(anti_spoofing/spoof_conv1d.py:9-68 uses 20k)")
    args = ps.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.models.discriminator import Critic1D
    from spoofsv_tpu.spoofkit.antispoof import (
        ASVspoofSource,
        batches,
        cm_eer,
        make_cm_train_step,
        write_cm_scores,
    )

    cfg = load_config(args.configuration)
    # --variant mirrors melDisc_v1/v2 (anti_spoofing/discriminator.py:134-306;
    # the reference versions have broken constructors — see docs/PARITY.md):
    # v1 = lighter pooling (pool1=2, no second pool), v2 = extra conv/pool stage.
    pool2 = None if args.variant == "v1" else (2 if args.feat == "mel" else 4)
    pool1 = (2 if args.variant == "v1" else (4 if args.feat == "mel" else 8))
    if args.feat == "mel":
        model = Critic1D(disc_dim=cfg.disc_dim, pool1=pool1, pool2=pool2,
                         mid_dim=4, extra_stage=(args.variant == "v2"),
                         sigmoid_out=True)
    else:
        model = Critic1D(disc_dim=cfg.disc_dim, pool1=pool1, pool2=pool2,
                         mid_dim=8, extra_stage=(args.variant == "v2"),
                         sigmoid_out=True)

    source = ASVspoofSource(cfg, args.step, args.time,
                            bonafide_cap=args.bonafide_cap)
    print(f"{args.step}: {len(source)} utterances "
          f"({int(source.labels.sum())} bonafide)")
    init_fn, step_fn, score_fn = make_cm_train_step(model)

    save_dir = os.path.join("./checkpoints", args.time)
    if args.step == "train":
        os.makedirs(save_dir, exist_ok=True)
        params = opt_state = None
        it = 0
        key = jax.random.PRNGKey(0)
        for epoch in range(20000):
            for batch in batches(source, 64, cfg.tpu.bucket_frames, True,
                                 seed=epoch, feat=args.feat):
                x = jnp.asarray(batch["x"])
                if params is None:
                    params, opt_state = init_fn(jax.random.PRNGKey(0), x)
                key, sub = jax.random.split(key)
                params, opt_state, loss = step_fn(
                    params, opt_state, x, jnp.asarray(batch["label"]), sub)
                it += 1
                if it % 50 == 0:
                    print(f"iter {it} loss {float(loss):.4f}")
                if it % args.save_interval == 0:
                    _save(params, os.path.join(save_dir, f"{it}_iteration.npz"))
                if args.max_iterations and it >= args.max_iterations:
                    _save(params, os.path.join(save_dir, "final.npz"))
                    return
    else:
        params = _load(args.resume)
        scores = []
        for batch in batches(source, 64, cfg.tpu.bucket_frames, False,
                             feat=args.feat):
            pred = np.asarray(score_fn(params, jnp.asarray(batch["x"])))
            for i in range(len(pred)):
                scores.append((int(batch["idx"][i]), float(batch["label"][i]),
                               float(pred[i])))
        path = write_cm_scores(scores, args.time)
        labels = np.asarray([s[1] for s in scores])
        vals = np.asarray([s[2] for s in scores])
        eer, thr = cm_eer(labels, vals)
        print(f"wrote {path}; CM EER {eer:.4f} @ {thr:.4f}")


def _save(params, path):
    import jax
    import numpy as np

    flat = {"/".join(str(getattr(k, "key", k)) for k in p): np.asarray(l)
            for p, l in jax.tree_util.tree_leaves_with_path(params)}
    np.savez(path, **flat)


def _load(path):
    import jax.numpy as jnp
    import numpy as np

    data = np.load(path)
    tree = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return tree


if __name__ == "__main__":
    main()
