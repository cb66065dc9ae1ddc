#!/usr/bin/env python
"""End-to-end learning-dynamics check on the toy corpus (CPU-friendly).

Runs the REAL stack — prepare_vctk splits → TTSDataSource features →
BucketedLoader → Trainer (ordinary, teacher-forced + guided attention) →
scan AR decoder — on the synthetic char→tone corpus and reports whether
attention became monotonic.

Usage: PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/train_toy_e2e.py [steps]
       [--adversarial]   (WGAN-GP, train/adversarial_wasserstein_gp.py regime)
Env: SPOOFSV_TOY_TPU=1 runs on the TPU backend; SPOOFSV_TOY_METRICS_EVERY=k
sets the metric fetch cadence.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/spoofsv_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if not os.environ.get("SPOOFSV_TOY_TPU"):
    jax.config.update("jax_platforms", "cpu")

from spoofsv_tpu.data.pipeline import BucketedLoader, TTSDataSource
from spoofsv_tpu.data.toy import (
    attention_monotonicity,
    generate_toy_corpus,
    toy_config,
)
from spoofsv_tpu.data.vctk import prepare_vctk
from spoofsv_tpu.infer.decode import make_decoder
from spoofsv_tpu.models import MelSyn
from spoofsv_tpu.train.loop import Trainer


def main():
    import argparse
    ps = argparse.ArgumentParser(description="toy-corpus learning dynamics")
    ps.add_argument("steps", type=int, nargs="?", default=2000)
    ps.add_argument("--adversarial", action="store_true",
                    help="WGAN-GP regime (RATIO D:G alternation)")
    cli = ps.parse_args()
    adversarial = cli.adversarial
    steps = cli.steps
    work = tempfile.mkdtemp(prefix="toy_e2e_")
    data_root = os.path.join(work, "corpus")
    spk_emb = os.path.join(work, "spk_emb")
    print(f"[toy-e2e] workdir {work}", flush=True)

    generate_toy_corpus(data_root, spk_emb, n_speakers=4, utts_per_spk=40)
    cfg = toy_config(data_root, spk_emb, work)
    prepare_vctk(cfg, verbose=False)

    source = TTSDataSource(cfg, mode="train",
                           spec_dir=os.path.join(work, "spec"))
    source.warm_cache()
    loader = BucketedLoader(source, cfg.batch_size, seed=0)

    model = MelSyn(vocab_len=cfg.vocab_len, condition=True,
                   spk_emb_dim=cfg.spk_emb_dim, text_emb_dim=cfg.text_emb_dim,
                   freq_bins=cfg.mel.freq_bins, hidden_dim=cfg.hidden_dim)
    disc = None
    if adversarial:
        from spoofsv_tpu.models.discriminator import MelDisc
        disc = MelDisc(disc_dim=cfg.disc_dim)
    trainer = Trainer(cfg, model, "train_text2mel", ctime="toy",
                      adversarial=adversarial, disc_model=disc,
                      validate_with_decode=False,
                      metrics_every=int(os.environ.get(
                          "SPOOFSV_TOY_METRICS_EVERY", "1")))

    key = jax.random.PRNGKey(0)
    it = 0
    t0 = time.time()
    fetched = []              # (iteration, loss) whenever metrics were fetched
    while it < steps:
        for batch in loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if trainer.state is None:
                trainer.init(jax.random.PRNGKey(0), batch)
            key, sub = jax.random.split(key)
            m = trainer.train_iteration(batch, sub)
            if m and "loss" in m:
                fetched.append((it, m["loss"]))
            it += 1
            if it % 200 == 0 and m:
                shown = " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items())
                                 if k in ("loss", "att", "loss_d", "wd", "gp"))
                print(f"[toy-e2e] iter {it} {shown} "
                      f"({(time.time()-t0)/it*1000:.0f} ms/it)", flush=True)
            if it >= steps:
                break
    first_losses = [l for _, l in fetched[:3]] or [float("nan")]
    last_losses = [l for _, l in fetched[-3:]] or [float("nan")]

    # AR decode on held-out sentences; measure attention monotonicity
    val = TTSDataSource(cfg, mode="validate",
                        spec_dir=os.path.join(work, "spec"))
    vload = BucketedLoader(val, 8, seed=0, shuffle=False)
    vb = next(iter(vload))
    n_frames = int(vb["mel"].shape[1])
    decoder = make_decoder(model, n_frames)
    _, att, _ = decoder(trainer._gen_params(), jnp.asarray(vb["text"]),
                        jnp.asarray(vb["spk"]))
    att = np.asarray(att)

    mets = []
    for b in range(att.shape[0]):
        tl = int(np.asarray(vb["text_mask"][b]).sum())
        fl = int(np.asarray(vb["mel_mask"][b]).sum())
        mets.append(attention_monotonicity(att[b], tl, fl))
    summary = {
        "steps": steps,
        "adversarial": adversarial,
        "wd_tail": [round(v, 4) for v in trainer.loss_logs["wd"][-5:]],
        "loss_first": float(np.mean(first_losses)),
        "loss_last": float(np.mean(last_losses)),
        "forward_frac": float(np.mean([m["forward_frac"] for m in mets])),
        "coverage": float(np.mean([m["coverage"] for m in mets])),
        "confidence": float(np.mean([m["confidence"] for m in mets])),
        "sec_per_iter": (time.time() - t0) / max(1, it),
    }
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
