"""CLI entry point mirroring the reference ``main.py:8-49``.

Subcommands ``train_text2mel | train_ssrn | synthesize`` with flags
``-P/--pattern``, ``-R/--resume``, ``-C/--configuration``, ``--adversarial``,
``--save_spectrogram``, ``-T/--current_time`` — same surface, TPU-native
engine underneath.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional

import numpy as np


def inference_dtype(cfg):
    """Compute dtype for inference-path models: ``cfg.tpu.compute_dtype``
    (bf16 by default) on the TPU backend, f32 elsewhere. Params stay f32 —
    checkpoints load unchanged; only the MXU compute runs in bf16."""
    import jax
    import jax.numpy as jnp

    if (jax.default_backend() == "tpu"
            and cfg.tpu.compute_dtype == "bfloat16"):
        return jnp.bfloat16
    return jnp.float32


def training_dtype(cfg):
    """Compute dtype for training-path models: ``cfg.tpu.train_compute_dtype``
    on the TPU backend (default f32 = reference parity; bf16 opt-in). Params
    and optimizer state stay f32 either way — only the MXU compute changes."""
    import jax
    import jax.numpy as jnp

    if (jax.default_backend() == "tpu"
            and cfg.tpu.train_compute_dtype == "bfloat16"):
        return jnp.bfloat16
    return jnp.float32


def apply_runtime_knobs(cfg, infer: bool = False) -> None:
    """Apply process-wide TPUConfig knobs that can't travel through module
    constructors (set before any jit trace). ``infer=True`` (the synthesize/
    spoofgen/serve/export subcommands) selects ``tpu.highway_infer_impl``
    instead of the training impl; the switch is read at trace time, so the
    value in force when a subcommand first jits is the one that sticks for
    that function."""
    import jax

    from spoofsv_tpu.models.layers import set_default_gate_impl

    impl = cfg.tpu.highway_infer_impl if infer else cfg.tpu.highway_gate_impl
    if impl != "xla" and jax.default_backend() == "cpu":
        # Pallas kernels only run in interpret mode on CPU — correct but far
        # slower than XLA; the fused impls are a TPU production default, not
        # a CPU one. (Tests exercise interpret mode by calling
        # set_default_gate_impl directly.)
        impl = "xla"
    set_default_gate_impl(impl)


def build_models(cfg, pattern: str, dtype=None):
    import jax.numpy as jnp

    from spoofsv_tpu.models import LinDisc, MelDisc, MelSyn, SSRN

    dtype = dtype or jnp.float32
    dropout = 0.05 if cfg.apply_dropout else 0.0
    melsyn = MelSyn(
        vocab_len=cfg.vocab_len,
        condition=(pattern == "conditional"),   # train/ordinary.py:160
        spk_emb_dim=cfg.spk_emb_dim,
        text_emb_dim=cfg.text_emb_dim,
        freq_bins=cfg.mel.freq_bins,
        hidden_dim=cfg.hidden_dim,
        dropout_rate=dropout,
        dtype=dtype,
    )
    ssrn = SSRN(freq_bins=cfg.mel.freq_bins, output_bins=cfg.lin_bins,
                ssrn_dim=cfg.ssrn_dim, dropout_rate=dropout, dtype=dtype)
    mel_disc = MelDisc(disc_dim=cfg.disc_dim, dtype=dtype)
    lin_disc = LinDisc(disc_dim=cfg.disc_dim, dtype=dtype)
    return melsyn, ssrn, mel_disc, lin_disc


def resolve_mesh(args, cfg):
    """Data-parallel mesh for training: ``--mesh N`` (N>1), ``--mesh all``,
    or the reference's ``MULTI_GPU`` config key (``config.json:34``,
    ``train/ordinary.py:165-173``) → mesh over all local devices. Returns
    None for single-device training."""
    import jax

    spec = getattr(args, "mesh", None)
    if spec is None and cfg.multi_gpu:
        spec = "all"
    if spec in (None, "1"):
        return None
    n = len(jax.devices()) if spec == "all" else int(spec)
    if n <= 1:
        return None
    from spoofsv_tpu.parallel.mesh import make_mesh

    print(f"[mesh] data-parallel over {n} devices")
    return make_mesh(n)


def run_training(args, cfg, spec_dir: Optional[str]) -> None:
    import jax

    from spoofsv_tpu.data.pipeline import (BucketedLoader, DeviceReplayLoader,
                                           TTSDataSource)
    from spoofsv_tpu.train.loop import Trainer

    melsyn, ssrn, mel_disc, lin_disc = build_models(
        cfg, args.pattern, dtype=training_dtype(cfg))
    if args.step == "train_text2mel":
        gen, disc = melsyn, mel_disc
        with_lin = False
    else:
        gen, disc = ssrn, lin_disc
        with_lin = True

    train_src = TTSDataSource(cfg, "train", spec_dir, need_lin=with_lin,
                              pattern=args.pattern, stage=args.stage)
    val_src = TTSDataSource(cfg, "validate", spec_dir, need_lin=with_lin,
                            pattern=args.pattern, stage=args.stage)

    mesh = resolve_mesh(args, cfg)
    trainer = Trainer(cfg, gen, args.step, pattern=args.pattern,
                      adversarial=args.adversarial,
                      disc_model=disc if args.adversarial else None,
                      ctime=args.current_time, use_masks=args.masked_loss,
                      metrics_every=args.metrics_every, mesh=mesh)

    if args.resume:
        path = args.resume
        if path == "latest":
            path = trainer.ckpt.latest()
            if path is None:
                print("no checkpoint to resume from; starting fresh")
        if path:
            example = next(iter(BucketedLoader(
                train_src, cfg.batch_size, with_lin=with_lin, shuffle=False)))
            trainer.resume(path, example)
            print(f"Resumed from {path} at iteration {trainer.iteration}")

    use_device_data = (args.device_data == "on" or
                       (args.device_data == "auto"
                        and jax.default_backend() != "cpu"))
    if use_device_data:
        # remote-TPU transports pay multiple RPC round-trips + MBs of upload
        # per step; keep the whole (bucket-padded) dataset device-resident
        # and gather batches on device instead. Seeded with the resumed
        # epoch so a restored run continues the original shuffle sequence
        # instead of replaying a fresh run's epochs.
        device_loader = DeviceReplayLoader(train_src, cfg.batch_size,
                                           with_lin=with_lin, shuffle=True,
                                           seed=trainer.epoch, mesh=mesh)

        def train_loader():
            return device_loader
    else:
        def train_loader():
            return BucketedLoader(train_src, cfg.batch_size, with_lin=with_lin,
                                  shuffle=True, seed=trainer.epoch)

    def val_loader():
        return BucketedLoader(val_src, 8, with_lin=with_lin, shuffle=False)

    trainer.fit(train_loader, val_loader, plot=cfg.plot_curve,
                max_iterations=args.max_iterations)


def run_synthesize(args, cfg, spec_dir: Optional[str]) -> None:
    """Batch synthesis over the synthesize split (``synthesize.py:41-147``)."""
    import jax
    import jax.numpy as jnp

    from spoofsv_tpu.data.pipeline import BucketedLoader, TTSDataSource
    from spoofsv_tpu.dsp import host as dsp_host
    from spoofsv_tpu.infer.synthesize import Synthesizer, finalize_audio
    from spoofsv_tpu.utils.checkpoints import load_generator_params

    melsyn, ssrn, _, _ = build_models(cfg, args.pattern,
                                      dtype=inference_dtype(cfg))
    m1_params = load_generator_params(cfg.inference_text2mel_model, melsyn, cfg)
    m2_params = load_generator_params(cfg.inference_ssrn_model, ssrn, cfg,
                                      kind="ssrn")

    sample_dir = os.path.join(cfg.src_root_dir, "samples", args.current_time)
    os.makedirs(sample_dir, exist_ok=True)

    # data-parallel synthesis (the reference's DataParallel wrap,
    # synthesize.py:75-77): batch must divide the data axis, so size the
    # loader batch to a multiple of the mesh when one is requested
    mesh = resolve_mesh(args, cfg)
    batch = 8
    if mesh is not None:
        import numpy as _np

        n_shards = int(_np.prod(mesh.devices.shape))
        batch = max(8 // n_shards, 1) * n_shards

    src = TTSDataSource(cfg, "synthesize", spec_dir, need_lin=True)
    loader = BucketedLoader(src, batch, with_lin=True, shuffle=False)

    fig_dir = os.path.join(sample_dir, "fig")
    key = jax.random.PRNGKey(0)
    synthesizers = {}
    # loss bookkeeping vs ground truth (synthesize.py:113-128)
    from spoofsv_tpu.train.losses import (
        binary_divergence, guided_attention_loss, guided_attention_matrix,
        l1_loss)

    gaw = jnp.asarray(guided_attention_matrix(cfg.max_text_len, cfg.max_frame_num))
    loss_avg_t2m = loss_avg_ssrn = 0.0
    mcd_vals = []
    n_batches = 0
    for i, batch in enumerate(loader):
        t = batch["mel"].shape[1]
        if t not in synthesizers:  # one jitted pipeline per bucket length
            synthesizers[t] = Synthesizer(cfg, melsyn, ssrn, m1_params,
                                          m2_params, n_frames=t, mesh=mesh)
        key, sub = jax.random.split(key)
        b0 = batch["text"].shape[0]
        text_in, spk_in = batch["text"], batch["spk"]
        if mesh is not None and b0 % n_shards:
            # pad flush batches up to the shard multiple (outputs sliced back)
            pad = n_shards - b0 % n_shards
            text_in = np.concatenate([text_in, text_in[-1:].repeat(pad, 0)])
            spk_in = np.concatenate([spk_in, spk_in[-1:].repeat(pad, 0)])
        audio, mel, attn = synthesizers[t](jnp.asarray(text_in),
                                           jnp.asarray(spk_in), sub)
        audio, mel, attn = audio[:b0], mel[:b0], attn[:b0]
        mel_gt = jnp.asarray(batch["mel"])
        l1 = float(l1_loss(mel_gt, mel))
        bd = float(binary_divergence(mel_gt, mel))
        att = float(guided_attention_loss(attn, gaw))
        loss_avg_t2m += l1 + bd + att
        # use the synthesizer's (mesh-replicated) ssrn params — the raw
        # host copy is single-device and can't meet a sharded mel
        lin_pred = synthesizers[t]._ssrn_apply(synthesizers[t].ssrn_params,
                                               mel)
        lin_gt = jnp.asarray(batch["lin"])
        l1s = float(l1_loss(lin_gt, lin_pred))
        bds = float(binary_divergence(lin_gt, lin_pred))
        loss_avg_ssrn += l1s + bds
        n_batches += 1
        print(f"syn set text2mel loss: {l1} {bd} {att} {l1+bd+att}")
        print(f"syn set ssrn loss: {l1s} {bds} {l1s+bds}")
        if args.mcd:
            # objective quality: DTW-aligned mel-cepstral distortion vs GT
            # (free AR decoding drifts in time, hence DTW — spoofkit/mcd.py)
            from spoofsv_tpu.spoofkit.mcd import batch_mcd

            lengths = np.asarray(batch["mel_mask"]).sum(1).astype(int)
            v = batch_mcd(np.asarray(mel_gt), np.asarray(mel)[:b0], lengths,
                          analysis_power=cfg.norm.analysis_power)
            mcd_vals.append(v)
            print(f"syn set mcd: {v:.3f} dB")
        audio = np.asarray(audio)
        for k in range(audio.shape[0]):
            wav = finalize_audio(audio[k], cfg)
            dsp_host.write_wav(
                os.path.join(sample_dir, f"S{k+1}_B{i+1}.wav"),
                wav, cfg.sampling_rate)   # naming: synthesize.py:147
        # attention heatmap of the batch's first item (synthesize.py:111)
        from spoofsv_tpu.train.loop import plot_attention

        plot_attention(np.asarray(attn[0]), i + 1, fig_dir)
        print(f"batch {i+1}: wrote {audio.shape[0]} wavs to {sample_dir}")
    if n_batches:
        print(f"syn set avg: text2mel {loss_avg_t2m / n_batches:.4f} "
              f"ssrn {loss_avg_ssrn / n_batches:.4f}"
              + (f" mcd {float(np.mean(mcd_vals)):.3f} dB"
                 if mcd_vals else ""))


def main(argv=None) -> None:
    ps = argparse.ArgumentParser(description="Adversarial Conditional Text-to-speech (TPU-native)")
    ps.add_argument("step", choices=["train_text2mel", "train_ssrn", "synthesize"],
                    metavar="s")
    ps.add_argument("-P", "--pattern",
                    choices=["universal", "conditional", "ubm-finetune"],
                    default="conditional", metavar="m")
    ps.add_argument("-R", "--resume", type=str, default=None, metavar="checkpoint")
    ps.add_argument("-C", "--configuration", type=str, default=None)
    ps.add_argument("--adversarial", action="store_true")
    ps.add_argument("--save_spectrogram", action="store_true")
    ps.add_argument("-T", "--current_time", type=str, required=True, metavar="T")
    # TPU-native extras (no reference counterpart)
    ps.add_argument("--stage", choices=["ubm", "finetune"], default=None,
                    help="stage for the ubm-finetune pattern (data/dataset.py:53-77)")
    ps.add_argument("--masked_loss", action="store_true",
                    help="exclude padded frames from losses (reference averages over pads)")
    ps.add_argument("--max_iterations", type=int, default=None)
    ps.add_argument("--mcd", action="store_true",
                    help="synthesize: also report DTW-aligned mel-cepstral "
                         "distortion vs ground truth (spoofkit/mcd.py)")
    ps.add_argument("--device_data", choices=["auto", "on", "off"],
                    default="auto",
                    help="keep the bucket-padded dataset device-resident and "
                         "gather batches on device (auto: on for non-CPU "
                         "backends; essential on tunneled TPU transports)")
    ps.add_argument("--mesh", type=str, default=None, metavar="N|all",
                    help="data-parallel training over an N-device mesh "
                         "(replicated params, batch sharded over ICI; the "
                         "TPU equivalent of the reference's MULTI_GPU "
                         "DataParallel). Default: MULTI_GPU config key")
    ps.add_argument("--metrics_every", type=int, default=1,
                    help="fetch/log train metrics every N iterations "
                         "(device->host fetches sync the stream; >1 lets "
                         "steps pipeline on remote-TPU transports)")
    args = ps.parse_args(argv)

    from spoofsv_tpu.config import load_config

    # persistent XLA compile cache: the fused fwd+bwd graphs take minutes to
    # compile on remote-TPU backends; cache across runs.
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/spoofsv_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = load_config(args.configuration)
    apply_runtime_knobs(
        cfg, infer=args.step not in ("train_text2mel", "train_ssrn"))

    if args.save_spectrogram:
        spec_dir = os.path.join(cfg.src_root_dir, "spec")
        os.makedirs(spec_dir, exist_ok=True)    # main.py:22-27
    else:
        spec_dir = None

    if args.step in ("train_text2mel", "train_ssrn"):
        run_training(args, cfg, spec_dir)
    else:
        run_synthesize(args, cfg, spec_dir)


if __name__ == "__main__":
    main()
