"""Jitted train steps: ordinary and adversarial (vanilla GAN / WGAN / WGAN-GP).

Re-designs the reference trainers as pure jitted functions:

  * ordinary (``train/ordinary.py:216-256``): teacher-forced Text2Mel or SSRN
    with L1 + binary-divergence (+ guided attention) losses, one fused
    forward/backward/Adam update per call;
  * WGAN-GP (``train/adversarial_wasserstein_gp.py:261-370``, the default
    wired to ``main.py:4``): generator step with the reference's *adaptive
    critic weighting* (recon/|critic| coefficient, stop-gradient), critic step
    with per-sample-interpolate gradient penalty via grad-of-grad — the double
    backward is plain nested ``jax.grad`` fused into a single XLA program;
  * WGAN weight-clip (``train/adversarial_wasserstein.py:20-25,357``) and
    vanilla GAN with its fixed time slices 1:9 / 1:33 and no-sigmoid log loss
    (``train/adversarial.py:298-345``) as selectable variants.

The G/D alternation (D on ``step % (RATIO+1) != 0``) is host-driven via
separate jitted ``g_step``/``d_step``; ``make_fused_step`` offers a single
``lax.cond`` program for multi-chip compilation checks.

Batches are dicts of time-major arrays:
  ``mel``: (B, T, 80), ``lin``: (B, 4T, 513), ``text``: (B, N) int32,
  ``spk``: (B, 200), optional masks ``mel_mask`` (B, T), ``lin_mask``,
  ``att_mask`` (B, N, T).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from spoofsv_tpu.config import Config
from spoofsv_tpu.train.losses import (
    binary_divergence,
    guided_attention_matrix,
    guided_attention_loss,
    l1_loss,
    ssrn_losses,
    text2mel_losses,
)
from spoofsv_tpu.train.state import AdvTrainState, TrainState

Array = jax.Array
Batch = Dict[str, Array]


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam(α=2e-4, β=(0.5,0.9), ε=1e-6) (``train/ordinary.py:182``)."""
    a = cfg.adam
    return optax.adam(a.alpha, b1=a.beta_1, b2=a.beta_2, eps=a.epsilon)


def shift_right(mel: Array) -> Array:
    """Teacher-forcing input: GT mel shifted right one frame with a zero init
    frame (``train/ordinary.py:226``)."""
    return jnp.concatenate([jnp.zeros_like(mel[:, :1]), mel[:, :-1]], axis=1)


def _gen_forward(gen_model, params, batch: Batch, train_kind: str,
                 dropout_rng: Optional[Array], deterministic: bool):
    if train_kind == "train_text2mel":
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        y, a = gen_model.apply(params, shift_right(batch["mel"]), batch["text"],
                               batch["spk"], deterministic=deterministic, rngs=rngs)
        return y, a
    else:  # train_ssrn
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        y = gen_model.apply(params, batch["mel"], deterministic=deterministic, rngs=rngs)
        return y, None


def _recon_losses(cfg: Config, batch: Batch, y: Array, a: Optional[Array],
                  gaw: Array, train_kind: str, use_masks: bool):
    if train_kind == "train_text2mel":
        l1, bd, att = text2mel_losses(
            batch["mel"], y, a, gaw,
            mel_mask=batch.get("mel_mask") if use_masks else None,
            att_mask=batch.get("att_mask") if use_masks else None)
        return l1 + bd + att, {"l1": l1, "bd": bd, "att": att}
    l1, bd = ssrn_losses(batch["lin"], y,
                         batch.get("lin_mask") if use_masks else None)
    return l1 + bd, {"l1": l1, "bd": bd}


def _real_fake(batch: Batch, y: Array, train_kind: str) -> Tuple[Array, Array]:
    real = batch["mel"] if train_kind == "train_text2mel" else batch["lin"]
    return real, y


# ----------------------------------------------------------------------
# Ordinary (non-adversarial) training
# ----------------------------------------------------------------------

def make_ordinary_step(gen_model, cfg: Config, train_kind: str,
                       use_masks: bool = False, donate: bool = True):
    """Returns (init_fn, step_fn) for ``ordinary_train`` semantics."""
    gaw = jnp.asarray(guided_attention_matrix(cfg.max_text_len, cfg.max_frame_num))
    tx = make_optimizer(cfg)
    has_dropout = cfg.apply_dropout

    def init_fn(rng: Array, batch: Batch) -> TrainState:
        if train_kind == "train_text2mel":
            params = gen_model.init(rng, shift_right(batch["mel"]), batch["text"],
                                    batch["spk"])
        else:
            params = gen_model.init(rng, batch["mel"])
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=tx.init(params))

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step_fn(state: TrainState, batch: Batch, rng: Array):
        def loss_fn(params):
            y, a = _gen_forward(gen_model, params, batch, train_kind,
                                rng if has_dropout else None,
                                deterministic=not has_dropout)
            loss, parts = _recon_losses(cfg, batch, y, a, gaw, train_kind, use_masks)
            return loss, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        metrics = dict(parts, loss=loss)
        return new_state, metrics

    return init_fn, step_fn


def make_eval_step(gen_model, cfg: Config, train_kind: str, use_masks: bool = False):
    """Teacher-forced eval losses (the AR-decode validation path lives in
    :mod:`spoofsv_tpu.infer.decode` and is composed by the train loop)."""
    gaw = jnp.asarray(guided_attention_matrix(cfg.max_text_len, cfg.max_frame_num))

    @jax.jit
    def eval_fn(params, batch: Batch):
        y, a = _gen_forward(gen_model, params, batch, train_kind, None, True)
        loss, parts = _recon_losses(cfg, batch, y, a, gaw, train_kind, use_masks)
        return dict(parts, loss=loss)

    return eval_fn


# ----------------------------------------------------------------------
# Adversarial training
# ----------------------------------------------------------------------

def make_adversarial_steps(gen_model, disc_model, cfg: Config, train_kind: str,
                           gan_type: str = "wgan-gp", use_masks: bool = False,
                           donate: bool = True):
    """Returns (init_fn, g_step, d_step).

    gan_type: 'wgan-gp' (default, ``main.py:4``), 'wgan' (weight clip),
    'vanilla' (log loss on fixed slices).
    """
    assert gan_type in ("wgan-gp", "wgan", "vanilla")
    gaw = jnp.asarray(guided_attention_matrix(cfg.max_text_len, cfg.max_frame_num))
    tx_g = make_optimizer(cfg)
    tx_d = make_optimizer(cfg)
    has_dropout = cfg.apply_dropout
    n_slice = 8 if train_kind == "train_text2mel" else 32  # adversarial.py:298-300,329

    def disc_in(x: Array) -> Array:
        if gan_type == "vanilla":
            return x[:, 1: 1 + n_slice, :]
        return x

    def init_fn(rng: Array, batch: Batch) -> AdvTrainState:
        rg, rd = jax.random.split(rng)
        if train_kind == "train_text2mel":
            gp = gen_model.init(rg, shift_right(batch["mel"]), batch["text"], batch["spk"])
            dp = disc_model.init(rd, disc_in(batch["mel"]))
        else:
            gp = gen_model.init(rg, batch["mel"])
            dp = disc_model.init(rd, disc_in(batch["lin"]))
        return AdvTrainState(step=jnp.zeros((), jnp.int32),
                             gen_params=gp, gen_opt_state=tx_g.init(gp),
                             disc_params=dp, disc_opt_state=tx_d.init(dp))

    # -- generator update ---------------------------------------------------
    def _g_loss(gen_params, disc_params, batch, rng):
        y, a = _gen_forward(gen_model, gen_params, batch, train_kind,
                            rng if has_dropout else None,
                            deterministic=not has_dropout)
        recon, parts = _recon_losses(cfg, batch, y, a, gaw, train_kind, use_masks)
        d_out = disc_model.apply(disc_params, disc_in(y))
        if gan_type == "vanilla":
            loss_disc = jnp.mean(-jnp.log(d_out + 1e-8))   # adversarial.py:307
            denom = loss_disc                               # no abs (adversarial.py:310)
        else:
            loss_disc = jnp.mean(-d_out)                    # …wasserstein_gp.py:288
            denom = jnp.abs(loss_disc)                      # …wasserstein_gp.py:290
        # adaptive critic weighting with .item() scalars == stop_gradient here
        coeff = jax.lax.stop_gradient(recon / (denom + 1e-12))
        loss = recon + coeff * loss_disc
        return loss, dict(parts, loss_disc=loss_disc, loss=loss)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def g_step(state: AdvTrainState, batch: Batch, rng: Array):
        (_, metrics), grads = jax.value_and_grad(_g_loss, has_aux=True)(
            state.gen_params, state.disc_params, batch, rng)
        updates, opt = tx_g.update(grads, state.gen_opt_state, state.gen_params)
        params = optax.apply_updates(state.gen_params, updates)
        new_state = state.replace(step=state.step + 1, gen_params=params,
                                  gen_opt_state=opt)
        return new_state, metrics

    # -- discriminator / critic update --------------------------------------
    def _d_loss(disc_params, real, fake, rng):
        if gan_type == "vanilla":
            d_real = disc_model.apply(disc_params, disc_in(real))
            d_fake = disc_model.apply(disc_params, disc_in(fake))
            loss = jnp.mean(-jnp.log(d_real + 1e-8) - jnp.log(1.0 - d_fake + 1e-8))
            return loss, {"loss_d": loss, "wd": jnp.zeros(())}
        d_real = disc_model.apply(disc_params, real)
        d_fake = disc_model.apply(disc_params, fake)
        loss_w = jnp.mean(d_fake - d_real)                  # …wasserstein_gp.py:314
        metrics = {"wd": -loss_w}
        if gan_type == "wgan-gp":
            b = real.shape[0]
            # per-sample mixing coefficient (…wasserstein_gp.py:300-301)
            coeff = jax.random.uniform(rng, (b, 1, 1), real.dtype)
            x_mid = coeff * real + (1.0 - coeff) * fake
            grad_x = jax.grad(lambda x: disc_model.apply(disc_params, x).sum())(x_mid)
            norms = jnp.sqrt(jnp.sum(grad_x ** 2, axis=(1, 2)) + 1e-12)
            gp = jnp.mean(cfg.gp_lambda * (norms - 1.0) ** 2)  # …gp.py:306
            metrics["gp"] = gp
            loss = loss_w + gp
        else:
            loss = loss_w
        return loss, dict(metrics, loss_d=loss)

    def _clip_weights(params):
        """WGAN weight clipping to ±0.1, matrices only
        (``train/adversarial_wasserstein.py:20-25``: only ``weight`` attrs)."""
        def clip(path, leaf):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name in ("kernel", "embedding", "scale"):
                return jnp.clip(leaf, -0.1, 0.1)
            return leaf
        return jax.tree_util.tree_map_with_path(clip, params)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def d_step(state: AdvTrainState, batch: Batch, rng: Array):
        rng_g, rng_gp = jax.random.split(rng)
        y, _ = _gen_forward(gen_model, state.gen_params, batch, train_kind,
                            rng_g if has_dropout else None,
                            deterministic=not has_dropout)
        real, fake = _real_fake(batch, jax.lax.stop_gradient(y), train_kind)
        (_, metrics), grads = jax.value_and_grad(_d_loss, has_aux=True)(
            state.disc_params, real, fake, rng_gp)
        updates, opt = tx_d.update(grads, state.disc_opt_state, state.disc_params)
        params = optax.apply_updates(state.disc_params, updates)
        if gan_type == "wgan":
            params = _clip_weights(params)
        new_state = state.replace(step=state.step + 1, disc_params=params,
                                  disc_opt_state=opt)
        return new_state, metrics

    return init_fn, g_step, d_step


def make_fused_adversarial_step(gen_model, disc_model, cfg: Config,
                                train_kind: str, gan_type: str = "wgan-gp",
                                use_masks: bool = False):
    """One jitted program containing both branches, selected by
    ``step % (RATIO+1)`` via ``lax.cond`` — the multi-chip compile target
    (alternation rule: ``train/adversarial_wasserstein_gp.py:267``)."""
    init_fn, g_step, d_step = make_adversarial_steps(
        gen_model, disc_model, cfg, train_kind, gan_type, use_masks, donate=False)

    def fused(state: AdvTrainState, batch: Batch, rng: Array):
        is_g = (state.step % (cfg.ratio + 1)) == 0

        def run_g(args):
            st, b, r = args
            new, m = g_step(st, b, r)
            return new, _pad_metrics(m)

        def run_d(args):
            st, b, r = args
            new, m = d_step(st, b, r)
            return new, _pad_metrics(m)

        def _pad_metrics(m):
            keys = ["l1", "bd", "att", "loss", "loss_disc", "loss_d", "wd", "gp"]
            return {k: m.get(k, jnp.zeros(())) for k in keys}

        return jax.lax.cond(is_g, run_g, run_d, (state, batch, rng))

    return init_fn, jax.jit(fused)
