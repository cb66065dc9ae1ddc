"""GAN critics and anti-spoofing countermeasure classifiers, TPU-native.

Re-design of ``models/discriminator.py:6-80`` (WGAN critics — no output
sigmoid) and ``anti_spoofing/discriminator.py`` (sigmoid CM variants).
Time-major layout; 1×1 convs are Dense matmuls; AvgPool1d(k) is
``nn.avg_pool`` with window=stride=k (floor semantics, like torch);
AdaptiveAvgPool1d(1) is a masked or plain time-mean.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from spoofsv_tpu.models.layers import KAIMING, LN_EPS, Array, HighwayConv


class Critic1D(nn.Module):
    """Shared topology of melDisc / linDisc (``models/discriminator.py:6-80``).

    ``pool1``/``pool2`` distinguish the two: mel uses (4, 2), linear uses (8, 4).
    ``sigmoid_out=True`` gives the anti-spoofing CM variant
    (``anti_spoofing/discriminator.py`` enables the commented-out sigmoid).
    """

    disc_dim: int = 128
    pool1: int = 4
    pool2: Optional[int] = 2  # None → v1-style variant (no second pool,
                              # anti_spoofing/discriminator.py:145 commented out)
    mid_dim: int = 4          # conv4 width: 4 for mel, 8 for lin
    extra_stage: bool = False  # v2-style extra conv/pool stage (:214-216)
    sigmoid_out: bool = False
    dropout_rate: float = 0.05
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        """``x``: (B, T, F) spectrogram → (B,) critic scalar."""
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.05)

        def drop(v, name):
            return nn.Dropout(self.dropout_rate, name=name)(v, deterministic=deterministic)

        x = nn.Dense(self.disc_dim, kernel_init=KAIMING, dtype=self.dtype, name="conv1")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln1")(x)
        x = drop(x, "dp1")
        # gate_impl pinned to "xla": the WGAN-GP gradient penalty
        # differentiates the critic twice (grad-of-grad), which cannot pass
        # through the fused gate's custom_vjp — and one highway conv here is
        # perf-irrelevant anyway.
        x = HighwayConv(self.disc_dim, 3, 1, False, 0.0, self.dtype,
                        gate_impl="xla", name="hc")(x)
        x = nn.Dense(64, kernel_init=KAIMING, dtype=self.dtype, name="conv2")(x)
        x = nn.avg_pool(x, (self.pool1,), strides=(self.pool1,))
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln2")(x)
        x = drop(lrelu(x), "dp2")
        x = nn.Dense(16, kernel_init=KAIMING, dtype=self.dtype, name="conv3")(x)
        if self.pool2:
            x = nn.avg_pool(x, (self.pool2,), strides=(self.pool2,))
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln3")(x)
        if self.extra_stage:
            x = nn.Dense(8, kernel_init=KAIMING, dtype=self.dtype, name="conv3_2")(x)
            x = nn.avg_pool(x, (2,), strides=(2,))
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln3_2")(x)
        x = nn.Dense(self.mid_dim, kernel_init=KAIMING, dtype=self.dtype, name="conv4")(lrelu(x))
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln4")(x)
        x = nn.Dense(1, kernel_init=KAIMING, dtype=self.dtype, name="conv5")(lrelu(x))
        x = jnp.mean(x, axis=1)[..., 0]                     # AdaptiveAvgPool1d(1)
        if self.sigmoid_out:
            x = jax.nn.sigmoid(x)
        return x


def MelDisc(disc_dim: int = 128, sigmoid_out: bool = False,
            dtype: Any = jnp.float32) -> Critic1D:
    """80-bin coarse-mel critic (``models/discriminator.py:6-42``)."""
    return Critic1D(disc_dim=disc_dim, pool1=4, pool2=2, mid_dim=4,
                    sigmoid_out=sigmoid_out, dtype=dtype)


def LinDisc(disc_dim: int = 128, sigmoid_out: bool = False,
            dtype: Any = jnp.float32) -> Critic1D:
    """513-bin linear-spectrogram critic (``models/discriminator.py:44-80``)."""
    return Critic1D(disc_dim=disc_dim, pool1=8, pool2=4, mid_dim=8,
                    sigmoid_out=sigmoid_out, dtype=dtype)


class ResBasicBlock(nn.Module):
    """Pre-activation 2-D residual block (``models/discriminator.py:86-104``)."""

    planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.05)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        h = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                    kernel_init=KAIMING, dtype=self.dtype, name="cnn1")(lrelu(h))
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(h)
        h = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                    kernel_init=KAIMING, dtype=self.dtype, name="cnn2")(lrelu(h))
        return x + h


class DRS(nn.Module):
    """Small 2-D ResNet CM (``models/discriminator.py:106-178``; unused by the
    reference training loop but part of the component inventory)."""

    num_classes: int = 2
    resnet_blocks: int = 1
    focal_loss: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        """``x``: (B, H, W, 1) spectrogram image → (B, num_classes)."""
        x = nn.Conv(8, (3, 3), padding="SAME", kernel_init=KAIMING,
                    dtype=self.dtype, name="expansion")(x)
        widths = (8, 16, 32, 64)
        dil = ((2, 2), (4, 4), (8, 8), (9, 6))
        for bi, (w, d) in enumerate(zip(widths, dil)):
            for r in range(self.resnet_blocks):
                x = ResBasicBlock(w, self.dtype, name=f"block{bi+1}_{r}")(x, train)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            nxt = widths[bi + 1] if bi + 1 < len(widths) else 64
            # NB: the reference's cnn4 (dilation (9,6), VALID) underflows its
            # own documented 257×400 input — the class is dead code there
            # (models/discriminator.py:106-142). Pad when VALID wouldn't fit.
            fits = (x.shape[1] > 2 * d[0]) and (x.shape[2] > 2 * d[1])
            x = nn.Conv(nxt, (3, 3), kernel_dilation=d,
                        padding="VALID" if fits else "SAME",
                        kernel_init=KAIMING, dtype=self.dtype, name=f"cnn{bi+1}")(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(100, kernel_init=KAIMING, dtype=self.dtype, name="fc")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")(x)
        x = jax.nn.leaky_relu(x, 0.05)
        x = nn.Dense(self.num_classes, kernel_init=KAIMING, dtype=self.dtype, name="fc_out")(x)
        if self.focal_loss:
            return x
        return jax.nn.softmax(x, axis=-1)
