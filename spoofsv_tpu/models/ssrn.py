"""SSRN: spectrogram super-resolution network, TPU-native.

Coarse mel (B, T, 80) → full linear magnitude (B, 4T, 513). Re-design of
``models/TTSModel.py:303-362``: time-major layout, 1×1 convs as Dense matmuls
on the MXU, ×2 temporal upsampling via ``nn.ConvTranspose(k=2, s=2)`` twice.
Feed-forward (no AR state), so a single jitted call serves train and infer.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from spoofsv_tpu.models.layers import (KAIMING, LN_EPS, Array, HighwayConv,
                                       highway_pair)


class Upsample2x(nn.Module):
    """ConvTranspose1d(k=2, s=2) + two highway convs (``models/TTSModel.py:303-317``)."""

    dim: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = nn.ConvTranspose(self.dim, (2,), strides=(2,), padding="VALID",
                             kernel_init=KAIMING, dtype=self.dtype, name="deconv")(x)
        return highway_pair(
            HighwayConv(self.dim, 3, 1, False, self.dropout_rate, self.dtype,
                        name="hc1"),
            HighwayConv(self.dim, 3, 3, False, self.dropout_rate, self.dtype,
                        name="hc2"),
            x, deterministic)


class SSRN(nn.Module):
    """(B, T, freq_bins) coarse mel → (B, 4T, output_bins) linear magnitude
    in (0, 1) (``models/TTSModel.py:319-362``)."""

    freq_bins: int = 80
    output_bins: int = 513
    ssrn_dim: int = 256
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel: Array, deterministic: bool = True) -> Array:
        d = self.ssrn_dim
        dp = self.dropout_rate

        def ln_dense(x, feats, name):
            x = nn.Dense(feats, kernel_init=KAIMING, dtype=self.dtype,
                         name=f"{name}_dense")(x)
            return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name=f"{name}_ln")(x)

        def drop(x, name, rate=None):
            if dp > 0:
                x = nn.Dropout(rate or dp, name=name)(x, deterministic=deterministic)
            return x

        x = ln_dense(mel, d, "conv1")
        x = drop(x, "dp1")
        x = highway_pair(HighwayConv(d, 3, 1, False, dp, self.dtype, name="hc1"),
                         HighwayConv(d, 3, 3, False, dp, self.dtype, name="hc2"),
                         x, deterministic)
        x = Upsample2x(d, dp, self.dtype, name="ups1")(x, deterministic)
        x = Upsample2x(d, dp, self.dtype, name="ups2")(x, deterministic)
        x = ln_dense(x, 2 * d, "conv2")
        x = drop(x, "dp2")
        x = highway_pair(HighwayConv(2 * d, 3, 1, False, dp, self.dtype, name="hc3"),
                         HighwayConv(2 * d, 3, 1, False, dp, self.dtype, name="hc4"),
                         x, deterministic)
        x = ln_dense(x, self.output_bins, "conv3")
        x = drop(x, "dp3")
        x = ln_dense(x, self.output_bins, "conv4")
        x = drop(jax.nn.relu(x), "dp4")
        x = ln_dense(x, self.output_bins, "conv5")
        x = jax.nn.relu(x)
        x = ln_dense(x, self.output_bins, "conv6")
        return jax.nn.sigmoid(x)
