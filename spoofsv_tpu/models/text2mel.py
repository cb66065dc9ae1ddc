"""Text2Mel ("melSyn"): multi-speaker DCTTS generator, TPU-native.

Re-designs ``models/TTSModel.py:8-300`` for JAX/XLA:

  * training forward is one fully-parallel teacher-forced pass: all highway
    convs run as big batched convolutions, attention is one (B, N, T) einsum
    softmax on the MXU;
  * inference is NOT the reference's O(T²) full-prefix recompute
    (``models/TTSModel.py:275-300``); instead :mod:`spoofsv_tpu.infer.decode`
    scans :meth:`MelSyn.decode_step` — a single-frame step with causal-conv
    ring-buffer caches and incremental monotonic attention — which is O(T)
    and mathematically equivalent (tested).
  * forced monotonic attention window ``[pma, pma+2]`` is a batched
    ``jnp.where`` mask, replacing the per-item Python loop at
    ``models/TTSModel.py:282-286``.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from spoofsv_tpu.models.layers import (
    KAIMING,
    LN_EPS,
    Array,
    HighwayConv,
    HighwayDilationStack,
    highway_pair,
    functional_dropout,
)

ATT_MASK_VALUE = -2.0 ** 32  # models/TTSModel.py:284,286


class TextEncoder(nn.Module):
    """Text → (K, V), each (B, N, hidden) (``models/TTSModel.py:106-140``)."""

    vocab_len: int
    text_emb_dim: int = 128
    hidden_dim: int = 256
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        d2 = 2 * self.hidden_dim
        # one-hot → Linear ≡ Embed with bias (models/TTSModel.py:23,32-35)
        self.embed = nn.Embed(self.vocab_len, self.text_emb_dim,
                              embedding_init=KAIMING, dtype=self.dtype, name="embed")
        self.embed_bias = self.param("embed_bias", nn.initializers.zeros,
                                     (self.text_emb_dim,))
        self.conv1 = nn.Dense(d2, kernel_init=KAIMING, dtype=self.dtype, name="conv1")
        self.ln1 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln1")
        self.conv2 = nn.Dense(d2, kernel_init=KAIMING, dtype=self.dtype, name="conv2")
        self.ln2 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln2")
        self.hci1 = HighwayDilationStack(d2, False, self.dropout_rate, self.dtype, name="hci1")
        self.hci2 = HighwayDilationStack(d2, False, self.dropout_rate, self.dtype, name="hci2")
        self.hc1 = HighwayConv(d2, 3, 1, False, self.dropout_rate, self.dtype, name="hc1")
        self.hc2 = HighwayConv(d2, 3, 1, False, self.dropout_rate, self.dtype, name="hc2")
        self.hc3 = HighwayConv(d2, 1, 1, False, self.dropout_rate, self.dtype, name="hc3")
        self.hc4 = HighwayConv(d2, 1, 1, False, self.dropout_rate, self.dtype, name="hc4")

    def __call__(self, text_ids: Array, deterministic: bool = True) -> Tuple[Array, Array]:
        """``text_ids``: (B, N) int → K, V each (B, N, hidden)."""
        x = self.embed(text_ids) + self.embed_bias
        x = self.ln1(self.conv1(x))
        x = jax.nn.relu(x)
        x = functional_dropout(self, x, self.dropout_rate, deterministic)
        x = self.ln2(self.conv2(x))
        x = functional_dropout(self, x, self.dropout_rate, deterministic)
        x = self.hci1(x, deterministic)
        x = self.hci2(x, deterministic)
        x = highway_pair(self.hc1, self.hc2, x, deterministic)
        x = highway_pair(self.hc3, self.hc4, x, deterministic)
        K, V = jnp.split(x, 2, axis=-1)
        return K, V


class AudioEncoder(nn.Module):
    """Mel prefix → query Q, causal + speaker-conditioned
    (``models/TTSModel.py:142-196``)."""

    freq_bins: int = 80
    hidden_dim: int = 256
    condition: bool = True
    spk_emb_dim: int = 200
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        h = self.hidden_dim
        if self.condition:
            self.fc1 = nn.Dense(h, kernel_init=KAIMING, dtype=self.dtype, name="fc1")
            self.fc2 = nn.Dense(h, kernel_init=KAIMING, dtype=self.dtype, name="fc2")
        self.conv1 = nn.Dense(h, kernel_init=KAIMING, dtype=self.dtype, name="conv1")
        self.ln1 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln1")
        self.conv2 = nn.Dense(h, kernel_init=KAIMING, dtype=self.dtype, name="conv2")
        self.ln2 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln2")
        self.conv3 = nn.Dense(h, kernel_init=KAIMING, dtype=self.dtype, name="conv3")
        self.ln3 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln3")
        self.hci1 = HighwayDilationStack(h, True, self.dropout_rate, self.dtype, name="hci1")
        self.hci2 = HighwayDilationStack(h, True, self.dropout_rate, self.dtype, name="hci2")
        self.hc1 = HighwayConv(h, 3, 3, True, self.dropout_rate, self.dtype, name="hc1")
        self.hc2 = HighwayConv(h, 3, 3, True, self.dropout_rate, self.dtype, name="hc2")

    def _front(self, x: Array, spk: Optional[Array], deterministic: bool) -> Array:
        """The shared 1×1-conv front; ``x`` may be (B, T, F) or (B, F)."""
        x = self.conv1(x)
        if self.condition:
            s = self.fc1(spk)
            if x.ndim == 3:
                s = s[:, None, :]
            x = self.ln1(x + s)
        else:
            x = self.ln1(x)
        x = jax.nn.relu(x)
        x = functional_dropout(self, x, self.dropout_rate, deterministic)
        x = self.ln2(self.conv2(x))
        x = jax.nn.relu(x)
        x = functional_dropout(self, x, self.dropout_rate, deterministic)
        x = self.conv3(x)
        if self.condition:
            p = self.fc2(spk)
            if x.ndim == 3:
                p = p[:, None, :]
            x = self.ln3(x + p)
        else:
            x = self.ln3(x)
        x = functional_dropout(self, x, self.dropout_rate, deterministic)
        return x

    def __call__(self, mel: Array, spk: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        """``mel``: (B, T, freq_bins); ``spk``: (B, spk_emb_dim) → Q (B, T, h)."""
        x = self._front(mel, spk, deterministic)
        x = self.hci1(x, deterministic)
        x = self.hci2(x, deterministic)
        x = highway_pair(self.hc1, self.hc2, x, deterministic)
        return x

    # -- incremental --------------------------------------------------------
    def init_cache(self, batch: int):
        return (self.hci1.init_cache(batch), self.hci2.init_cache(batch),
                self.hc1.init_cache(batch), self.hc2.init_cache(batch))

    def step(self, mel_t: Array, spk: Optional[Array], cache):
        """One frame; ``mel_t``: (B, freq_bins) → (Q_t (B, h), cache)."""
        x = self._front(mel_t, spk, True)
        c1, c2, c3, c4 = cache
        x, c1 = self.hci1.step(x, c1)
        x, c2 = self.hci2.step(x, c2)
        x, c3 = self.hc1.step(x, c3)
        x, c4 = self.hc2.step(x, c4)
        return x, (c1, c2, c3, c4)


class AudioDecoder(nn.Module):
    """[R; Q] → mel frame probabilities (``models/TTSModel.py:198-232``)."""

    freq_bins: int = 80
    hidden_dim: int = 256
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        h = self.hidden_dim
        self.conv1 = nn.Dense(h, kernel_init=KAIMING, dtype=self.dtype, name="conv1")
        self.ln1 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln1")
        self.hci = HighwayDilationStack(h, True, self.dropout_rate, self.dtype, name="hci")
        self.hc1 = HighwayConv(h, 3, 1, True, self.dropout_rate, self.dtype, name="hc1")
        self.hc2 = HighwayConv(h, 3, 1, True, self.dropout_rate, self.dtype, name="hc2")
        self.conv2 = nn.Dense(h, kernel_init=KAIMING, dtype=self.dtype, name="conv2")
        self.ln2 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln2")
        self.conv3 = nn.Dense(h, kernel_init=KAIMING, dtype=self.dtype, name="conv3")
        self.ln3 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln3")
        self.conv4 = nn.Dense(h, kernel_init=KAIMING, dtype=self.dtype, name="conv4")
        self.ln4 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln4")
        self.conv5 = nn.Dense(self.freq_bins, kernel_init=KAIMING, dtype=self.dtype, name="conv5")
        self.ln5 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln5")

    def _tail(self, x: Array, deterministic: bool) -> Array:
        x = self.ln2(self.conv2(x))
        x = functional_dropout(self, jax.nn.relu(x), self.dropout_rate,
                               deterministic)
        x = self.ln3(self.conv3(x))
        x = jax.nn.relu(x)
        if self.dropout_rate > 0:
            # dropout variant uses p=0.04 here (TTSModel_dropout.py:229)
            x = functional_dropout(self, x, 0.04, deterministic)
        x = self.ln4(self.conv4(x))
        x = jax.nn.relu(x)
        x = functional_dropout(self, x, self.dropout_rate, deterministic)
        x = self.ln5(self.conv5(x))
        return jax.nn.sigmoid(x)

    def __call__(self, rq: Array, deterministic: bool = True) -> Array:
        """``rq``: (B, T, 2h) → (B, T, freq_bins) in (0, 1)."""
        x = self.ln1(self.conv1(rq))
        x = functional_dropout(self, x, self.dropout_rate, deterministic)
        x = self.hci(x, deterministic)
        x = highway_pair(self.hc1, self.hc2, x, deterministic)
        return self._tail(x, deterministic)

    def init_cache(self, batch: int):
        return (self.hci.init_cache(batch), self.hc1.init_cache(batch),
                self.hc2.init_cache(batch))

    def step(self, rq_t: Array, cache):
        x = self.ln1(self.conv1(rq_t))
        c1, c2, c3 = cache
        x, c1 = self.hci.step(x, c1)
        x, c2 = self.hc1.step(x, c2)
        x, c3 = self.hc2.step(x, c3)
        return self._tail(x, True), (c1, c2, c3)


class DecodeState(NamedTuple):
    """Carry for the scan-based AR decoder."""
    y_prev: Array          # (B, freq_bins) — last emitted mel frame
    pma: Array             # (B,) int32 — previous max-attention text position
    enc_cache: Any
    dec_cache: Any


class MelSyn(nn.Module):
    """Text2Mel generator (``models/TTSModel.py:234-300``)."""

    vocab_len: int
    condition: bool = True
    spk_emb_dim: int = 200
    text_emb_dim: int = 128
    freq_bins: int = 80
    hidden_dim: int = 256
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.text_encoder = TextEncoder(self.vocab_len, self.text_emb_dim,
                                        self.hidden_dim, self.dropout_rate,
                                        self.dtype, name="text_encoder")
        self.audio_encoder = AudioEncoder(self.freq_bins, self.hidden_dim,
                                          self.condition, self.spk_emb_dim,
                                          self.dropout_rate, self.dtype,
                                          name="audio_encoder")
        self.audio_decoder = AudioDecoder(self.freq_bins, self.hidden_dim,
                                          self.dropout_rate, self.dtype,
                                          name="audio_decoder")

    def __call__(self, mel_inputs: Array, text_ids: Array,
                 spk_emb: Optional[Array] = None,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        """Teacher-forced parallel forward (``models/TTSModel.py:263-273``).

        ``mel_inputs``: (B, T, F) shifted-right GT mel; ``text_ids``: (B, N);
        ``spk_emb``: (B, spk_emb_dim). Returns (Y (B,T,F), A (B,N,T)).
        """
        K, V = self.text_encoder(text_ids, deterministic)            # (B,N,h)
        Q = self.audio_encoder(mel_inputs, spk_emb, deterministic)   # (B,T,h)
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.hidden_dim, jnp.float32))
        scores = jnp.einsum("bnh,bth->bnt", K, Q) * scale
        A = jax.nn.softmax(scores.astype(jnp.float32), axis=1).astype(scores.dtype)
        R = jnp.einsum("bnh,bnt->bth", V, A)
        Y = self.audio_decoder(jnp.concatenate([R, Q], axis=-1), deterministic)
        return Y, A

    # -- encoding helpers for inference -------------------------------------
    def encode_text(self, text_ids: Array) -> Tuple[Array, Array]:
        return self.text_encoder(text_ids, True)

    def init_state(self, batch: int) -> DecodeState:
        return DecodeState(
            y_prev=jnp.zeros((batch, self.freq_bins), self.dtype),
            pma=jnp.zeros((batch,), jnp.int32),
            enc_cache=self.audio_encoder.init_cache(batch),
            dec_cache=self.audio_decoder.init_cache(batch),
        )

    def decode_step(self, state: DecodeState, K: Array, V: Array,
                    spk_emb: Optional[Array], text_mask: Optional[Array] = None,
                    monotonic: bool = True) -> Tuple[DecodeState, Tuple[Array, Array]]:
        """One AR frame with forced monotonic attention.

        Replaces the reference's per-frame full-prefix recompute + Python
        masking loop (``models/TTSModel.py:275-300``): the attention window
        ``[pma, pma+2]`` is applied as a vectorized mask, and causal convs use
        ring-buffer caches. Returns (new_state, (y_t (B,F), a_t (B,N))).
        """
        q_t, enc_cache = self.audio_encoder.step(state.y_prev, spk_emb, state.enc_cache)
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.hidden_dim, jnp.float32))
        scores = jnp.einsum("bnh,bh->bn", K, q_t) * scale            # (B, N)
        n = K.shape[1]
        pos = jnp.arange(n)[None, :]
        if monotonic:
            window = (pos >= state.pma[:, None]) & (pos <= state.pma[:, None] + 2)
            scores = jnp.where(window, scores, ATT_MASK_VALUE)
        if text_mask is not None:
            scores = jnp.where(text_mask, scores, ATT_MASK_VALUE)
        a_t = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
        pma = jnp.argmax(a_t, axis=-1).astype(jnp.int32)
        r_t = jnp.einsum("bnh,bn->bh", V, a_t)
        y_t, dec_cache = self.audio_decoder.step(
            jnp.concatenate([r_t, q_t], axis=-1), state.dec_cache)
        new_state = DecodeState(y_prev=y_t, pma=pma,
                                enc_cache=enc_cache, dec_cache=dec_cache)
        return new_state, (y_t, a_t)
