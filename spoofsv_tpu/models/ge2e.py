"""GE2E speaker-verification embedder and loss, TPU-native.

Re-design of ``GE2E/speech_embedder_net.py:15-49`` + ``GE2E/utils.py:16-55``:

  * the 3-layer LSTM runs as stacked ``lax.scan`` recurrences (flax ``nn.RNN``
    over ``OptimizedLSTMCell``) — one jitted program over the whole
    (N·M, frames, nmels) batch;
  * the GE2E loss replaces the reference's O(N²·M) pure-Python triple loops
    (``GE2E/utils.py:36-55``, a CPU bottleneck in its training hot loop) with a
    fully vectorized einsum formulation, including the leave-one-out own-speaker
    centroid. Golden-tested against a direct loop implementation.

Reference quirks preserved deliberately:
  * ``+1e-6`` added to every cosine similarity (``GE2E/utils.py:44``);
  * loss uses ``log(sum(exp(sim)) + 1e-6)`` (``GE2E/utils.py:53``);
  * the reference's ``torch.clamp(self.w, 1e-6)`` is a no-op (result discarded,
    ``GE2E/speech_embedder_net.py:44``) — w is used unclamped here too.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class SpeechEmbedder(nn.Module):
    """(B, frames, nmels) log-mel → (B, proj) L2-normalized d-vectors
    (``GE2E/speech_embedder_net.py:15-33``)."""

    hidden: int = 768
    num_layers: int = 3
    proj: int = 256
    dtype: Any = jnp.float32
    # scan unroll factor: amortizes per-step dispatch overhead on TPU
    # (measured on v5e at B=120/120 frames: unroll 16 -> 3.6x the unroll-1
    # throughput; 120/16 = 7.5 scan iterations of 16 fused cells)
    unroll: int = 16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.astype(self.dtype)
        for i in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(
                self.hidden,
                kernel_init=nn.initializers.xavier_normal(),
                recurrent_kernel_init=nn.initializers.xavier_normal(),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name=f"lstm{i}",
            )
            x = nn.RNN(cell, unroll=self.unroll, name=f"rnn{i}")(x)
        last = x[:, -1, :]                                   # only last frame
        e = nn.Dense(self.proj, dtype=self.dtype, name="projection")(last)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return e


def get_centroids(embeddings: Array) -> Array:
    """Per-speaker mean over utterances; (N, M, D) → (N, D)
    (``GE2E/utils.py:16-25``)."""
    return embeddings.mean(axis=1)


def get_cossim(embeddings: Array, centroids: Array) -> Array:
    """Cosine-similarity tensor (N, M, K) with leave-one-out own centroids.

    ``cossim[j, i, k] = cos(e_ji, c_k) + 1e-6``; when ``k == j`` (and K == N),
    ``c_j`` is the centroid of speaker j excluding utterance i
    (``GE2E/utils.py:36-46``). Works for K != N (enrollment centroids from a
    different set, as in ``GE2E/train_speech_embedder.py:164``) — then no
    leave-one-out is applied for j >= K.
    """
    n, m, d = embeddings.shape
    k = centroids.shape[0]

    def cos(a, b):
        return jnp.sum(a * b, -1) / (
            jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 0.0)

    # plain term: (N, M, K)
    plain = cos(embeddings[:, :, None, :], centroids[None, None, :, :])

    if k == n:
        # leave-one-out centroid for speaker j, utterance i:
        # (sum_j - e_ji) / (M - 1)
        loo = (embeddings.sum(axis=1, keepdims=True) - embeddings) / (m - 1)  # (N, M, D)
        loo_cos = cos(embeddings, loo)                                        # (N, M)
        eye = jnp.eye(n, dtype=bool)[:, None, :]                              # (N, 1, N)
        plain = jnp.where(eye, loo_cos[:, :, None], plain)
    return plain + 1e-6


def calc_loss(sim_matrix: Array) -> Tuple[Array, Array]:
    """Contrastive softmax loss from an (N, M, N) similarity tensor
    (``GE2E/utils.py:48-55``)."""
    n = sim_matrix.shape[0]
    own = jnp.take_along_axis(
        sim_matrix, jnp.arange(n)[:, None, None].astype(jnp.int32), axis=2
    )[..., 0]                                                # (N, M): sim[j,i,j]
    lse = jnp.log(jnp.sum(jnp.exp(sim_matrix), axis=2) + 1e-6)
    per_embedding = -(own - lse)
    return per_embedding.sum(), per_embedding


class GE2ELoss(nn.Module):
    """Trainable (w, b) wrapper (``GE2E/speech_embedder_net.py:35-49``)."""

    @nn.compact
    def __call__(self, embeddings: Array) -> Array:
        w = self.param("w", lambda _: jnp.asarray(10.0))
        b = self.param("b", lambda _: jnp.asarray(-5.0))
        centroids = get_centroids(embeddings)
        cossim = get_cossim(embeddings, centroids)
        sim = w * cossim + b
        loss, _ = calc_loss(sim)
        return loss
