"""Scan-based autoregressive Text2Mel decoder.

The reference decodes by re-running the audio encoder over the whole prefix at
every frame — O(T²) work with a per-item Python masking loop
(``synthesize.py:104-109``, ``models/TTSModel.py:275-300``). Here decoding is a
single jitted ``lax.scan`` of O(T) cached steps (causal-conv ring buffers +
incremental monotonic attention), batched over utterances. Equivalence with the
teacher-forced training graph is covered by tests/test_models.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from spoofsv_tpu.models.text2mel import MelSyn

Array = jax.Array


def make_decoder(model: MelSyn, n_frames: int, monotonic: bool = True,
                 unroll: int = 8):
    """Build a jitted batch decoder.

    Returns ``decode(params, text_ids (B,N), spk_emb (B,E)) -> (Y (B,T,F),
    A (B,N,T), pma (B,))`` with ``T = n_frames`` (the reference rolls out
    exactly MAX_FRAME_NUM frames for the spoof set —
    ``generate_test_utterances.py:111-116``). ``unroll`` amortizes scan
    bookkeeping and lets XLA fuse across adjacent decode steps (the per-frame
    ops are small at these model dims).
    """

    @jax.jit
    def decode(params, text_ids: Array, spk_emb: Optional[Array],
               text_mask: Optional[Array] = None):
        batch = text_ids.shape[0]
        K, V = model.apply(params, text_ids, method=MelSyn.encode_text)
        state0 = model.apply(params, batch, method=MelSyn.init_state)

        def step(state, _):
            state, (y_t, a_t) = model.apply(
                params, state, K, V, spk_emb, text_mask, monotonic,
                method=MelSyn.decode_step)
            return state, (y_t, a_t)

        state, (ys, attn) = jax.lax.scan(step, state0, None, length=n_frames,
                                         unroll=unroll)
        Y = jnp.transpose(ys, (1, 0, 2))        # (B, T, F)
        A = jnp.transpose(attn, (1, 2, 0))      # (B, N, T)
        return Y, A, state.pma

    return decode
