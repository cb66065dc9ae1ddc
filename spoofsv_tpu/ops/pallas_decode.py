"""Fused whole-decode-step Pallas kernel for the AR Text2Mel decoder.

The scan decoder (``spoofsv_tpu/infer/decode.py``) dispatches ~25 small ops
per frame and — critically — *rolls* every causal-conv ring buffer each step
(``cache = concat([cache[:, 1:], x_t])``), rewriting ~33 MB of cache state
per frame at B=128 on top of re-streaming ~13 MB of weights from HBM. This
kernel keeps the ENTIRE decode loop on-chip:

  * all decode-path weights (16 highway convs + front/tail denses, ~13 MB
    bf16) live in VMEM for the whole rollout — loaded once, not per frame;
  * the 16 ring buffers are VMEM scratch addressed *circularly*
    (slot ``t mod 2·dilation``) — zero data movement per step;
  * K/V, the speaker projections, and the monotonic-attention state stay
    resident; only the per-frame outputs (mel frame + attention column)
    leave the chip.

Grid = one step per 128-row batch tile; the full ``T``-frame ``fori_loop``
runs inside each grid step (the rollout is sequential — there is nothing to
pipeline across frames). Replaces the hot loop of
``models/TTSModel.py:275-300`` / ``synthesize.py:104-109``; mathematically
identical to :meth:`MelSyn.decode_step` (parity-tested step-vs-kernel).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pragma: no cover - exercised on TPU
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

ATT_MASK_VALUE = -2.0 ** 32     # models/TTSModel.py:284,286
LN_EPS = 1e-5

# decode-path highway layers, in execution order:
# enc.hci1 (d 1/3/9/27), enc.hci2 (d 1/3/9/27), enc.hc1 (d3), enc.hc2 (d3),
# dec.hci (d 1/3/9/27), dec.hc1 (d1), dec.hc2 (d1)
HW_DILATIONS = (1, 3, 9, 27, 1, 3, 9, 27, 3, 3, 1, 3, 9, 27, 1, 1)
N_HW = len(HW_DILATIONS)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ----------------------------------------------------------------------
# Weight packing
# ----------------------------------------------------------------------

def pack_decode_weights(params, hidden: int, freq_bins: int,
                        dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Flatten the MelSyn decode-path params into the kernel's stacked
    layout (traceable — safe to call under jit). Weights land in ``dtype``,
    LN params/biases in f32.
    """
    p = params["params"] if "params" in params else params
    enc = p["audio_encoder"]
    dec = p["audio_decoder"]
    c = hidden
    fpad = _round_up(freq_bins, 128)

    hw_layers = (
        [enc["hci1"][f"hc{i}"] for i in range(1, 5)]
        + [enc["hci2"][f"hc{i}"] for i in range(1, 5)]
        + [enc["hc1"], enc["hc2"]]
        + [dec["hci"][f"hc{i}"] for i in range(1, 5)]
        + [dec["hc1"], dec["hc2"]]
    )
    hw_w = jnp.stack([jnp.reshape(l["conv"]["kernel"], (3 * c, 2 * c))
                      for l in hw_layers])
    hw_b = jnp.stack([l["conv"]["bias"] for l in hw_layers])
    hw_ln = jnp.stack([
        jnp.stack([l["ln1"]["scale"], l["ln1"]["bias"],
                   l["ln2"]["scale"], l["ln2"]["bias"]])
        for l in hw_layers])

    # square (C, C) denses: enc.conv2, enc.conv3, dec tail conv2/conv3/conv4
    sq = [enc["conv2"], enc["conv3"], dec["conv2"], dec["conv3"], dec["conv4"]]
    sq_w = jnp.stack([m["kernel"] for m in sq])
    sq_b = jnp.stack([m["bias"] for m in sq])

    # non-highway LayerNorms in execution order:
    # enc ln1/ln2/ln3, dec ln1, dec ln2/ln3/ln4 (ln5 is stored freq-padded)
    misc_ln = jnp.stack([
        jnp.stack([m["scale"], m["bias"]])
        for m in (enc["ln1"], enc["ln2"], enc["ln3"], dec["ln1"],
                  dec["ln2"], dec["ln3"], dec["ln4"])])

    def fpad_row(v):
        return jnp.pad(jnp.asarray(v, jnp.float32), (0, fpad - freq_bins))[None, :]

    enc_w1 = jnp.pad(enc["conv1"]["kernel"], ((0, fpad - freq_bins), (0, 0)))
    enc_b1 = jnp.asarray(enc["conv1"]["bias"], jnp.float32)[None, :]

    dec_w1 = dec["conv1"]["kernel"]                          # (2C, C)
    dec_b1 = jnp.asarray(dec["conv1"]["bias"], jnp.float32)[None, :]

    tail_w5 = jnp.pad(dec["conv5"]["kernel"], ((0, 0), (0, fpad - freq_bins)))

    return {
        "hw_w": jnp.asarray(hw_w, dtype), "hw_b": jnp.asarray(hw_b, jnp.float32),
        "hw_ln": jnp.asarray(hw_ln, jnp.float32),
        "sq_w": jnp.asarray(sq_w, dtype), "sq_b": jnp.asarray(sq_b, jnp.float32),
        "misc_ln": jnp.asarray(misc_ln, jnp.float32),
        "enc_w1": jnp.asarray(enc_w1, dtype),
        "enc_b1": enc_b1,
        "dec_w1": jnp.asarray(dec_w1, dtype),
        "dec_b1": dec_b1,
        "tail_w5": jnp.asarray(tail_w5, dtype),
        "tail_b5": fpad_row(dec["conv5"]["bias"]),
        "ln5_s": fpad_row(dec["ln5"]["scale"]),
        "ln5_b": fpad_row(dec["ln5"]["bias"]),
    }


# ----------------------------------------------------------------------
# Kernel
# ----------------------------------------------------------------------

def _layer_norm(x32, scale, bias, width: Optional[int] = None,
                mask=None):
    """f32 LayerNorm matching flax's fast-variance formula; optional masked
    stats over the first ``width`` lanes (for the freq-padded ln5)."""
    if width is None:
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        mean2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    else:
        mean = jnp.sum(x32 * mask, axis=-1, keepdims=True) / width
        mean2 = jnp.sum(x32 * x32 * mask, axis=-1, keepdims=True) / width
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return y * scale + bias


def _decode_kernel(k_ref, v_ref, s1_ref, s2_ref, hw_w, hw_b, hw_ln,
                   sq_w, sq_b, misc_ln, enc_w1, enc_b1, dec_w1, dec_b1,
                   tail_w5, tail_b5, ln5_s, ln5_b, y_out, a_out, *rings,
                   n_frames: int, n_text: int, freq_bins: int,
                   hidden: int, condition: bool, monotonic: bool):
    c = hidden
    dtype = k_ref.dtype
    bt = k_ref.shape[0]
    npad = k_ref.shape[1]
    fpad = y_out.shape[2]
    scale = 1.0 / float(np.sqrt(c))
    f32 = jnp.float32

    # zero the ring buffers: scratch persists across batch-tile grid steps,
    # and zeros are exactly the causal left-padding (HighwayConv.init_cache)
    for r in rings:
        r[:] = jnp.zeros_like(r)

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (bt, npad), 1)
    ln5_mask = (jax.lax.broadcasted_iota(jnp.int32, (bt, fpad), 1)
                < freq_bins).astype(f32)

    def dense(x, w, b):
        return (jnp.dot(x.astype(dtype), w[:],
                        preferred_element_type=f32) + b)

    def hw(li, t, x):
        """Gated highway conv step with circular ring addressing."""
        d = HW_DILATIONS[li]
        pad = 2 * d
        ring = rings[li]
        i0 = jax.lax.rem(t, pad)                # slot of x[t-2d] (== write slot)
        i1 = jax.lax.rem(t + d, pad)            # slot of x[t-d]
        x0 = ring[i0]
        x1 = ring[i1]
        taps = jnp.concatenate([x0, x1, x.astype(dtype)], axis=-1)
        h = jnp.dot(taps, hw_w[li], preferred_element_type=f32) + hw_b[li]
        h1 = _layer_norm(h[:, :c], hw_ln[li, 0], hw_ln[li, 1])
        h2 = _layer_norm(h[:, c:], hw_ln[li, 2], hw_ln[li, 3])
        g = jax.nn.sigmoid(h1)
        out = g * h2 + (1.0 - g) * x.astype(f32)
        ring[i0] = x.astype(dtype)
        return out

    def step(t, carry):
        y_prev, pma = carry

        # ---- audio-encoder front (AudioEncoder._front) ----
        x = dense(y_prev, enc_w1, enc_b1[:])
        if condition:
            x = x + s1_ref[:].astype(f32)
        x = _layer_norm(x, misc_ln[0, 0], misc_ln[0, 1])
        x = jax.nn.relu(x)
        x = _layer_norm(dense(x, sq_w[0], sq_b[0]), misc_ln[1, 0], misc_ln[1, 1])
        x = jax.nn.relu(x)
        x = dense(x, sq_w[1], sq_b[1])
        if condition:
            x = x + s2_ref[:].astype(f32)
        x = _layer_norm(x, misc_ln[2, 0], misc_ln[2, 1])

        for li in range(10):                    # encoder highway layers
            x = hw(li, t, x)
        q = x                                   # (Bt, C) f32

        # ---- monotonic attention (MelSyn.decode_step) ----
        scores = jnp.sum(k_ref[:].astype(f32) * q[:, None, :], axis=-1) * scale
        valid = iota_n < n_text
        if monotonic:
            valid = valid & (iota_n >= pma) & (iota_n <= pma + 2)
        scores = jnp.where(valid, scores, ATT_MASK_VALUE)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores)
        a = e / jnp.sum(e, axis=-1, keepdims=True)              # (Bt, Npad)
        amax = jnp.max(a, axis=-1, keepdims=True)
        pma = jnp.min(jnp.where(a >= amax, iota_n, npad), axis=-1,
                      keepdims=True)
        r = jnp.sum(a[:, :, None].astype(f32) * v_ref[:].astype(f32), axis=1)

        # ---- audio decoder ----
        x = (jnp.dot(r.astype(dtype), dec_w1[:c], preferred_element_type=f32)
             + jnp.dot(q.astype(dtype), dec_w1[c:], preferred_element_type=f32)
             + dec_b1[:])
        x = _layer_norm(x, misc_ln[3, 0], misc_ln[3, 1])
        for li in range(10, N_HW):              # decoder highway layers
            x = hw(li, t, x)
        x = _layer_norm(dense(x, sq_w[2], sq_b[2]), misc_ln[4, 0], misc_ln[4, 1])
        x = jax.nn.relu(x)
        x = _layer_norm(dense(x, sq_w[3], sq_b[3]), misc_ln[5, 0], misc_ln[5, 1])
        x = jax.nn.relu(x)
        x = _layer_norm(dense(x, sq_w[4], sq_b[4]), misc_ln[6, 0], misc_ln[6, 1])
        x = jax.nn.relu(x)
        x = dense(x, tail_w5, tail_b5[:])
        x = _layer_norm(x, ln5_s[:], ln5_b[:], width=freq_bins, mask=ln5_mask)
        y = jax.nn.sigmoid(x) * ln5_mask        # zero the freq padding

        y_out[t] = y.astype(dtype)
        a_out[t] = a.astype(dtype)
        return (y.astype(dtype), pma.astype(jnp.int32))

    y0 = jnp.zeros((bt, fpad), dtype)
    pma0 = jnp.zeros((bt, 1), jnp.int32)
    jax.lax.fori_loop(0, n_frames, step, (y0, pma0))


# ----------------------------------------------------------------------
# Host-side wrapper
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "n_frames", "freq_bins", "hidden", "condition", "monotonic",
    "batch_tile", "interpret"))
def decode_fused(packed: Dict[str, jnp.ndarray], K: jnp.ndarray,
                 V: jnp.ndarray, s1: Optional[jnp.ndarray],
                 s2: Optional[jnp.ndarray], *, n_frames: int, freq_bins: int,
                 hidden: int, condition: bool = True, monotonic: bool = True,
                 batch_tile: Optional[int] = None, interpret: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the fused rollout. ``K``/``V``: (B, N, C). Returns
    (Y (B, T, freq_bins), A (B, N, T), pma (B,)).

    ``batch_tile`` defaults by dtype: 128 rows for 2-byte dtypes, 64 for f32
    — the resident set (weights + rings + K/V blocks + output blocks) must
    stay inside the ~128 MB VMEM budget.
    """
    b, n, c = K.shape
    assert c == hidden
    dtype = K.dtype
    if batch_tile is None:
        batch_tile = 128 if jnp.dtype(dtype).itemsize <= 2 else 64
    npad = _round_up(n, 128)
    fpad = _round_up(freq_bins, 128)
    bt = min(batch_tile, b)
    bpad = _round_up(b, bt)

    def pad_to(x, shape):
        return jnp.pad(x, [(0, s - d) for s, d in zip(shape, x.shape)])

    Kp = pad_to(K, (bpad, npad, c))
    Vp = pad_to(V, (bpad, npad, c))
    if s1 is None:
        s1 = jnp.zeros((b, c), dtype)
        s2 = jnp.zeros((b, c), dtype)
    s1p = pad_to(s1.astype(dtype), (bpad, c))
    s2p = pad_to(s2.astype(dtype), (bpad, c))

    n_tiles = bpad // bt
    kernel = functools.partial(
        _decode_kernel, n_frames=n_frames, n_text=n, freq_bins=freq_bins,
        hidden=hidden, condition=condition, monotonic=monotonic)

    w_names = ("hw_w", "hw_b", "hw_ln", "sq_w", "sq_b", "misc_ln",
               "enc_w1", "enc_b1", "dec_w1", "dec_b1", "tail_w5", "tail_b5",
               "ln5_s", "ln5_b")
    weights = [packed[k] for k in w_names]

    def _mspace():
        return ({"memory_space": _VMEM}
                if (_VMEM is not None and not interpret) else {})

    def const_spec(x):
        zeros = (0,) * x.ndim
        return pl.BlockSpec(x.shape, lambda i, z=zeros: z, **_mspace())

    in_specs = [
        pl.BlockSpec((bt, npad, c), lambda i: (i, 0, 0), **_mspace()),   # K
        pl.BlockSpec((bt, npad, c), lambda i: (i, 0, 0), **_mspace()),   # V
        pl.BlockSpec((bt, c), lambda i: (i, 0), **_mspace()),            # s1
        pl.BlockSpec((bt, c), lambda i: (i, 0), **_mspace()),            # s2
    ] + [const_spec(w) for w in weights]

    out_specs = [
        pl.BlockSpec((n_frames, bt, fpad), lambda i: (0, i, 0), **_mspace()),
        pl.BlockSpec((n_frames, bt, npad), lambda i: (0, i, 0), **_mspace()),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_frames, bpad, fpad), dtype),
        jax.ShapeDtypeStruct((n_frames, bpad, npad), dtype),
    ]

    scratch = [pltpu.VMEM((2 * d, bt, c), dtype) for d in HW_DILATIONS]
    params = {}
    if not interpret:
        params = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024)}

    y, a = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **params,
    )(Kp, Vp, s1p, s2p, *weights)

    Y = jnp.transpose(y[:, :b, :freq_bins], (1, 0, 2))      # (B, T, F)
    A = jnp.transpose(a[:, :b, :n], (1, 2, 0))              # (B, N, T)
    # NB: pma is re-derived from the attention AFTER its cast to the kernel
    # dtype (bf16 in production), whereas the scan decoder returns the
    # in-loop f32 argmax — bf16 rounding can tie-flip the index. All current
    # callers discard pma; documented deviation from make_decoder's contract
    # rather than carrying one more kernel output.
    pma = jnp.argmax(A[:, :, -1], axis=1).astype(jnp.int32)
    return Y, A, pma


def make_fused_decoder(model, n_frames: int, monotonic: bool = True,
                       batch_tile: Optional[int] = None, interpret: bool = False):
    """Drop-in replacement for :func:`spoofsv_tpu.infer.decode.make_decoder`
    backed by the fused kernel. Same signature and return contract."""
    from spoofsv_tpu.models.text2mel import MelSyn

    @jax.jit
    def decode(params, text_ids, spk_emb, text_mask=None):
        assert text_mask is None, "fused decoder attends over full text"
        K, V = model.apply(params, text_ids, method=MelSyn.encode_text)
        p = params["params"]
        if model.condition:
            enc = p["audio_encoder"]
            s1 = spk_emb @ enc["fc1"]["kernel"] + enc["fc1"]["bias"]
            s2 = spk_emb @ enc["fc2"]["kernel"] + enc["fc2"]["bias"]
            s1 = s1.astype(K.dtype)
            s2 = s2.astype(K.dtype)
        else:
            s1 = s2 = None
        packed = pack_decode_weights(params, model.hidden_dim,
                                     model.freq_bins, dtype=K.dtype)
        return decode_fused(packed, K, V, s1, s2, n_frames=n_frames,
                            freq_bins=model.freq_bins, hidden=model.hidden_dim,
                            condition=model.condition, monotonic=monotonic,
                            batch_tile=batch_tile, interpret=interpret)

    return decode
