"""Batched synthesis pipeline: Text2Mel decode → SSRN → Griffin-Lim → wav.

TPU-native re-design of ``synthesize.py:96-147`` and
``generate_test_utterances.py:98-139``: the whole chain — AR mel decode, SSRN
super-resolution, magnitude renormalization, 64-iteration Griffin-Lim, and IIR
de-emphasis — is jitted and batched on device. The host only trims, peak-
normalizes and writes wavs (cheap O(L) tail work).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spoofsv_tpu.config import Config
from spoofsv_tpu.dsp import host as dsp_host
from spoofsv_tpu.dsp import jaxdsp
from spoofsv_tpu.infer.decode import make_decoder
from spoofsv_tpu.models.ssrn import SSRN
from spoofsv_tpu.models.text2mel import MelSyn

Array = jax.Array


def make_vocoder(cfg: Config, n_iter: Optional[int] = None):
    """Jitted (lin_mag (B, T, F), key) → audio (B, hop*(T-1)).

    Implements the post-net of ``synthesize.py:134-145``: per-utterance max
    renorm (non-log mode), power re-expansion ``(·)^(1.3/0.6)``, Griffin-Lim
    (64 iters, hop 256, win 1024), and de-emphasis.
    """
    n_iter = n_iter or cfg.tpu.griffin_lim_iters
    n_fft = cfg.stft.fft_length
    hop = cfg.stft.hop_length
    power = cfg.norm.reconstruction_power / cfg.norm.analysis_power
    precision = (jax.lax.Precision.HIGHEST
                 if cfg.tpu.griffin_lim_precision == "highest"
                 else jax.lax.Precision.DEFAULT)
    impl = cfg.tpu.griffin_lim_impl
    # "auto": the Mosaic kernel only lowers on TPU, and it is inherently a
    # bf16 kernel — an explicit griffin_lim_precision="highest" request keeps
    # the f32 XLA loop. impl="pallas" forces the kernel regardless.
    use_pallas = (impl == "pallas" or
                  (impl == "auto" and jax.default_backend() == "tpu"
                   and cfg.tpu.griffin_lim_precision != "highest"))

    @jax.jit
    def vocode(lin_pred: Array, key: Array, seeds: Optional[Array] = None
               ) -> Array:
        """``seeds``: optional per-utterance GL phase seeds (shard_map DP
        callers draw them globally via ``gl_seeds`` and shard them, so
        sharded audio is identical to single-device)."""
        x = lin_pred.astype(jnp.float32)
        if cfg.norm.log_feature:
            db = x * cfg.norm.max_db - cfg.norm.max_db + cfg.norm.ref_db
            x = jnp.power(10.0, 0.05 * db)
        else:
            peak = jnp.max(x, axis=(1, 2), keepdims=True)
            x = x / jnp.maximum(peak, 1e-8)
        spec = jnp.power(x, power)
        init_mode = getattr(cfg.tpu, "griffin_lim_init", "random")
        if use_pallas:
            from spoofsv_tpu.ops.pallas_gl import griffin_lim_fused
            audio = griffin_lim_fused(
                spec, key, n_fft, hop, n_fft, n_iter=n_iter,
                precision=precision,
                int8_fwd=getattr(cfg.tpu, "griffin_lim_int8", False),
                seeds=seeds, init_mode=init_mode)
        else:
            ia = None
            if init_mode == "advance":
                a_re, a_im = jaxdsp.gl_advance_angles(
                    spec.shape[1], spec.shape[2], n_fft, hop)
                ia = (jnp.broadcast_to(a_re, spec.shape),
                      jnp.broadcast_to(a_im, spec.shape))
            elif init_mode == "spsi":
                ia = jaxdsp.gl_spsi_angles(spec, n_fft, hop)
            audio = jaxdsp.griffin_lim(spec, key, n_fft, hop, n_fft,
                                       n_iter=n_iter, precision=precision,
                                       init_angles=ia)
        return jaxdsp.deemphasis(audio, coeff=cfg.preemph)

    return vocode


def finalize_audio(audio: np.ndarray, cfg: Config, trim_db: Optional[float] = None,
                   max_seconds: Optional[float] = None) -> np.ndarray:
    """Host-side tail: optional trim, duration cap, peak scale ×0.75.

    Mirrors ``generate_test_utterances.py:136-139`` (trim 30 dB, 9 s cap) and
    ``synthesize.py:147`` (scale by max → 0.75; note the reference divides by
    ``max`` not ``|max|`` — preserved). The serving path's on-device int16
    PCM epilogue (:mod:`spoofsv_tpu.serve`) feeds its dequantized audio
    through this same normalization, so both serving modes scale over the
    identical post-trim/cap window.
    """
    y = np.asarray(audio, dtype=np.float32)
    if trim_db is not None:
        y, _ = dsp_host.trim_silence(y, trim_db)
        if len(y) == 0:
            y = np.asarray(audio, dtype=np.float32)
    if max_seconds is not None and len(y) > int(max_seconds * cfg.sampling_rate):
        y = y[: int(max_seconds * cfg.sampling_rate)]
    if not cfg.norm.log_feature:
        y = y / np.max(y) * 0.75
    return y


class Synthesizer:
    """End-to-end batched TTS: (text_ids, spk_emb) → waveforms.

    ``mesh``: optional ``jax.sharding.Mesh`` for data-parallel synthesis —
    params are replicated, the batch axis is sharded over the mesh's
    ``data`` axis, and XLA propagates the sharding through the whole fused
    decode→SSRN→Griffin-Lim program (every op is per-sample, so scale-out is
    collective-free; the reference's inference analog is the DataParallel
    wrap at ``synthesize.py:75-77``). Batch size must be divisible by the
    data-axis size.
    """

    def __init__(self, cfg: Config, melsyn: MelSyn, ssrn: SSRN,
                 melsyn_params, ssrn_params, n_frames: Optional[int] = None,
                 gl_iters: Optional[int] = None, mesh=None):
        self.cfg = cfg
        self.melsyn = melsyn
        self.ssrn = ssrn
        self.mesh = mesh
        if mesh is not None:
            from spoofsv_tpu.parallel.mesh import (batch_sharding,
                                                   replicate_tree, replicated)
            melsyn_params = replicate_tree(melsyn_params, mesh)
            ssrn_params = replicate_tree(ssrn_params, mesh)
            self._batch_sh = batch_sharding(mesh)
            self._rep = replicated(mesh)
        self.melsyn_params = melsyn_params
        self.ssrn_params = ssrn_params
        self.n_frames = n_frames or cfg.max_frame_num
        impl = getattr(cfg.tpu, "decode_impl", "auto")
        use_pallas_decode = (
            impl == "pallas" or (impl == "auto"
                                 and jax.default_backend() == "tpu"))
        if use_pallas_decode:
            from spoofsv_tpu.ops.pallas_decode import make_fused_decoder
            self.decode = make_fused_decoder(
                melsyn, self.n_frames,
                interpret=jax.default_backend() == "cpu")
        else:
            self.decode = make_decoder(melsyn, self.n_frames)
        self.vocode = make_vocoder(cfg, gl_iters)
        self._ssrn_apply = jax.jit(lambda p, mel: ssrn.apply(p, mel))
        self._shard_map = mesh is not None and use_pallas_decode

        # One fused program for the whole pipeline: decode → SSRN → vocoder.
        # Each separate dispatch through a remote-TPU transport costs tens of
        # ms; fusing three dispatches into one is a measurable win per batch.
        def _full(p1, p2, text_ids, spk_emb, key):
            mel, attn, _ = self.decode(p1, text_ids, spk_emb)
            lin = ssrn.apply(p2, mel)
            audio = self.vocode(lin, key)
            return audio, mel, attn

        if self._shard_map:
            # pallas_call is not auto-partitionable under pjit — wrap the
            # whole per-sample pipeline in shard_map over the data axis so
            # every device runs the fused kernels on its batch shard. GL
            # phase seeds are drawn GLOBALLY (gl_seeds) and sharded like the
            # batch, so DP audio is identical to single-device.
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            da = cfg.tpu.mesh_data_axis

            def _full_seeded(p1, p2, text_ids, spk_emb, key, seeds):
                mel, attn, _ = self.decode(p1, text_ids, spk_emb)
                lin = ssrn.apply(p2, mel)
                audio = self.vocode(lin, key, seeds)
                return audio, mel, attn

            self._full = jax.jit(shard_map(
                _full_seeded, mesh=mesh,
                in_specs=(P(), P(), P(da), P(da), P(), P(da)),
                out_specs=(P(da), P(da), P(da)),
                check_rep=False))
        else:
            self._full = jax.jit(_full)

    def mel_to_audio(self, mel: Array, key: Array) -> Array:
        lin = self._ssrn_apply(self.ssrn_params, mel)
        return self.vocode(lin, key)

    def __call__(self, text_ids: Array, spk_emb: Array, key: Array
                 ) -> Tuple[Array, Array, Array]:
        """Returns (audio (B, L), coarse_mel (B, T, 80), attention (B, N, T))."""
        if self.mesh is not None:
            text_ids = jax.device_put(jnp.asarray(text_ids), self._batch_sh)
            spk_emb = jax.device_put(jnp.asarray(spk_emb), self._batch_sh)
            key = jax.device_put(key, self._rep)
            if self._shard_map:
                from spoofsv_tpu.ops.pallas_gl import gl_seeds
                seeds = jax.device_put(gl_seeds(key, text_ids.shape[0]),
                                       self._batch_sh)
                return self._full(self.melsyn_params, self.ssrn_params,
                                  text_ids, spk_emb, key, seeds)
        return self._full(self.melsyn_params, self.ssrn_params, text_ids,
                          spk_emb, key)
