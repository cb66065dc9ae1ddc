"""Fused Griffin-Lim TPU kernel (Pallas/Mosaic).

The XLA Griffin-Lim (:func:`spoofsv_tpu.dsp.jaxdsp.griffin_lim`) spends each of
its 64 iterations round-tripping the ``(B, T, n_fft)`` frames and ``(B, L)``
signal tensors through HBM (measured 17.5 ms/iteration at B=128, T=1300 on
v5e — ~5x the compute roofline). This kernel runs the *entire* 64-iteration
loop for one utterance inside VMEM: grid ``(B,)``, one grid step = one
utterance, zero HBM traffic between iterations.

Key design points (all shapes static; reference behavior is librosa 0.7
``griffinlim`` as called at ``synthesize.py:144``):

* **DFT-as-matmul on the MXU** — the axon TPU backend has no FFT, and a
  1024-point rDFT is two matmuls. The contraction runs over the 512
  MXU-aligned bins; the Nyquist bin (whose DFT column is ``(-1)^n`` with a
  zero sine part) is applied as a rank-1 VPU update rather than padding K
  from 513 to 640 lanes. All DFT matrices are generated *inside* the kernel
  from ``broadcasted_iota`` (exact int32 ``n·k mod N`` angle reduction) —
  embedding 8 MB of constants in the HLO overflows the remote-compile
  request limit.
* **No signal materialization per iteration** — with hop = n_fft/4 the
  ISTFT→STFT round trip couples analysis frame ``t`` only to synthesis frames
  ``t-3..t+3``:  ``ana[t, j] = w[j]·invwss[256t+j]·Σ_d fsyn[t+d, j-256d]``.
  The interior ``wss`` is exactly 1.5 for the periodic Hann window, so the
  shift-sum needs no signal buffer at all.
* **Exact edges** — the first/last 3 frames see the true ``window_sumsquare``
  edge values, and frames {0, 1, T-2, T-1} see librosa's reflect padding; both
  are reconstructed exactly from a 1536-sample overlap-add at each boundary
  (reversal implemented as a 0/1 flip-matrix matmul — exact, and avoids
  relying on ``lax.rev`` support in Mosaic).
* **bf16 state** — phase/rebuilt carries, the shift-sum accumulation, and
  matmul operands are bf16 (measured spectrally neutral); the momentum +
  normalize step is f32.

Measured on v5e at B=128, T=1300, 64 iterations: 1170 ms (XLA loop) →
332 ms bf16 / **229 ms int8** (round-3 kernel: OLA signal-chunk buffer
replacing the 7-term shift-sum, hoisted loop-invariant int8 quantization,
f32 ana/momentum state eliminating cast passes, TT=512, clipless 126.5
operand scale). Spectral convergence 0.0585 bf16 / 0.0604 int8 vs 0.0588
f32 XLA. The final ``istft(mag·ang)`` runs as an in-kernel chunk
overlap-add epilogue fed by the same chunk buffer.

Tried and measured NOT faster (kept out for simplicity): 2 utterance rows
per grid step (378 ms — Mosaic already overlaps within a row, and the extra
VMEM state hurts pipelining); manual software-pipelining of the tile loops
(emitting the next tile's VPU work between a tile's matmuls and its
dependent tail — exactly 360 ms, i.e. the scheduler already handles it);
bf16 phase-A quantize multiplies (qm·ang in bf16 with a single f32 upcast
for the round — Mosaic has no bf16 roundeven — measured 232.5 vs 227.7 ms
same-session baseline: the separate bf16 multiply breaks the fused f32
elementwise chain).

Analyzed and rejected, round 3: quantizing the sig *chunks* once per
iteration with contraction-split phase-B matmuls (4 slices of 256, window
folded into the int8 DFT matrices). Per-chunk quantization scales cannot be
shared across the 4 slices feeding one frame, so each slice's int32 output
needs its own dequant multiply-accumulate — 8 extra (T×512) VPU passes per
iteration, which outweighs the saved gather/window/quantize passes
(~6 × (T×1024)-equivalent). The kernel is VPU-bound (≈28 µs/utt/iter vs
≈14 µs MXU roofline), so the restructure nets out negative.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pragma: no cover - exercised on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM

    def _scratch(shape, dtype):
        return pltpu.VMEM(shape, dtype)
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None
    _SMEM = None
    _scratch = None

TT = 512          # frame-tile rows per matmul. Post-r3 restructure (sig-chunk
                  # OLA + hoisted quantize) bigger tiles win: int8 238ms at
                  # TT=256 -> 229.8 at 512 -> 228.4 at 1312 (shape-specific);
                  # 512 keeps the generality. (r2 kernel measured best at 256.)
_EPS_WSS = 1e-11  # istft_ri's window-sum-square threshold



def _supported(n_fft: int, hop: int, win_length: int, T: int) -> bool:
    return (win_length == n_fft and n_fft % hop == 0 and n_fft // hop == 4
            and hop % 128 == 0 and T >= 16)


def _hash_mix(tt, kk, seed):
    """int32 murmur3-style mixer over (frame, bin, seed) — identical bits to
    the uint32 formulation via two's-complement wrap-around."""
    srl = jax.lax.shift_right_logical
    h = ((tt * jnp.int32(73856093)) ^ (kk * jnp.int32(19349663))
         ^ (seed * jnp.int32(83492791)))
    h = h ^ srl(h, 16)
    h = h * jnp.int32(-2048144789)   # 0x85EBCA6B as two's-complement int32
    h = h ^ srl(h, 13)
    h = h * jnp.int32(-1028477387)   # 0xC2B2AE35
    h = h ^ srl(h, 16)
    return h


def _tiles_of(Tp: int):
    """Static (row0, rows) tile list: full TT tiles + one short remainder."""
    out = [(i * TT, TT) for i in range(Tp // TT)]
    if Tp % TT:
        out.append((Tp - Tp % TT, Tp % TT))
    return out


def _gl_kernel(seed_ref, mag_ref, *refs,
               n_fft: int, hop: int, T: int, Tp: int, n_iter: int,
               momentum: float, R: int, int8_fwd: bool, init_mode: str):
    if init_mode == "external":
        extre_ref, extim_ref = refs[:2]
        refs = refs[2:]
    elif init_mode == "spsi":
        magf_ref = refs[0]          # f32 magnitudes, read once by the init
        refs = refs[1:]
    (angre_ref, angim_ref, audio_ref,
     fsyn, rebre, rebim, dftc, dfts, invc, invs, nyq_c, nyq_ic,
     wvec, invw_l, invw_r, flip, ana, sedge, eana, sig, *extra) = refs
    N = n_fft
    F = N // 2 + 1
    Fa = F - 1            # MXU-aligned bin count; Nyquist handled rank-1
    tiles = _tiles_of(Tp)
    alpha = momentum / (1.0 + momentum)
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    # R utterance rows per grid step: rows are independent, so interleaving
    # their tile bodies (rows inner, tiles outer) gives the scheduler parallel
    # MXU/VPU chains to overlap.

    # ------------------------------------------------------------------
    # One-time constants (scratch persists across grid steps)
    # ------------------------------------------------------------------
    @pl.when(pl.program_id(0) == 0)
    def _init_consts():
        # Forward/inverse DFT matrices over the MXU-aligned bins [0, N/2);
        # the Nyquist bin k=N/2 has cos = (-1)^n and sin ≡ 0, so it is applied
        # as a rank-1 VPU update instead of padding K from 513 to 640 lanes.
        ii = jax.lax.broadcasted_iota(jnp.int32, (N, Fa), 0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (N, Fa), 1)
        th = ((ii * kk) % N).astype(f32) * f32(2.0 * np.pi / N)
        dftc[:] = jnp.cos(th).astype(bf16)
        dfts[:] = (-jnp.sin(th)).astype(bf16)

        k2 = jax.lax.broadcasted_iota(jnp.int32, (Fa, N), 0)
        n2 = jax.lax.broadcasted_iota(jnp.int32, (Fa, N), 1)
        th2 = ((k2 * n2) % N).astype(f32) * f32(2.0 * np.pi / N)
        wk = jnp.where(k2 == 0, 1.0, 2.0).astype(f32) / N
        invc[:] = (wk * jnp.cos(th2)).astype(bf16)
        invs[:] = (-wk * jnp.sin(th2)).astype(bf16)

        nn = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        sign = jnp.where(nn % 2 == 0, 1.0, -1.0).astype(f32)
        nyq_c[:] = sign                 # fwd DFT Nyquist column: cos(πn)
        nyq_ic[:] = sign / N            # inverse row (w_k = 1 at Nyquist)

        j = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1).astype(f32)
        w = 0.5 - 0.5 * jnp.cos(j * f32(2.0 * np.pi / N))
        wvec[:] = w
        w2 = w * w

        # window_sumsquare edges: chunk r of w² is w2[:, hop*r : hop*(r+1)]
        for m in range(6):  # left: samples [hop*m, hop*(m+1))
            acc = jnp.zeros((1, hop), f32)
            for r in range(0, min(3, m) + 1):
                acc = acc + w2[:, hop * r: hop * (r + 1)]
            invw_l[m:m + 1, :] = jnp.where(acc > _EPS_WSS, 1.0 / jnp.maximum(acc, _EPS_WSS), 1.0)
        for idx in range(6):  # right: chunk M = T-3+idx of the OLA signal
            acc = jnp.zeros((1, hop), f32)
            for r in range(max(0, idx - 2), 4):
                acc = acc + w2[:, hop * r: hop * (r + 1)]
            invw_r[idx:idx + 1, :] = jnp.where(acc > _EPS_WSS, 1.0 / jnp.maximum(acc, _EPS_WSS), 1.0)

        fi = jax.lax.broadcasted_iota(jnp.int32, (N // 2, N // 2), 0)
        fj = jax.lax.broadcasted_iota(jnp.int32, (N // 2, N // 2), 1)
        flip[:] = (fi + fj == N // 2 - 1).astype(f32)

        if int8_fwd:
            dftc8, dfts8, inv8c, inv8s = extra[:4]
            dftc8[:] = jnp.round(jnp.cos(th) * 127.0).astype(jnp.int8)
            dfts8[:] = jnp.round(-jnp.sin(th) * 127.0).astype(jnp.int8)
            inv8c[:] = jnp.round(jnp.cos(th2) * 127.0).astype(jnp.int8)
            inv8s[:] = jnp.round(-jnp.sin(th2) * 127.0).astype(jnp.int8)

    # ------------------------------------------------------------------
    # Per-utterance state init
    # ------------------------------------------------------------------
    fsyn[:] = jnp.zeros_like(fsyn)

    if int8_fwd:
        # Hoisted phase-A quantization: mag is loop-invariant, so the int8
        # operand scale (and the w_k fold) never changes across the 64
        # iterations. Precompute qm = mag·w_k·(127/rowmax) once — each
        # iteration's quantize is then a single mul+round (|ang| ≤ 1 keeps
        # |qm·ang| ≤ 127), and re/im share one dequant scale so their int32
        # matmul outputs sum BEFORE the only dequant multiply.
        qm, deqv = extra[4], extra[5]
        kvec0 = jax.lax.broadcasted_iota(jnp.int32, (1, Fa), 1)
        wk_vec0 = jnp.where(kvec0 == 0, 1.0, 2.0).astype(f32)
        for r0, ts in tiles:
            for ri in range(R):
                mw = mag_ref[ri, r0:r0 + ts, 0:Fa].astype(f32) * wk_vec0
                amax = jnp.max(mw, axis=-1, keepdims=True) + f32(1e-20)
                # 126.5 (not 127): |qm·ang| ≤ 126.5 + bf16/round slack
                # stays < 127.5, so the int8 cast needs NO clip pass
                qm[ri, r0:r0 + ts, :] = (mw * (f32(126.5) / amax)).astype(bf16)
                deqv[ri, r0:r0 + ts, :] = jnp.broadcast_to(
                    amax * f32(1.0 / (126.5 * 127.0 * N)), (ts, 128))

    tt_ = jax.lax.broadcasted_iota(jnp.int32, (Tp, F), 0)
    kk_ = jax.lax.broadcasted_iota(jnp.int32, (Tp, F), 1)
    if init_mode == "advance":
        # vocoder-consistent init: φ[t,k] = 2π·hop·k·t/N via exact int mod N
        # (jaxdsp.gl_advance_angles mirror; deterministic — seeds unused)
        hk = (kk_ * jnp.int32(hop)) % jnp.int32(N)
        phase = ((tt_ * hk) % jnp.int32(N)).astype(f32) * f32(2.0 * np.pi / N)
        a_re = jnp.cos(phase).astype(bf16)
        a_im = jnp.sin(phase).astype(bf16)
        for ri in range(R):
            angre_ref[ri] = a_re
            angim_ref[ri] = a_im
    elif init_mode == "external":
        # host/XLA-computed init (e.g. the SPSI instantaneous-frequency init,
        # jaxdsp.gl_spsi_angles): one extra HBM read of the angle pair — the
        # iteration loop touches that footprint ~8x per iteration, so the
        # input cost is noise against the iterations it saves.
        for ri in range(R):
            angre_ref[ri] = extre_ref[ri]
            angim_ref[ri] = extim_ref[ri]
    elif init_mode == "spsi":
        # SPSI instantaneous-frequency init computed IN-KERNEL (mirror of
        # jaxdsp.gl_spsi_angles / the standalone gl_spsi_angles_fused, same
        # f32 log/parabola/chunked-cumsum math on a dedicated f32 mag input
        # read once) — fused here the init costs zero extra kernel launches
        # and zero HBM round-trips of the (B, T, F) angle pair (the
        # standalone path writes + re-reads ~2.8 GB of bf16 angles at bench
        # shape). The rebre/rebim f32 scratch doubles as delta/cumsum
        # storage; both are re-zeroed by the state init below.
        for ri in range(R):
            m = magf_ref[ri].astype(f32)
            logm = jnp.log(jnp.maximum(m, f32(1e-10)))
            a_nb = jnp.concatenate([logm[:, :1], logm[:, : F - 1]], axis=1)
            c_nb = jnp.concatenate([logm[:, 1:], logm[:, F - 1:]], axis=1)
            denom = a_nb - 2.0 * logm + c_nb
            concave = denom < f32(-1e-6)
            rebre[ri] = jnp.clip(
                jnp.where(concave,
                          f32(0.5) * (a_nb - c_nb)
                          / jnp.where(concave, denom, f32(-1.0)),
                          f32(0.0)),
                -0.5, 0.5)
            FC = 128
            for f0 in range(0, F, FC):
                fw = min(FC, F - f0)
                cum = rebre[ri, :, f0:f0 + fw]
                s = 1
                while s < Tp:
                    cum = cum + jnp.concatenate(
                        [jnp.zeros((s, fw), f32), cum[: Tp - s]], axis=0)
                    s *= 2
                rebim[ri, :, f0:f0 + fw] = cum
            delta = rebre[ri]
            cyc = (rebim[ri] - delta) * f32(hop / N)   # exclusive cumsum
            frac = (cyc - jnp.round(cyc)) * f32(2.0 * np.pi)
            frac = frac + delta * f32(np.pi * (N - 1) / N)   # lock=1.0
            hk = (kk_ * jnp.int32(hop)) % jnp.int32(N)
            phase = ((tt_ * hk) % jnp.int32(N)).astype(f32) * f32(
                2.0 * np.pi / N)
            b_re, b_im = jnp.cos(phase), jnp.sin(phase)
            c_f, s_f = jnp.cos(frac), jnp.sin(frac)
            angre_ref[ri] = (b_re * c_f - b_im * s_f).astype(bf16)
            angim_ref[ri] = (b_re * s_f + b_im * c_f).astype(bf16)
    else:
        # int32 murmur-style hash (Mosaic has no uint32->f32 cast; int32
        # wrap-around multiplies + logical shifts give identical bits)
        for ri in range(R):
            seed = seed_ref[pl.program_id(0) * R + ri]
            h = _hash_mix(tt_, kk_, seed)
            phase = (h & jnp.int32(0xFFFFFF)).astype(f32) * f32(
                2.0 * np.pi / (1 << 24))
            angre_ref[ri] = jnp.cos(phase).astype(bf16)
            angim_ref[ri] = jnp.sin(phase).astype(bf16)

    # reb carries start at zero (also clears the spsi branch's scratch use)
    rebre[:] = jnp.zeros_like(rebre)
    rebim[:] = jnp.zeros_like(rebim)

    def _rev(x, width):
        """Exact lane reversal of a (1, width) f32 vector via the 0/1 flip
        matrix (width ∈ {hop, N/2}; flip[i, j] = [i + j == N/2 - 1])."""
        if width == N // 2:
            fm = flip[:]
        else:
            fm = flip[0:width, N // 2 - width: N // 2]
        return jnp.dot(x, fm, preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)

    def phase_a(quant: bool):
        """fsyn[f] = irfft(mag·ang)[f] ⊙ w for all frames of all rows.

        ``quant``: int8 inverse-DFT matmuls with the hoisted loop-invariant
        operand scale (see the per-utterance init) — per iteration the
        quantize is one mul+round per component, and the re/im int32 outputs
        share one dequant. The epilogue's final synthesis always runs the
        bf16 path (``quant=False``) so the output waveform itself is never
        quantized.
        """
        for r0, ts in tiles:
            for ri in range(R):
                if quant:
                    inv8c, inv8s = extra[2], extra[3]
                    qm, deqv = extra[4], extra[5]
                    qmt = qm[ri, r0:r0 + ts, :].astype(f32)
                    are = angre_ref[ri, r0:r0 + ts, :].astype(f32)
                    aim = angim_ref[ri, r0:r0 + ts, 0:Fa].astype(f32)
                    q_re = jnp.round(qmt * are[:, 0:Fa]).astype(jnp.int8)
                    q_im = jnp.round(qmt * aim).astype(jnp.int8)
                    acc = (jnp.dot(q_re, inv8c[:],
                                   preferred_element_type=jnp.int32)
                           + jnp.dot(q_im, inv8s[:],
                                     preferred_element_type=jnp.int32))
                    fr = acc.astype(f32) * deqv[ri, r0:r0 + ts, 0:1]
                    cre_n = (mag_ref[ri, r0:r0 + ts, Fa:F].astype(f32)
                             * are[:, Fa:F])
                else:
                    m = mag_ref[ri, r0:r0 + ts, :].astype(f32)
                    are = angre_ref[ri, r0:r0 + ts, :].astype(f32)
                    aim = angim_ref[ri, r0:r0 + ts, :].astype(f32)
                    cre = m * are
                    cim = m * aim
                    fr = jnp.dot(cre[:, :Fa].astype(bf16), invc[:],
                                 preferred_element_type=f32)
                    fr = fr + jnp.dot(cim[:, :Fa].astype(bf16), invs[:],
                                      preferred_element_type=f32)
                    cre_n = cre[:, Fa:F]
                fr = fr + cre_n * nyq_ic[:]           # Nyquist rank-1 (sin≡0)
                fsyn[ri, 3 + r0: 3 + r0 + ts, :] = (fr * wvec[:]).astype(bf16)

    def build_sig():
        """OLA signal chunks: sig[c] = Σ_{r=0..3} fsyn[3+c-r, hop·r:hop·(r+1)]
        (chunk c of the full overlap-add signal, hop-sized). Replaces the
        per-tile 7-term frame shift-sum: 4 quarter-width adds build every
        chunk once, analysis frames then *gather* 4 consecutive chunks."""
        for c0, ts in _tiles_of(Tp + 3):
            for ri in range(R):
                acc = fsyn[ri, 3 + c0: 3 + c0 + ts, 0:hop].astype(f32)
                for r in (1, 2, 3):
                    acc = acc + fsyn[ri, 3 + c0 - r: 3 + c0 - r + ts,
                                     hop * r: hop * (r + 1)].astype(f32)
                sig[ri, c0:c0 + ts, :] = acc

    def iteration(it, carry):
        phase_a(int8_fwd)
        build_sig()

        # ---- Edge signal reconstruction (exact wss + reflect) ----
        # sedge[ri] row 0: OLA samples [0, 6·hop) of invwss ⊙ signal (left);
        # row 1: samples [L-6·hop, L), L = hop·(T+3) (right). The OLA values
        # come straight from the sig chunk buffer; only the per-chunk edge
        # 1/window_sumsquare tables are applied here. (NB sig rows beyond the
        # last real frame read zero fsyn rows — pad mag rows synthesize to
        # exactly zero — so chunks T..T+2 are the true signal tail.)
        w_row = wvec[:]
        H = N // 2
        for ri in range(R):
            for m in range(6):
                sedge[ri, 0:1, hop * m: hop * (m + 1)] = (
                    sig[ri, m:m + 1, :].astype(f32) * invw_l[m:m + 1, :])
            for idx in range(6):
                M = T - 3 + idx
                sedge[ri, 1:2, hop * idx: hop * (idx + 1)] = (
                    sig[ri, M:M + 1, :].astype(f32) * invw_r[idx:idx + 1, :])

            sl = sedge[ri, 0:1, :]
            sr = sedge[ri, 1:2, :]
            # 6 corrected analysis frames per row, built piecewise into
            # eana[ri] rows 0..2 = frames 0,1,2; 3..5 = frames T-3,T-2,T-1.
            # librosa reflect-pads by n_fft/2: sig_a[u < N/2] = sigw[N - u]
            eana[ri, 0:1, 0:H] = _rev(sl[:, H + 1: N + 1], H) * w_row[:, 0:H]
            eana[ri, 0:1, H:N] = sl[:, H:N] * w_row[:, H:N]
            eana[ri, 1:2, 0:hop] = (_rev(sl[:, H + 1: H + 1 + hop], hop)
                                    * w_row[:, 0:hop])
            eana[ri, 1:2, hop:N] = sl[:, H: H + 3 * hop] * w_row[:, hop:N]
            eana[ri, 2:3, :] = sl[:, H: H + N] * w_row
            # right edge; reflect: sig_a[u ≥ L-N/2] = sigw[2L - N - 2 - u]
            eana[ri, 3:4, :] = sr[:, 0:N] * w_row
            eana[ri, 4:5, 0:3 * hop] = sr[:, hop:N] * w_row[:, 0:3 * hop]
            eana[ri, 4:5, 3 * hop:N] = (_rev(sr[:, 3 * hop - 1: N - 1], hop)
                                        * w_row[:, 3 * hop:N])
            eana[ri, 5:6, 0:H] = sr[:, 2 * hop:N] * w_row[:, 0:H]
            eana[ri, 5:6, H:N] = _rev(sr[:, H - 1: N - 1], H) * w_row[:, H:N]
        edge_rows = {0: 0, 1: 1, 2: 2, T - 3: 3, T - 2: 4, T - 1: 5}

        # ---- Phase B: reb = stft(sigw); momentum; normalize ----
        for r0, ts in tiles:
            for ri in range(R):
                # analysis frame t = sig chunks [t, t+4) ⊙ w/wss — 4
                # lane-aligned quarter-width copies from the chunk buffer
                # ana dtype follows the consumer: f32 when int8 (quantize +
                # Nyquist sum read f32 — zero cast passes from the f32 sig),
                # bf16 when the forward matmul itself consumes it
                adt = ana.dtype
                for r in range(4):
                    ana[ri, 0:ts, hop * r: hop * (r + 1)] = (
                        sig[ri, r0 + r: r0 + r + ts, :].astype(adt))
                ana[ri, 0:ts, :] = (ana[ri, 0:ts, :]
                                    * (w_row * f32(1.0 / 1.5)).astype(adt))
                for frame, erow in edge_rows.items():
                    if r0 <= frame < r0 + ts:
                        p = frame - r0
                        ana[ri, p:p + 1, :] = eana[ri, erow:erow + 1, :].astype(adt)
                ab = ana[ri, 0:ts, :]
                if int8_fwd:
                    dftc8, dfts8 = extra[0], extra[1]
                    amax = jnp.max(jnp.abs(ab), axis=-1,
                                   keepdims=True) + f32(1e-20)
                    q = jnp.round(ab * (f32(126.5) / amax)).astype(jnp.int8)
                    deq = amax * f32(1.0 / (126.5 * 127.0))
                    rr = jnp.dot(q, dftc8[:],
                                 preferred_element_type=jnp.int32
                                 ).astype(f32) * deq
                    ri_ = jnp.dot(q, dfts8[:],
                                  preferred_element_type=jnp.int32
                                  ).astype(f32) * deq
                else:
                    rr = jnp.dot(ab, dftc[:], preferred_element_type=f32)
                    ri_ = jnp.dot(ab, dfts[:], preferred_element_type=f32)
                # Nyquist bin: fwd column is (-1)^n, sin part identically 0
                rr_n = jnp.sum(ab.astype(f32) * nyq_c[:], axis=1, keepdims=True)

                # momentum + normalize; a/(|a|+1e-16) ≈ a·rsqrt(|a|²+1e-32):
                # identical except at denormal norms (bf16 output anyway).
                # reb carries are f32 scratch — no cast passes on the reload.
                ca = slice(0, Fa)
                tr = rebre[ri, r0:r0 + ts, ca]
                ti = rebim[ri, r0:r0 + ts, ca]
                a_re = rr - alpha * tr
                a_im = ri_ - alpha * ti
                inv = jax.lax.rsqrt(a_re * a_re + a_im * a_im + 1e-32)
                angre_ref[ri, r0:r0 + ts, ca] = (a_re * inv).astype(bf16)
                angim_ref[ri, r0:r0 + ts, ca] = (a_im * inv).astype(bf16)
                rebre[ri, r0:r0 + ts, ca] = rr
                rebim[ri, r0:r0 + ts, ca] = ri_
                # Nyquist column (imag ≡ 0 throughout)
                cn = slice(Fa, F)
                tr_n = rebre[ri, r0:r0 + ts, cn]
                a_re_n = rr_n - alpha * tr_n
                inv_n = jax.lax.rsqrt(a_re_n * a_re_n + 1e-32)
                angre_ref[ri, r0:r0 + ts, cn] = (a_re_n * inv_n).astype(bf16)
                angim_ref[ri, r0:r0 + ts, cn] = jnp.zeros((ts, 1), bf16)
                rebre[ri, r0:r0 + ts, cn] = rr_n
                rebim[ri, r0:r0 + ts, cn] = jnp.zeros((ts, 1), f32)
        return carry

    jax.lax.fori_loop(0, n_iter, iteration, 0)

    # ------------------------------------------------------------------
    # Epilogue: the final istft(mag·ang) — one more synthesis pass, then a
    # chunk-structured overlap-add straight into the audio output.
    # audio[s] = invwss[s + N/2] · Σ_t fsyn[t][s + N/2 − hop·t]; in hop-sized
    # chunks, audio chunk q = Σ_{r=0..3} fsyn[q+2-r][chunk r] (chunk q+2 of
    # the OLA signal; the N/2 crop = 2 hops). Interior invwss is 1/1.5;
    # audio chunk 0 and the last 4 chunks take the true edge tables.
    # ------------------------------------------------------------------
    phase_a(False)
    build_sig()
    inv_interior = f32(1.0 / 1.5)
    for q0, ts in _tiles_of(T - 1):
        for ri in range(R):
            # audio chunk q = OLA chunk q+2 (the istft N/2 crop = 2 hops)
            audio_ref[ri, q0:q0 + ts, :] = (
                sig[ri, q0 + 2: q0 + 2 + ts, :].astype(f32) * inv_interior)
        # edge-chunk corrections: only OLA chunks 2 (audio chunk 0) and T
        # (audio chunk T-2) have window_sumsquare ≠ 1.5 — the wss edge spans
        # 3 hops and the istft crop removes 2 of them at each end.
        for ri in range(R):
            if q0 == 0:
                audio_ref[ri, 0:1, :] = (sig[ri, 2:3, :].astype(f32)
                                         * invw_l[2:3, :])
            if q0 <= T - 2 < q0 + ts:
                audio_ref[ri, T - 2: T - 1, :] = (
                    sig[ri, T: T + 1, :].astype(f32) * invw_r[3:4, :])


def hash_phase_init(seeds: jax.Array, T: int, F: int) -> Tuple[jax.Array, jax.Array]:
    """Plain-jnp mirror of the kernel's deterministic phase init — used by the
    parity tests to feed the XLA Griffin-Lim the same starting angles.

    ``seeds``: (B,) int32 → (ang_re, ang_im), each (B, T, F) bf16.
    """
    seed = seeds.astype(jnp.int32)[:, None, None]               # (B, 1, 1)
    tt = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    kk = jnp.arange(F, dtype=jnp.int32)[None, None, :]
    h = _hash_mix(tt, kk, seed)
    phase = (h & jnp.int32(0xFFFFFF)).astype(jnp.float32) * np.float32(
        2.0 * np.pi / (1 << 24))
    return (jnp.cos(phase).astype(jnp.bfloat16),
            jnp.sin(phase).astype(jnp.bfloat16))


@functools.partial(jax.jit, static_argnames=(
    "n_fft", "hop", "n_iter", "momentum", "interpret", "int8_fwd",
    "init_mode"))
def _fused_gl_phase(mag: jax.Array, seeds: jax.Array, n_fft: int,
                    hop: int, n_iter: int, momentum: float,
                    interpret: bool, int8_fwd: bool,
                    init_mode: str = "random",
                    init_angles: Optional[Tuple[jax.Array, jax.Array]] = None
                    ) -> Tuple[jax.Array, jax.Array]:
    B, T, F = mag.shape
    # pad T to the bf16 sublane tile (16), not a whole TT tile: the kernel
    # loops full TT tiles plus one short remainder tile
    Tp = -(-T // 16) * 16
    # rows per grid step: R=2 was measured *slower* (378.7 vs 371.2 ms at
    # B=128/T=1300 on v5e) — Mosaic already overlaps MXU/VPU within a row,
    # and the doubled VMEM state hurts its pipelining. Keep single-row.
    R = 1
    Bp = -(-B // R) * R
    mag_p = jnp.pad(mag.astype(jnp.bfloat16),
                    ((0, Bp - B), (0, Tp - T), (0, 0)))
    seeds = jnp.pad(seeds, ((0, Bp - B),))
    ext_inputs = ()
    if init_mode == "external":
        assert init_angles is not None
        ext_inputs = tuple(
            jnp.pad(a.astype(jnp.bfloat16), ((0, Bp - B), (0, Tp - T), (0, 0)),
                    constant_values=1.0 if i == 0 else 0.0)
            for i, a in enumerate(init_angles))
    elif init_mode == "spsi":
        # the in-kernel SPSI init reads a dedicated f32 magnitude input so
        # its log-parabola deltas match jaxdsp.gl_spsi_angles bit-for-bit
        # (the main bf16 mag operand would perturb the second differences)
        ext_inputs = (jnp.pad(mag.astype(jnp.float32),
                              ((0, Bp - B), (0, Tp - T), (0, 0))),)
    N = n_fft

    kernel = functools.partial(_gl_kernel, n_fft=N, hop=hop, T=T, Tp=Tp,
                               n_iter=n_iter, momentum=momentum, R=R,
                               int8_fwd=int8_fwd, init_mode=init_mode)
    kw = {}
    if _VMEM is not None and not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024)

    def vspec(block, idx):
        return pl.BlockSpec(block, idx,
                            **({"memory_space": _VMEM} if _VMEM else {}))

    scratches = [
        _scratch((R, Tp + 8, N), jnp.bfloat16),  # fsyn (frame f at row 3+f)
        _scratch((R, Tp, F), jnp.float32),     # reb_prev re (f32: no casts)
        _scratch((R, Tp, F), jnp.float32),     # reb_prev im
        _scratch((N, F - 1), jnp.bfloat16),    # fwd DFT cos (aligned bins)
        _scratch((N, F - 1), jnp.bfloat16),    # fwd DFT -sin
        _scratch((F - 1, N), jnp.bfloat16),    # inv DFT cos (incl. w_k/N)
        _scratch((F - 1, N), jnp.bfloat16),    # inv DFT -sin
        _scratch((1, N), jnp.float32),         # fwd Nyquist column (-1)^n
        _scratch((1, N), jnp.float32),         # inv Nyquist row (-1)^n / N
        _scratch((1, N), jnp.float32),         # hann window
        _scratch((6, hop), jnp.float32),       # invwss left edge
        _scratch((6, hop), jnp.float32),       # invwss right edge
        _scratch((N // 2, N // 2), jnp.float32),  # flip (reversal) matrix
        _scratch((R, TT, N),                   # ana tiles (gathered frames);
                 jnp.float32 if int8_fwd else jnp.bfloat16),  # see kernel note
        _scratch((R, 2, 6 * hop), jnp.float32),  # edge OLA signal (l/r)
        _scratch((R, 8, N), jnp.float32),      # corrected edge ana frames
        _scratch((R, Tp + 4, hop), jnp.float32),  # OLA signal chunks
    ]
    if int8_fwd:
        scratches += [_scratch((N, F - 1), jnp.int8),   # fwd DFT cos int8
                      _scratch((N, F - 1), jnp.int8),   # fwd DFT -sin int8
                      _scratch((F - 1, N), jnp.int8),   # inv DFT cos int8
                      _scratch((F - 1, N), jnp.int8),   # inv DFT -sin int8
                      _scratch((R, Tp, F - 1), jnp.bfloat16),  # qm (hoisted scale·mag·w_k)
                      _scratch((R, Tp, 128), jnp.float32)]     # deq rows

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // R,),
        in_specs=[vspec((R, Tp, F), lambda b, sref: (b, 0, 0))]
        + [vspec((R, Tp, F), lambda b, sref: (b, 0, 0))
           for _ in ext_inputs],
        out_specs=(vspec((R, Tp, F), lambda b, sref: (b, 0, 0)),
                   vspec((R, Tp, F), lambda b, sref: (b, 0, 0)),
                   vspec((R, T - 1, hop), lambda b, sref: (b, 0, 0))),
        scratch_shapes=scratches,
    )
    # NB: the angle outputs are consumed only by the parity tests; the
    # production path uses `audio` alone. Keeping them costs ~0.1% of kernel
    # time in HBM writes — accepted for testability.
    ang_re, ang_im, audio = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((Bp, Tp, F), jnp.bfloat16),
                   jax.ShapeDtypeStruct((Bp, Tp, F), jnp.bfloat16),
                   jax.ShapeDtypeStruct((Bp, T - 1, hop), jnp.float32)),
        interpret=interpret,
        **kw,
    )(seeds, mag_p, *ext_inputs)
    return (ang_re[:B, :T, :], ang_im[:B, :T, :],
            audio[:B].reshape(B, hop * (T - 1)))


def _spsi_angles_kernel(mag_ref, re_ref, im_ref, delta_s, cum_s, *,
                        n_fft: int, hop: int, Tp: int, lock: float):
    """Per-utterance SPSI angle init entirely in VMEM (one grid step = one
    row). Mirrors :func:`spoofsv_tpu.dsp.jaxdsp.gl_spsi_angles`: same f32
    log/parabola/cumsum math; the only numeric deltas vs the XLA angles are
    (a) the cumsum association order (shift doubling here vs XLA's scan) —
    measured ≤ 2e-6 cycles at T=70 — and (b) the bf16 output cast, which
    dominates (≈2e-3 per component; the *phase* agreement after normalizing
    the bf16 pair is ≥ 0.999996 cos Δφ — see
    tests/test_pallas_gl.py::test_spsi_angles_kernel_matches_xla).
    The win over the XLA init is HBM traffic (~6x): the XLA init is
    HBM-bound at bench shapes (~100 ms at B=768/T=1300 on v5e, 75 ms of it
    the (B,T,F) f32 cumsum's log passes), while this kernel reads mag once
    and writes the bf16 angle pair.

    VMEM discipline (the r4 version OOMed at T=1300: 34.2 MB scoped vs the
    16 MB default limit): delta and the cumsum run through explicit scratch
    buffers, and the shift-doubling cumsum is chunked over 128-lane
    frequency blocks (the frame-axis cumsum is per-bin independent) so each
    unrolled doubling step keeps only (Tp, 128) f32 temporaries live rather
    than O(log T) full (Tp, F) arrays. The wrapper also sets the same
    128 MB scoped-vmem limit as the main GL kernel."""
    N = n_fft
    F = N // 2 + 1
    f32 = jnp.float32
    m = mag_ref[0].astype(f32)
    logm = jnp.log(jnp.maximum(m, f32(1e-10)))
    # edge-replicated frequency neighbors (lane-dim shifts via concat; the
    # operands share sublane offset 0, which Mosaic's lane concat requires)
    a = jnp.concatenate([logm[:, :1], logm[:, : F - 1]], axis=1)   # k-1
    c = jnp.concatenate([logm[:, 1:], logm[:, F - 1:]], axis=1)    # k+1
    denom = a - 2.0 * logm + c
    concave = denom < f32(-1e-6)
    delta_s[:] = jnp.clip(
        jnp.where(concave,
                  f32(0.5) * (a - c) / jnp.where(concave, denom, f32(-1.0)),
                  f32(0.0)),
        -0.5, 0.5)
    # inclusive cumsum over frames (sublanes) by shift doubling — log2(Tp)
    # VMEM passes instead of XLA's HBM passes. Chunked over lane blocks to
    # bound live temporaries (per-bin independent along frames).
    FC = 128
    for f0 in range(0, F, FC):
        fw = min(FC, F - f0)
        cum = delta_s[:, f0:f0 + fw]
        s = 1
        while s < Tp:
            cum = cum + jnp.concatenate(
                [jnp.zeros((s, fw), f32), cum[: Tp - s]], axis=0)
            s *= 2
        cum_s[:, f0:f0 + fw] = cum
    delta = delta_s[:]
    cyc = (cum_s[:] - delta) * f32(hop / N)   # exclusive: frame 0 at phase 0
    frac = (cyc - jnp.round(cyc)) * f32(2.0 * np.pi)
    if lock:
        frac = frac + delta * f32(lock * np.pi * (N - 1) / N)
    # advance base φ[t,k] = 2π·hop·k·t/N via exact int mod (advance branch
    # of _gl_kernel / jaxdsp.gl_advance_angles)
    tt_ = jax.lax.broadcasted_iota(jnp.int32, (Tp, F), 0)
    kk_ = jax.lax.broadcasted_iota(jnp.int32, (Tp, F), 1)
    hk = (kk_ * jnp.int32(hop)) % jnp.int32(N)
    phase = ((tt_ * hk) % jnp.int32(N)).astype(f32) * f32(2.0 * np.pi / N)
    b_re, b_im = jnp.cos(phase), jnp.sin(phase)
    c_f, s_f = jnp.cos(frac), jnp.sin(frac)
    re_ref[0] = (b_re * c_f - b_im * s_f).astype(jnp.bfloat16)
    im_ref[0] = (b_re * s_f + b_im * c_f).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "lock",
                                             "interpret"))
def gl_spsi_angles_fused(mag: jax.Array, n_fft: int, hop_length: int,
                         lock: float = 1.0,
                         interpret: Optional[bool] = None
                         ) -> Tuple[jax.Array, jax.Array]:
    """Pallas version of :func:`spoofsv_tpu.dsp.jaxdsp.gl_spsi_angles`
    (bf16 outputs — what the fused GL kernel consumes anyway).

    ``mag``: ``(B, T, F)`` f32 → ``(cos φ, sin φ)`` bf16, same shape."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, F = mag.shape
    assert F == n_fft // 2 + 1, (F, n_fft)
    Tp = -(-T // 16) * 16
    mag_p = jnp.pad(mag.astype(jnp.float32), ((0, 0), (0, Tp - T), (0, 0)))

    def vspec(block, idx):
        return pl.BlockSpec(block, idx,
                            **({"memory_space": _VMEM}
                               if (_VMEM and not interpret) else {}))

    kernel = functools.partial(_spsi_angles_kernel, n_fft=n_fft,
                               hop=hop_length, Tp=Tp, lock=lock)
    kw = {}
    if _VMEM is not None and not interpret:
        # same scoped-vmem headroom as _fused_gl_phase: the default 16 MB
        # limit OOMs at the production bench shape (T=1300 → 34.2 MB in r4)
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024)
    re, im = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[vspec((1, Tp, F), lambda b: (b, 0, 0))],
        out_specs=(vspec((1, Tp, F), lambda b: (b, 0, 0)),
                   vspec((1, Tp, F), lambda b: (b, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((B, Tp, F), jnp.bfloat16),
                   jax.ShapeDtypeStruct((B, Tp, F), jnp.bfloat16)),
        scratch_shapes=[_scratch((Tp, F), jnp.float32),    # delta
                        _scratch((Tp, F), jnp.float32)],   # cumsum
        interpret=interpret,
        **kw,
    )(mag_p)
    return re[:, :T, :], im[:, :T, :]


def gl_seeds(key: jax.Array, b: int) -> jax.Array:
    """The (B,) int32 phase-init seeds ``griffin_lim_fused`` derives from a
    key — exposed so data-parallel callers (shard_map) can draw them
    globally and shard them, keeping sharded output identical to
    single-device."""
    return jax.random.randint(key, (b,), 0, np.iinfo(np.int32).max,
                              dtype=jnp.int32)


def griffin_lim_fused(mag: jax.Array, key: jax.Array, n_fft: int,
                      hop_length: int, win_length: int, n_iter: int = 64,
                      momentum: float = 0.99,
                      use_matmul: Optional[bool] = None,
                      precision=jax.lax.Precision.DEFAULT,
                      interpret: Optional[bool] = None,
                      int8_fwd: bool = False,
                      seeds: Optional[jax.Array] = None,
                      init_mode: str = "random") -> jax.Array:
    """Drop-in for :func:`spoofsv_tpu.dsp.jaxdsp.griffin_lim` running the
    64-iteration loop in a single VMEM-resident Pallas kernel.

    Falls back to the XLA implementation for unsupported geometries
    (hop ≠ n_fft/4, short spectrograms).

    ``int8_fwd`` runs all four per-iteration DFT matmuls in int8 (2x MXU
    rate on v5e; 332 bf16 -> 229 ms int8 at B=128/T=1300/64 iters) with a
    hoisted per-row scale on the loop-invariant magnitudes, a dynamic
    per-row scale on the frames, and 127-scaled DFT matrices. Only the
    *phase* of the result survives GL's normalize step, so the quantization
    is iteratively corrected: measured spectral convergence 0.0594 vs
    0.0586 (bf16) vs 0.0588 (f32 XLA) at bench shapes. Individual waveforms
    differ sample-level from the bf16 path (GL solutions are non-unique) —
    the production vocoder enables it via ``Config.tpu.griffin_lim_int8``.
    """
    from spoofsv_tpu.dsp import jaxdsp

    B, T, F = mag.shape
    if pltpu is None or not _supported(n_fft, hop_length, win_length, T):
        ia = None
        if init_mode == "advance":
            a_re, a_im = jaxdsp.gl_advance_angles(T, F, n_fft, hop_length)
            ia = (jnp.broadcast_to(a_re, mag.shape),
                  jnp.broadcast_to(a_im, mag.shape))
        elif init_mode == "spsi":
            ia = jaxdsp.gl_spsi_angles(mag, n_fft, hop_length)
        return jaxdsp.griffin_lim(mag, key, n_fft, hop_length, win_length,
                                  n_iter=n_iter, momentum=momentum,
                                  use_matmul=use_matmul, precision=precision,
                                  init_angles=ia)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    del use_matmul  # only the XLA fallback path distinguishes backends
    if seeds is None:
        seeds = gl_seeds(key, B)
    ia = None
    # init_mode == "spsi" is computed INSIDE _gl_kernel since r5 (zero
    # extra dispatches / HBM round-trips of the angle pair; the standalone
    # gl_spsi_angles_fused kernel remains for external callers and the
    # angle-level parity tests). The init branch reads its own f32 mag
    # input, so the angle math is identical to the standalone kernel.
    _, _, audio = _fused_gl_phase(mag, seeds,
                                  n_fft, hop_length, n_iter, momentum,
                                  bool(interpret), bool(int8_fwd),
                                  init_mode=init_mode, init_angles=ia)
    return audio
