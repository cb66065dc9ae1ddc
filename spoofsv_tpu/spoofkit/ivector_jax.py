"""XLA-accelerated UBM + i-vector EM — the Kaldi-replacement hot path on TPU.

The native C++ library (``native/src/{gmm,ivector}.cc``) implements UBM and
total-variability EM as scalar loops on one host core. At the reference's
Kaldi configuration (1024 Gauss / 400-dim i-vectors —
``kaldi_ivectors/run.sh:105-129``) those sweeps are almost entirely dense
matmul work:

* diag-UBM posteriors:  ``gconst + X @ (mu/var)ᵀ − ½ X² @ (1/var)ᵀ``  — two
  (frames × D)·(D × C) GEMMs per EM sweep;
* full-covariance quadratic forms:  ``⟨x xᵀ, Σ_c⁻¹⟩`` — one
  (frames × D²)·(D² × C) GEMM;
* Baum-Welch stats: ``postsᵀ @ X``;
* T-matrix E-step: batched (R×R) Gram assembly + Cholesky solves;
  M-step: batched per-component (R×R) solves.

This module runs them as jitted einsums so the MXU (or the vectorized XLA CPU
backend) does the work; the C++ path remains the bit-for-bit reference
implementation used by the parity tests and environments without jax.

Numerics: accumulation is f32 with ``precision='highest'`` on the big
contractions (Kaldi's own BaseFloat is float32); every floor/threshold of the
C++ implementation is mirrored exactly (posterior cutoffs 1e-8 / 1e-6,
variance floors 1e-6 / 1e-4, occupancy floor 1e-10). Component seeding RNG
differs from the C++ ``std::mt19937_64`` (numpy here) — EM results are
therefore statistically, not bitwise, equivalent; ``tests/test_ivector_jax.py``
validates stats/extraction parity exactly and EM quality at the metric level.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

_CHUNK = 8192          # frames per scan step in the UBM sweeps
_STATS_BATCH = 32      # utterances per batched Baum-Welch stats call


def _jnp():
    import jax  # noqa: F401
    import jax.numpy as jnp
    return jnp


# ----------------------------------------------------------------------
# Diagonal UBM
# ----------------------------------------------------------------------

def _chunk_frames(frames: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Pad to a multiple of _CHUNK → ((K, CH, D) frames, (K, CH) weights)."""
    n, d = frames.shape
    k = -(-n // _CHUNK)
    pad = k * _CHUNK - n
    f = np.pad(frames.astype(np.float32), ((0, pad), (0, 0)))
    w = np.pad(np.ones((n,), np.float32), ((0, pad),))
    return f.reshape(k, _CHUNK, d), w.reshape(k, _CHUNK)


def _repair_spd(covs: np.ndarray, max_cond: float = 1e6) -> np.ndarray:
    """Floor each (D, D) slice's eigenvalues so its condition number stays
    within what f32 Cholesky handles with margin (~1e6).

    Low-occupancy components can re-estimate to (near-)singular covariances
    — the f64 C++ shrugs (its lazy jitter ladder, common.h:95-127, plus 15
    decimal digits of headroom), but a 1e10-conditioned slice NaNs the whole
    jitted f32 sweep. The floor only perturbs such degenerate components
    (healthy speech covariances sit far below the bound), playing the same
    regularizing role as the C++ ladder."""
    out = np.asarray(covs, np.float64).copy()
    for c in range(out.shape[0]):
        w = np.linalg.eigvalsh(out[c])
        floor = max(w[-1], 1e-8) / max_cond
        if w[0] < floor:
            out[c][np.diag_indices(out.shape[1])] += floor - min(w[0], 0.0)
    return out


def _check_finite(name: str, *arrays: np.ndarray) -> None:
    for a in arrays:
        if not np.isfinite(a).all():
            raise RuntimeError(
                f"ivector_jax: non-finite values in {name} — numerical "
                f"failure in the XLA EM path (rerun with backend='native' "
                f"and report)")


@functools.partial(
    __import__("jax").jit, static_argnames=("n_frames",), donate_argnums=())
def _diag_em_sweep(fchunks, wchunks, weights, means, vars_, *, n_frames: int):
    """One EM sweep over all frames (gmm.cc ``em_iterations`` body).

    Returns (new_weights, new_means, new_vars, total_loglike).
    """
    import jax
    import jax.numpy as jnp

    f32 = jnp.float32
    v = jnp.maximum(vars_, 1e-6)                    # scorer floor (gmm.cc:30)
    inv_v = 1.0 / v
    miv = means * inv_v
    gconst = (jnp.log(jnp.maximum(weights, 1e-20))
              - 0.5 * means.shape[1] * np.log(2.0 * np.pi)
              - 0.5 * jnp.sum(jnp.log(v), axis=1)
              - 0.5 * jnp.sum(means * miv, axis=1))

    def body(carry, xs):
        occ, am, av, ll_tot = carry
        x, w = xs                                   # (CH, D), (CH,)
        ll = (gconst[None, :]
              + jnp.einsum("td,cd->tc", x, miv, precision="highest")
              - 0.5 * jnp.einsum("td,cd->tc", x * x, inv_v,
                                 precision="highest"))
        lse = jax.scipy.special.logsumexp(ll, axis=1)
        post = jnp.exp(ll - lse[:, None])
        post = jnp.where(post < 1e-8, 0.0, post)    # gmm.cc:98 skip
        post = post * w[:, None]                    # zero pad frames
        occ = occ + jnp.sum(post, axis=0)
        am = am + jnp.einsum("tc,td->cd", post, x, precision="highest")
        av = av + jnp.einsum("tc,td->cd", post, x * x, precision="highest")
        ll_tot = ll_tot + jnp.sum(lse * w)
        return (occ, am, av, ll_tot), None

    c, d = means.shape
    init = (jnp.zeros((c,), f32), jnp.zeros((c, d), f32),
            jnp.zeros((c, d), f32), jnp.asarray(0.0, f32))
    (occ, am, av, ll_tot), _ = jax.lax.scan(body, init, (fchunks, wchunks))

    o = jnp.maximum(occ, 1e-10)
    new_w = o / n_frames
    new_m = am / o[:, None]
    new_v = jnp.maximum(av / o[:, None] - new_m * new_m, 1e-4)
    return new_w, new_m, new_v, ll_tot


def train_diag_ubm(frames: np.ndarray, num_comp: int, iters: int = 4,
                   seed: int = 0, verbose: bool = False
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Binary-split + EM diag-UBM training (gmm.cc ``train_diag_ubm``) with
    the EM sweeps on the accelerator. Returns (weights, means, vars).

    The split schedule, per-stage EM counts, k-means++-style farthest-of-8
    seeding of new components, and every floor mirror the C++; only the
    seeding RNG differs (numpy vs std::mt19937_64).
    """
    import jax.numpy as jnp

    # Work in globally-centered coordinates (EM is translation-equivariant;
    # exact). Raw Kaldi-scale MFCCs have |x| up to ~200, and f32 expansions
    # like E[x²]−μ² / xᵀΣ⁻¹x−2xᵀΣ⁻¹μ lose 3-4 digits to cancellation there.
    shift = np.asarray(frames, np.float64).mean(axis=0)
    frames = np.ascontiguousarray(np.asarray(frames, np.float64) - shift,
                                  np.float32)
    n, d = frames.shape
    rng = np.random.default_rng(seed)
    fchunks, wchunks = _chunk_frames(frames)
    fchunks = jnp.asarray(fchunks)
    wchunks = jnp.asarray(wchunks)

    mean0 = frames.mean(axis=0) if n else np.zeros((d,), np.float32)
    var0 = (np.maximum(np.mean((frames - mean0) ** 2, axis=0), 1e-4)
            if n else np.full((d,), 1e-4, np.float32))
    w = np.ones((1,), np.float32)
    m = mean0[None, :].astype(np.float32)
    v = var0[None, :].astype(np.float32)

    def em(w, m, v, k):
        for it in range(k):
            wj, mj, vj, ll = _diag_em_sweep(
                fchunks, wchunks, jnp.asarray(w), jnp.asarray(m),
                jnp.asarray(v), n_frames=n)
            w, m, v = np.asarray(wj), np.asarray(mj), np.asarray(vj)
            if verbose:
                print(f"[diag-ubm/jax] comps={len(w)} iter={it} "
                      f"avg loglike {float(ll) / max(n, 1):.4f}")
        return w, m, v

    while len(w) < num_comp:
        target = min(num_comp, len(w) * 2)
        cur = len(w)
        ws = np.zeros((target,), np.float32)
        ms = np.zeros((target, d), np.float32)
        vs = np.zeros((target, d), np.float32)
        denom = (target + cur - 1) // cur            # gmm.cc:145
        for c in range(target):
            src = c % cur
            ws[c] = w[src] / denom
            if c >= cur:
                # farthest-of-8 seeding among random frames (gmm.cc:150-159)
                cand = rng.integers(0, n, size=9)
                d2 = ((frames[cand][:, None, :] - ms[None, :c, :]) ** 2
                      ).sum(-1).min(axis=1) if c else np.full(9, np.inf)
                ms[c] = frames[cand[int(np.argmax(d2))]]
                vs[c] = v[src]
            else:
                ms[c] = m[src]
                vs[c] = v[src]
        w, m, v = ws / ws.sum(), ms, vs
        w, m, v = em(w, m, v, 2)
    w, m, v = em(w, m, v, iters)
    w, m, v = (w.astype(np.float64), m.astype(np.float64) + shift,
               v.astype(np.float64))
    _check_finite("diag UBM", w, m, v)
    return w, m, v


# ----------------------------------------------------------------------
# Full-covariance UBM
# ----------------------------------------------------------------------

def _full_scorer_tables(jnp, weights, means, covs):
    """(logconst (C,), A_flat (C, D²), b (C, D), k (C,)) for
    ll = logconst + x@bᵀ − ½ (x⊗x)@A_flatᵀ − ½ k  …with b = Σ⁻¹μ folded."""
    import jax

    chol = jax.vmap(jnp.linalg.cholesky)(covs)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    eye = jnp.eye(covs.shape[-1], dtype=covs.dtype)
    inv = jax.vmap(lambda L: jax.scipy.linalg.cho_solve((L, True), eye))(chol)
    b = jnp.einsum("cde,ce->cd", inv, means, precision="highest")
    k = jnp.einsum("cd,cd->c", means, b, precision="highest")
    d = means.shape[1]
    logconst = (jnp.log(jnp.maximum(weights, 1e-20))
                - 0.5 * (d * np.log(2.0 * np.pi) + logdet))
    return logconst, inv.reshape(inv.shape[0], d * d), b, k, inv


@functools.partial(__import__("jax").jit, static_argnames=("n_frames",))
def _full_em_sweep(fchunks, wchunks, weights, means, covs, *, n_frames: int):
    """One full-covariance EM sweep (gmm.cc ``train_full_ubm`` loop body)."""
    import jax
    import jax.numpy as jnp

    f32 = jnp.float32
    c_, d = means.shape
    logconst, a_flat, bvec, kvec, _ = _full_scorer_tables(
        jnp, weights, means, covs)

    def body(carry, xs):
        occ, am, as_, = carry
        x, w = xs
        p = jnp.einsum("td,te->tde", x, x).reshape(x.shape[0], d * d)
        q = (jnp.einsum("tf,cf->tc", p, a_flat, precision="highest")
             - 2.0 * jnp.einsum("td,cd->tc", x, bvec, precision="highest")
             + kvec[None, :])
        ll = logconst[None, :] - 0.5 * q
        lse = jax.scipy.special.logsumexp(ll, axis=1)
        post = jnp.exp(ll - lse[:, None])
        post = jnp.where(post < 1e-8, 0.0, post)    # gmm.cc:241 skip
        post = post * w[:, None]
        occ = occ + jnp.sum(post, axis=0)
        am = am + jnp.einsum("tc,td->cd", post, x, precision="highest")
        as_ = as_ + jnp.einsum("tc,tf->cf", post, p, precision="highest")
        return (occ, am, as_), None

    init = (jnp.zeros((c_,), f32), jnp.zeros((c_, d), f32),
            jnp.zeros((c_, d * d), f32))
    (occ, am, as_), _ = jax.lax.scan(body, init, (fchunks, wchunks))

    o = jnp.maximum(occ, 1e-10)
    new_w = o / jnp.sum(o)                           # gmm.cc:261
    new_m = am / o[:, None]
    s = as_.reshape(c_, d, d) / o[:, None, None]
    s = s - jnp.einsum("cd,ce->cde", new_m, new_m)
    diag_floor = jnp.maximum(jnp.diagonal(s, axis1=-2, axis2=-1), 1e-4)
    s = s + (diag_floor - jnp.diagonal(s, axis1=-2, axis2=-1)
             )[:, :, None] * jnp.eye(d, dtype=f32)[None]
    return new_w, new_m, s


def train_full_ubm(weights: np.ndarray, means: np.ndarray, vars_: np.ndarray,
                   frames: np.ndarray, iters: int = 3, verbose: bool = False
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full-covariance re-estimation from a diag UBM (gmm.cc
    ``train_full_ubm``). Returns (weights, means, covs)."""
    import jax.numpy as jnp

    # Centered coordinates + per-sweep SPD repair (see train_diag_ubm and
    # _repair_spd — the C++ handles indefinite accumulators via its lazy
    # jitter ladder, gmm.cc:218/common.h:95-127).
    shift = np.asarray(frames, np.float64).mean(axis=0)
    frames = np.ascontiguousarray(np.asarray(frames, np.float64) - shift,
                                  np.float32)
    fchunks, wchunks = _chunk_frames(frames)
    fchunks = jnp.asarray(fchunks)
    wchunks = jnp.asarray(wchunks)
    c, d = means.shape
    covs = np.zeros((c, d, d), np.float64)
    covs[:, np.arange(d), np.arange(d)] = vars_
    w = np.asarray(weights, np.float64)
    m = np.asarray(means, np.float64) - shift
    s = covs
    for it in range(iters):
        s = _repair_spd(s)
        wj, mj, sj = _full_em_sweep(fchunks, wchunks,
                                    jnp.asarray(w, jnp.float32),
                                    jnp.asarray(m, jnp.float32),
                                    jnp.asarray(s, jnp.float32),
                                    n_frames=len(frames))
        w, m, s = (np.asarray(wj, np.float64), np.asarray(mj, np.float64),
                   np.asarray(sj, np.float64))
        if verbose:
            print(f"[full-ubm/jax] iter {it} done")
    s = _repair_spd(s)
    w, m = w, m + shift
    _check_finite("full UBM", w, m, s)
    return w, m, s


# ----------------------------------------------------------------------
# Baum-Welch stats (diag + full), batched over utterances
# ----------------------------------------------------------------------

@functools.partial(__import__("jax").jit)
def _stats_diag_batch(feats, mask, weights, means, vars_):
    import jax
    import jax.numpy as jnp

    v = jnp.maximum(vars_, 1e-6)
    inv_v = 1.0 / v
    miv = means * inv_v
    gconst = (jnp.log(jnp.maximum(weights, 1e-20))
              - 0.5 * means.shape[1] * np.log(2.0 * np.pi)
              - 0.5 * jnp.sum(jnp.log(v), axis=1)
              - 0.5 * jnp.sum(means * miv, axis=1))
    ll = (gconst[None, None, :]
          + jnp.einsum("utd,cd->utc", feats, miv, precision="highest")
          - 0.5 * jnp.einsum("utd,cd->utc", feats * feats, inv_v,
                             precision="highest"))
    lse = jax.scipy.special.logsumexp(ll, axis=2)
    post = jnp.exp(ll - lse[..., None])
    post = jnp.where(post < 1e-6, 0.0, post)        # gmm.cc:330 skip
    post = post * mask[..., None]
    n = jnp.sum(post, axis=1)
    f = jnp.einsum("utc,utd->ucd", post, feats, precision="highest")
    return n, f


@functools.partial(__import__("jax").jit)
def _stats_full_batch(feats, mask, weights, means, covs):
    import jax
    import jax.numpy as jnp

    u, t, d = feats.shape
    logconst, a_flat, bvec, kvec, _ = _full_scorer_tables(
        jnp, weights, means, covs)
    p = jnp.einsum("utd,ute->utde", feats, feats).reshape(u, t, d * d)
    q = (jnp.einsum("utf,cf->utc", p, a_flat, precision="highest")
         - 2.0 * jnp.einsum("utd,cd->utc", feats, bvec, precision="highest")
         + kvec[None, None, :])
    ll = logconst[None, None, :] - 0.5 * q
    lse = jax.scipy.special.logsumexp(ll, axis=2)
    post = jnp.exp(ll - lse[..., None])
    post = jnp.where(post < 1e-6, 0.0, post)        # gmm.cc:310 skip
    post = post * mask[..., None]
    n = jnp.sum(post, axis=1)
    f = jnp.einsum("utc,utd->ucd", post, feats, precision="highest")
    return n, f


def _batched_stats(feats_list: Sequence[np.ndarray], kernel, weights, means,
                   cov_like) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Pad/bucket utterances and run the batched stats kernel. Frame counts
    are padded to the next power of two (min 256) to bound recompiles.

    Runs in UBM-mean-centered coordinates (exact — log-likelihoods and
    posteriors are shift-invariant when frames and means shift together) and
    un-shifts the first-order stats on the way out: F = F_centered + N·shift.
    """
    import jax.numpy as jnp

    means = np.asarray(means, np.float64)
    shift = means.mean(axis=0)
    order = sorted(range(len(feats_list)), key=lambda i: len(feats_list[i]))
    out: List[Optional[Tuple[np.ndarray, np.ndarray]]] = [None] * len(feats_list)
    params = (jnp.asarray(np.asarray(weights, np.float32)),
              jnp.asarray((means - shift).astype(np.float32)),
              jnp.asarray(np.asarray(cov_like, np.float32)))
    for start in range(0, len(order), _STATS_BATCH):
        idx = order[start:start + _STATS_BATCH]
        tmax = max(len(feats_list[i]) for i in idx)
        tpad = max(256, 1 << (int(tmax - 1).bit_length()))
        fb = np.zeros((_STATS_BATCH, tpad, means.shape[1]), np.float32)
        mb = np.zeros((_STATS_BATCH, tpad), np.float32)
        for j, i in enumerate(idx):
            fi = feats_list[i]
            fb[j, :len(fi)] = np.asarray(fi, np.float64) - shift
            mb[j, :len(fi)] = 1.0
        n, f = kernel(jnp.asarray(fb), jnp.asarray(mb), *params)
        n = np.asarray(n, np.float64)
        f = np.asarray(f, np.float64) + n[:, :, None] * shift[None, None, :]
        for j, i in enumerate(idx):
            out[i] = (n[j], f[j])
    return out  # type: ignore[return-value]


def acc_stats_diag_batch(weights, means, vars_, feats_list):
    """Batched diag-UBM Baum-Welch stats — list of (N_c, F_c) per utterance
    (gmm.cc ``accumulate_stats``)."""
    return _batched_stats(feats_list, _stats_diag_batch, weights, means, vars_)


def acc_stats_full_batch(weights, means, covs, feats_list):
    """Batched full-UBM Baum-Welch stats (gmm.cc ``accumulate_stats_full``).
    Covariances are SPD-repaired for the f32 in-kernel Cholesky."""
    return _batched_stats(feats_list, _stats_full_batch, weights, means,
                          _repair_spd(covs))


# ----------------------------------------------------------------------
# T-matrix (total variability) EM + extraction
# ----------------------------------------------------------------------

def _precision_tables(jnp, t_mat, precision):
    """SinvT (C,D,R) and Gram G = T_cᵀ Σ_c⁻¹ T_c (C,R,R) from either a
    diagonal precision (C,D) or full inverse covariances (C,D,D)
    (ivector.cc ``IvectorExtractorFull::refresh``)."""
    if precision.ndim == 2:
        sinv_t = precision[:, :, None] * t_mat
    else:
        sinv_t = jnp.einsum("cab,cbr->car", precision, t_mat,
                            precision="highest")
    g = jnp.einsum("cdr,cds->crs", t_mat, sinv_t, precision="highest")
    return sinv_t, g


@functools.partial(__import__("jax").jit)
def _estep_posteriors(t_mat, precision, all_n, fres):
    """Batched posterior of w per utterance: (w_mean (U,R), Linv (U,R,R)).

    Mirrors ``ivector_posterior_full`` (ivector.cc:167-193): components with
    N_c < 1e-8 are skipped from both the precision and the rhs. ``fres`` is
    the centered first-order stat F_c − N_c·μ_c, computed on the host in f64
    (the raw F is O(N·|x|) while the residual is O(N·σ) — subtracting in f32
    would lose several digits).
    """
    import jax
    import jax.numpy as jnp

    r = t_mat.shape[2]
    sinv_t, g = _precision_tables(jnp, t_mat, precision)
    nm = jnp.where(all_n < 1e-8, 0.0, all_n)                    # (U, C)
    fres = jnp.where((all_n < 1e-8)[:, :, None], 0.0, fres)
    lmat = (jnp.eye(r, dtype=t_mat.dtype)[None]
            + jnp.einsum("uc,crs->urs", nm, g, precision="highest"))
    rhs = jnp.einsum("cdr,ucd->ur", sinv_t, fres, precision="highest")
    # Jacobi-equilibrated Cholesky: degenerate UBM components can put ~1e10
    # entries into Σ⁻¹ (the f64 C++ shrugs; a raw f32 factorization of the
    # resulting ~1e13-condition L loses PD and NaNs). Scaling L to unit
    # diagonal first — exact in exact arithmetic — removes the row/column
    # scale disparity that causes it.
    s = jax.lax.rsqrt(jnp.diagonal(lmat, axis1=-2, axis2=-1))   # (U, R)
    lmat_s = lmat * s[:, :, None] * s[:, None, :]
    chol = jax.vmap(jnp.linalg.cholesky)(lmat_s)
    w_mean = s * jax.vmap(lambda L, b: jax.scipy.linalg.cho_solve((L, True), b)
                          )(chol, rhs * s)
    eye = jnp.eye(r, dtype=t_mat.dtype)
    linv = jax.vmap(lambda L: jax.scipy.linalg.cho_solve((L, True), eye)
                    )(chol) * s[:, :, None] * s[:, None, :]
    return w_mean, linv, fres, nm


@functools.partial(__import__("jax").jit)
def _em_accumulate_and_update(t_mat, precision, all_n, fres):
    """One full T-matrix EM iteration (E over all utterances + M-step),
    mirroring ivector.cc ``train_ivector_extractor_full``'s loop body."""
    import jax
    import jax.numpy as jnp

    w_mean, linv, fres, nm = _estep_posteriors(t_mat, precision, all_n, fres)
    eww = linv + jnp.einsum("ui,uj->uij", w_mean, w_mean)
    a = jnp.einsum("uc,uij->cij", nm, eww, precision="highest")  # (C, R, R)
    b = jnp.einsum("ucd,ui->cdi", fres, w_mean, precision="highest")
    # M-step: T_c = B_c A_c⁻¹ (ivector.cc:243-252). A_c is PSD; the tiny
    # ridge matches the C++ chol_solve jitter ladder's role for empty
    # components (common.h:95-101) without branching. Same Jacobi
    # equilibration as the E-step (A⁻¹ = S·As⁻¹·S with S = diag(A)^-½).
    r = t_mat.shape[2]
    a = a + 1e-8 * jnp.eye(r, dtype=t_mat.dtype)[None]
    sa = jax.lax.rsqrt(jnp.diagonal(a, axis1=-2, axis2=-1))     # (C, R)
    a_s = a * sa[:, :, None] * sa[:, None, :]
    chol = jax.vmap(jnp.linalg.cholesky)(a_s)
    t_new = jax.vmap(lambda L, bc, sc: (
        jax.scipy.linalg.cho_solve((L, True), bc.T * sc[:, None]) * sc[:, None]
    ).T)(chol, b, sa)
    return t_new


def train_extractor(ubm_means: np.ndarray, precision: np.ndarray,
                    all_n: np.ndarray, all_f: np.ndarray, ivec_dim: int,
                    iters: int = 5, seed: int = 0, verbose: bool = False
                    ) -> np.ndarray:
    """EM-train the total-variability matrix T (C, D, R) on the accelerator.

    ``precision``: (C, D) diagonal precisions (ivector.cc
    ``train_ivector_extractor``) or (C, D, D) full inverse covariances
    (``train_ivector_extractor_full``). Init mirrors the C++
    ``0.1·σ·gauss`` draw with numpy RNG.
    """
    import jax.numpy as jnp

    c, d = ubm_means.shape
    rng = np.random.default_rng(seed)
    if precision.ndim == 2:
        sigma = np.sqrt(np.maximum(1.0 / np.maximum(precision, 1e-8), 1e-6))
    else:
        diag = np.diagonal(precision, axis1=-2, axis2=-1)
        sigma = np.sqrt(np.maximum(1.0 / np.maximum(diag, 1e-8), 1e-6))
    t = (0.1 * sigma[:, :, None]
         * rng.standard_normal((c, d, ivec_dim))).astype(np.float32)

    fres = _host_fres(ubm_means, all_n, all_f)
    tj = jnp.asarray(t)
    pj = jnp.asarray(np.asarray(precision, np.float32))
    nj = jnp.asarray(np.asarray(all_n, np.float32))
    fj = jnp.asarray(fres)
    for it in range(iters):
        tj = _em_accumulate_and_update(tj, pj, nj, fj)
        if verbose:
            print(f"[ivector/jax] EM iter {it + 1}/{iters} done")
    t_out = np.asarray(tj, np.float64)
    _check_finite("T matrix", t_out)
    return t_out


def _host_fres(ubm_means, all_n, all_f) -> np.ndarray:
    """Centered first-order stats F_c − N_c μ_c in f64 on host → f32."""
    fres = (np.asarray(all_f, np.float64)
            - np.asarray(all_n, np.float64)[:, :, None]
            * np.asarray(ubm_means, np.float64)[None])
    return fres.astype(np.float32)


def extract_ivectors(t_mat: np.ndarray, precision: np.ndarray,
                     ubm_means: np.ndarray, all_n: np.ndarray,
                     all_f: np.ndarray) -> np.ndarray:
    """Batched i-vector posterior means (U, R) — the E-step mean alone
    (ivector.cc ``extract_ivector`` / ``extract_ivector_full``)."""
    import jax.numpy as jnp

    w_mean, _, _, _ = _estep_posteriors(
        jnp.asarray(np.asarray(t_mat, np.float32)),
        jnp.asarray(np.asarray(precision, np.float32)),
        jnp.asarray(np.asarray(all_n, np.float32)),
        jnp.asarray(_host_fres(ubm_means, all_n, all_f)))
    # NB: rows can in principle still come out non-finite for pathological
    # stats; callers (extract_batch) re-solve those rows with the f64 native
    # path rather than failing the whole batch.
    return np.asarray(w_mean, np.float64)
