"""i-vector + PLDA speaker-verification pipeline (native C++ backend).

Python orchestration of ``libspoofkit`` (``spoofsv_tpu/native``) that replaces
the reference's external-Kaldi driver (``kaldi_ivectors/run.sh``): MFCC +
energy VAD + sliding CMVN → diag UBM → i-vector extractor (T-matrix EM) →
PLDA → trial scoring → EER and spoof rate. Stage structure mirrors run.sh:

  1. feature extraction over the staged ``ivector_data`` wavs (:92-103);
  2. UBM / extractor / PLDA training on the train speakers (:105-129);
  3. enroll/eval split (first ``enroll_num`` utts enroll — run.sh:131-139 via
     local/split_data_enroll_eval.py) and all-vs-all trials;
  4. PLDA scoring + EER on the mixed set, then the no-spoof copy for the clean
     threshold, then spoof rate at that threshold
     (:141-218 + ivector_spoofrate.py).
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from spoofsv_tpu.config import Config
from spoofsv_tpu.dsp import host as dsp_host

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB = None
_HANDLE_LOCK = threading.Lock()  # guards lazy native-handle creation

c_double_p = ctypes.POINTER(ctypes.c_double)
c_float_p = ctypes.POINTER(ctypes.c_float)


def _load_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_NATIVE_DIR, "libspoofkit.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(so)
    lib.sk_mfcc_new.restype = ctypes.c_void_p
    lib.sk_mfcc_new.argtypes = [ctypes.c_int] * 3
    lib.sk_mfcc_free.argtypes = [ctypes.c_void_p]
    lib.sk_mfcc_num_frames.restype = ctypes.c_int
    lib.sk_mfcc_num_frames.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sk_mfcc_compute.argtypes = [ctypes.c_void_p, c_float_p, ctypes.c_int,
                                    c_double_p, c_double_p]
    lib.sk_energy_vad.argtypes = [c_double_p, ctypes.c_int, ctypes.c_double,
                                  ctypes.c_double, ctypes.c_int,
                                  ctypes.c_double,
                                  ctypes.POINTER(ctypes.c_uint8)]
    lib.sk_cmvn_sliding.argtypes = [c_double_p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int]
    lib.sk_add_deltas.argtypes = [c_double_p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int, c_double_p]
    c_int16_p = ctypes.POINTER(ctypes.c_int16)
    c_uint8_p = ctypes.POINTER(ctypes.c_uint8)
    lib.sk_vad_new.restype = ctypes.c_void_p
    lib.sk_vad_new.argtypes = [ctypes.c_int]
    lib.sk_vad_free.argtypes = [ctypes.c_void_p]
    lib.sk_vad_process.restype = ctypes.c_int
    lib.sk_vad_process.argtypes = [ctypes.c_void_p, c_int16_p, ctypes.c_int,
                                   ctypes.c_int]
    lib.sk_vad_frames.restype = ctypes.c_int
    lib.sk_vad_frames.argtypes = [ctypes.c_int, c_int16_p, ctypes.c_int64,
                                  ctypes.c_int, ctypes.c_int, c_uint8_p]
    lib.sk_vad_features.restype = ctypes.c_int
    lib.sk_vad_features.argtypes = [c_int16_p, ctypes.c_int, c_int16_p]
    lib.sk_train_diag_ubm.restype = ctypes.c_void_p
    lib.sk_train_diag_ubm.argtypes = [c_double_p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_uint64, ctypes.c_int]
    lib.sk_diag_ubm_get.argtypes = [ctypes.c_void_p] + [c_double_p] * 3
    lib.sk_diag_ubm_from.restype = ctypes.c_void_p
    lib.sk_diag_ubm_from.argtypes = [c_double_p] * 3 + [ctypes.c_int] * 2
    lib.sk_diag_ubm_free.argtypes = [ctypes.c_void_p]
    lib.sk_acc_stats.argtypes = [ctypes.c_void_p, c_double_p, ctypes.c_int,
                                 ctypes.c_int, c_double_p, c_double_p]
    lib.sk_train_full_ubm.restype = ctypes.c_void_p
    lib.sk_train_full_ubm.argtypes = [ctypes.c_void_p, c_double_p, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.sk_full_ubm_get.argtypes = [ctypes.c_void_p] + [c_double_p] * 3
    lib.sk_full_ubm_from.restype = ctypes.c_void_p
    lib.sk_full_ubm_from.argtypes = [c_double_p] * 3 + [ctypes.c_int] * 2
    lib.sk_full_ubm_free.argtypes = [ctypes.c_void_p]
    lib.sk_full_acc_stats.argtypes = [ctypes.c_void_p, c_double_p, ctypes.c_int,
                                      ctypes.c_int, c_double_p, c_double_p]
    lib.sk_train_ivector_full.restype = ctypes.c_void_p
    lib.sk_train_ivector_full.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                          c_double_p, c_double_p, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_uint64,
                                          ctypes.c_int]
    lib.sk_ivector_full_dim.restype = ctypes.c_int
    lib.sk_ivector_full_dim.argtypes = [ctypes.c_void_p]
    lib.sk_extract_ivector_full.argtypes = [ctypes.c_void_p, c_double_p,
                                            c_double_p, c_double_p]
    lib.sk_ivector_full_free.argtypes = [ctypes.c_void_p]
    lib.sk_ivector_full_get.argtypes = [ctypes.c_void_p] + [c_double_p] * 3
    lib.sk_ivector_full_from.restype = ctypes.c_void_p
    lib.sk_ivector_full_from.argtypes = [c_double_p] * 3 + [ctypes.c_int] * 3
    lib.sk_ivector_get.argtypes = [ctypes.c_void_p] + [c_double_p] * 3
    lib.sk_ivector_from.restype = ctypes.c_void_p
    lib.sk_ivector_from.argtypes = [c_double_p] * 3 + [ctypes.c_int] * 3
    lib.sk_plda_get.argtypes = [ctypes.c_void_p] + [c_double_p] * 3
    lib.sk_plda_from.restype = ctypes.c_void_p
    lib.sk_plda_from.argtypes = [c_double_p] * 3 + [ctypes.c_int]
    lib.sk_train_ivector.restype = ctypes.c_void_p
    lib.sk_train_ivector.argtypes = [c_double_p, c_double_p, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int, c_double_p,
                                     c_double_p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_uint64, ctypes.c_int]
    lib.sk_extract_ivector.argtypes = [ctypes.c_void_p, c_double_p, c_double_p,
                                       c_double_p]
    lib.sk_ivector_free.argtypes = [ctypes.c_void_p]
    lib.sk_train_plda.restype = ctypes.c_void_p
    lib.sk_train_plda.argtypes = [c_double_p, ctypes.c_int, ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                                  ctypes.c_int]
    lib.sk_plda_transform.argtypes = [ctypes.c_void_p, c_double_p, c_double_p]
    lib.sk_plda_llr.restype = ctypes.c_double
    lib.sk_plda_llr.argtypes = [ctypes.c_void_p, c_double_p, ctypes.c_int,
                                c_double_p]
    lib.sk_plda_free.argtypes = [ctypes.c_void_p]
    lib.sk_compute_eer.restype = ctypes.c_double
    lib.sk_compute_eer.argtypes = [c_double_p, ctypes.c_int, c_double_p,
                                   ctypes.c_int, c_double_p]
    _LIB = lib
    return lib


def _dp(a: np.ndarray):
    return a.ctypes.data_as(c_double_p)


def resolve_backend(backend: str = "auto") -> str:
    """'native' (C++ scalar loops) or 'jax' (XLA einsum EM —
    :mod:`spoofsv_tpu.spoofkit.ivector_jax`). 'auto' picks jax when
    importable: the EM sweeps are dense matmuls, so even the single-core XLA
    CPU backend beats the scalar C++, and on TPU they ride the MXU."""
    if backend == "auto":
        try:
            import jax  # noqa: F401
            return "jax"
        except Exception:  # pragma: no cover - jax is in every target env
            return "native"
    assert backend in ("native", "jax"), backend
    return backend


# ----------------------------------------------------------------------
# Feature extraction
# ----------------------------------------------------------------------

def add_deltas(feats: np.ndarray, order: int = 2, window: int = 3
               ) -> np.ndarray:
    """Kaldi ``add-deltas``: append order-1..``order`` regression deltas
    (±``window`` context, clamped edges) → (T, D*(order+1)).

    The reference's sid/ scripts apply this with the Kaldi defaults
    --delta-order=2 --delta-window=3 before CMVN/voiced-selection
    (kaldi_ivectors/run.sh:108-118), so the system it attacks models 60-dim
    features from 20 cepstra."""
    feats = np.ascontiguousarray(feats, np.float64)
    T, D = feats.shape
    if T == 0:
        return np.zeros((0, D * (order + 1)), np.float64)
    lib = _load_lib()
    out = np.zeros((T, D * (order + 1)), np.float64)
    lib.sk_add_deltas(_dp(feats), T, D, order, window, _dp(out))
    return out


def mfcc_vad_features(wav_path: str, sr: int = 16000, num_mel: int = 40,
                      num_ceps: int = 20, cmvn_window: int = 300,
                      use_deltas: bool = True, delta_order: int = 2,
                      delta_window: int = 3) -> np.ndarray:
    """MFCC → add-deltas → sliding CMVN → keep voiced frames.

    Returns (T_voiced, num_ceps*(delta_order+1)) with deltas (the Kaldi sid/
    front-end order: deltas on raw cepstra, CMVN over the full delta'd
    vector, then voiced-frame selection on the energy VAD), or
    (T_voiced, num_ceps) with ``use_deltas=False``."""
    lib = _load_lib()
    y, _ = dsp_host.load_wav(wav_path, sr=sr)
    # Kaldi convention: samples in int16 range — the energy-VAD thresholds
    # (vad.conf: energy-threshold 5.5) assume that scale.
    y = np.ascontiguousarray(y * 32768.0, np.float32)
    h = lib.sk_mfcc_new(sr, num_mel, num_ceps)
    out_dim = num_ceps * (delta_order + 1 if use_deltas else 1)
    try:
        T = lib.sk_mfcc_num_frames(h, len(y))
        if T <= 0:
            return np.zeros((0, out_dim), np.float64)
        feats = np.zeros((T, num_ceps), np.float64)
        log_e = np.zeros((T,), np.float64)
        lib.sk_mfcc_compute(h, y.ctypes.data_as(c_float_p), len(y),
                            _dp(feats), _dp(log_e))
    finally:
        lib.sk_mfcc_free(h)
    voiced = np.zeros((T,), np.uint8)
    # kaldi vad.conf defaults: energy-threshold 5.5, mean-scale 0.5
    lib.sk_energy_vad(_dp(log_e), T, 5.5, 0.5, 2, 0.6,
                      voiced.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if use_deltas:
        feats = add_deltas(feats, delta_order, delta_window)
    lib.sk_cmvn_sliding(_dp(feats), T, feats.shape[1], cmvn_window)
    return feats[voiced.astype(bool)]


class UBM:
    def __init__(self, weights: np.ndarray, means: np.ndarray, vars_: np.ndarray):
        self.weights = weights
        self.means = means
        self.vars = vars_
        self._handle = None

    @classmethod
    def train(cls, frames: np.ndarray, num_comp: int, iters: int = 4,
              seed: int = 0, verbose: bool = False,
              backend: str = "native") -> "UBM":
        if resolve_backend(backend) == "jax":
            from spoofsv_tpu.spoofkit import ivector_jax
            return cls(*ivector_jax.train_diag_ubm(
                frames, num_comp, iters=iters, seed=seed, verbose=verbose))
        lib = _load_lib()
        frames = np.ascontiguousarray(frames, np.float64)
        n, d = frames.shape
        h = lib.sk_train_diag_ubm(_dp(frames), n, d, num_comp, iters, seed,
                                  int(verbose))
        w = np.zeros((num_comp,), np.float64)
        m = np.zeros((num_comp, d), np.float64)
        v = np.zeros((num_comp, d), np.float64)
        lib.sk_diag_ubm_get(h, _dp(w), _dp(m), _dp(v))
        lib.sk_diag_ubm_free(h)
        return cls(w, m, v)

    def handle(self):
        with _HANDLE_LOCK:  # acc_stats runs from thread pools; ctypes drops the GIL
            if self._handle is None:
                lib = _load_lib()
                c, d = self.means.shape
                self._handle = lib.sk_diag_ubm_from(
                    _dp(np.ascontiguousarray(self.weights)),
                    _dp(np.ascontiguousarray(self.means)),
                    _dp(np.ascontiguousarray(self.vars)), c, d)
        return self._handle

    def __del__(self):
        try:
            if self._handle is not None and _LIB is not None:
                _LIB.sk_diag_ubm_free(self._handle)
        except Exception:
            pass

    def acc_stats(self, feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        lib = _load_lib()
        c, d = self.means.shape
        feats = np.ascontiguousarray(feats, np.float64)
        N = np.zeros((c,), np.float64)
        F = np.zeros((c, d), np.float64)
        lib.sk_acc_stats(self.handle(), _dp(feats), feats.shape[0], d,
                         _dp(N), _dp(F))
        return N, F

    def acc_stats_batch(self, feats_list, backend: str = "native",
                        workers: int = 8):
        """Baum-Welch stats for many utterances — batched XLA kernel on the
        jax backend, a thread pool over the native kernel otherwise."""
        if resolve_backend(backend) == "jax":
            from spoofsv_tpu.spoofkit import ivector_jax
            return ivector_jax.acc_stats_diag_batch(
                self.weights, self.means, self.vars, feats_list)
        import concurrent.futures
        with concurrent.futures.ThreadPoolExecutor(workers) as ex:
            return list(ex.map(self.acc_stats, feats_list))

    def save(self, path: str) -> None:
        np.savez(path, weights=self.weights, means=self.means, vars=self.vars)

    @classmethod
    def load(cls, path: str) -> "UBM":
        z = np.load(path)
        return cls(z["weights"], z["means"], z["vars"])


class FullUBM:
    """Full-covariance UBM re-estimated from the diag UBM's posteriors
    (``kaldi_ivectors/run.sh:110-118``: gmm-global-to-fgmm + fgmm re-est)."""

    def __init__(self, weights: np.ndarray, means: np.ndarray,
                 covs: np.ndarray):
        self.weights = weights
        self.means = means
        self.covs = covs               # (C, D, D)
        self._handle = None

    @classmethod
    def train(cls, diag: UBM, frames: np.ndarray, iters: int = 3,
              verbose: bool = False, backend: str = "native") -> "FullUBM":
        if resolve_backend(backend) == "jax":
            from spoofsv_tpu.spoofkit import ivector_jax
            return cls(*ivector_jax.train_full_ubm(
                diag.weights, diag.means, diag.vars, frames, iters=iters,
                verbose=verbose))
        lib = _load_lib()
        frames = np.ascontiguousarray(frames, np.float64)
        n, d = frames.shape
        c = diag.means.shape[0]
        h = lib.sk_train_full_ubm(diag.handle(), _dp(frames), n, d, iters,
                                  int(verbose))
        w = np.zeros((c,), np.float64)
        m = np.zeros((c, d), np.float64)
        cv = np.zeros((c, d, d), np.float64)
        lib.sk_full_ubm_get(h, _dp(w), _dp(m), _dp(cv))
        lib.sk_full_ubm_free(h)
        return cls(w, m, cv)

    def handle(self):
        with _HANDLE_LOCK:  # acc_stats runs from thread pools; ctypes drops the GIL
            if self._handle is None:
                lib = _load_lib()
                c, d = self.means.shape
                self._handle = lib.sk_full_ubm_from(
                    _dp(np.ascontiguousarray(self.weights)),
                    _dp(np.ascontiguousarray(self.means)),
                    _dp(np.ascontiguousarray(self.covs)), c, d)
        return self._handle

    def __del__(self):
        try:
            if self._handle is not None and _LIB is not None:
                _LIB.sk_full_ubm_free(self._handle)
        except Exception:
            pass

    def acc_stats(self, feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        lib = _load_lib()
        c, d = self.means.shape
        feats = np.ascontiguousarray(feats, np.float64)
        N = np.zeros((c,), np.float64)
        F = np.zeros((c, d), np.float64)
        lib.sk_full_acc_stats(self.handle(), _dp(feats), feats.shape[0], d,
                              _dp(N), _dp(F))
        return N, F

    def acc_stats_batch(self, feats_list, backend: str = "native",
                        workers: int = 8):
        """Batched Baum-Welch stats (see :meth:`UBM.acc_stats_batch`)."""
        if resolve_backend(backend) == "jax":
            from spoofsv_tpu.spoofkit import ivector_jax
            return ivector_jax.acc_stats_full_batch(
                self.weights, self.means, self.covs, feats_list)
        import concurrent.futures
        with concurrent.futures.ThreadPoolExecutor(workers) as ex:
            return list(ex.map(self.acc_stats, feats_list))

    def save(self, path: str) -> None:
        np.savez(path, weights=self.weights, means=self.means, covs=self.covs)

    @classmethod
    def load(cls, path: str) -> "FullUBM":
        z = np.load(path)
        return cls(z["weights"], z["means"], z["covs"])


def _repair_nonfinite_rows(extract_fn, out: np.ndarray, stats) -> np.ndarray:
    """Re-solve any non-finite rows of a batched f32 extraction with the f64
    native solver (pathological stats on degenerate UBM components)."""
    bad = np.flatnonzero(~np.isfinite(out).all(axis=1))
    for i in bad:
        out[i] = extract_fn(*stats[i])
    if len(bad):
        print(f"[ivector] re-solved {len(bad)} utterances natively "
              f"(f32 posterior underflow)")
    return out


class IvectorExtractorFull:
    """T-matrix extractor on the full-covariance UBM (the configuration the
    reference's Kaldi pipeline actually runs — ``run.sh:119-129``)."""

    def __init__(self, handle, ivec_dim: int, num_comp: int = 0, dim: int = 0,
                 arrays=None):
        self._handle = handle
        self.ivec_dim = ivec_dim
        self.num_comp = num_comp
        self.dim = dim
        self._arrays = arrays          # (T (C,D,R), means (C,D), inv_covs (C,D,D))

    def __del__(self):
        try:
            if self._handle is not None and _LIB is not None:
                _LIB.sk_ivector_full_free(self._handle)
        except Exception:
            pass

    @classmethod
    def train(cls, fubm: FullUBM,
              stats: Sequence[Tuple[np.ndarray, np.ndarray]],
              ivec_dim: int = 100, iters: int = 5, seed: int = 0,
              verbose: bool = False,
              backend: str = "native") -> "IvectorExtractorFull":
        lib = _load_lib()
        u = len(stats)
        allN = np.ascontiguousarray(np.stack([s[0] for s in stats]), np.float64)
        allF = np.ascontiguousarray(np.stack([s[1] for s in stats]), np.float64)
        c, d = fubm.means.shape
        if resolve_backend(backend) == "jax":
            from spoofsv_tpu.spoofkit import ivector_jax
            inv_covs = np.ascontiguousarray(np.linalg.inv(fubm.covs))
            T = np.ascontiguousarray(ivector_jax.train_extractor(
                fubm.means, inv_covs, allN, allF, ivec_dim, iters=iters,
                seed=seed, verbose=verbose))
            means = np.ascontiguousarray(fubm.means, np.float64)
            h = lib.sk_ivector_full_from(_dp(T), _dp(means), _dp(inv_covs),
                                         c, d, ivec_dim)
            return cls(h, ivec_dim, c, d, arrays=(T, means, inv_covs))
        h = lib.sk_train_ivector_full(fubm.handle(), ivec_dim, _dp(allN),
                                      _dp(allF), u, iters, seed, int(verbose))
        return cls(h, ivec_dim, c, d)

    def arrays(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(T, ubm_means, inv_covs) — fetched from the native handle once."""
        if self._arrays is None:
            lib = _load_lib()
            c, d, r = self.num_comp, self.dim, self.ivec_dim
            T = np.zeros((c, d, r), np.float64)
            means = np.zeros((c, d), np.float64)
            inv_covs = np.zeros((c, d, d), np.float64)
            lib.sk_ivector_full_get(self._handle, _dp(T), _dp(means),
                                    _dp(inv_covs))
            self._arrays = (T, means, inv_covs)
        return self._arrays

    def extract(self, N: np.ndarray, F: np.ndarray) -> np.ndarray:
        lib = _load_lib()
        out = np.zeros((self.ivec_dim,), np.float64)
        lib.sk_extract_ivector_full(
            self._handle, _dp(np.ascontiguousarray(N, np.float64)),
            _dp(np.ascontiguousarray(F, np.float64)), _dp(out))
        return out

    def extract_batch(self, stats: Sequence[Tuple[np.ndarray, np.ndarray]],
                      backend: str = "native", workers: int = 8) -> np.ndarray:
        """(U, R) i-vectors for many utterances — one batched XLA E-step on
        the jax backend, a thread pool over the native solver otherwise."""
        if resolve_backend(backend) == "jax":
            from spoofsv_tpu.spoofkit import ivector_jax
            T, means, inv_covs = self.arrays()
            allN = np.stack([s[0] for s in stats])
            allF = np.stack([s[1] for s in stats])
            out = ivector_jax.extract_ivectors(T, inv_covs, means, allN, allF)
            return _repair_nonfinite_rows(self.extract, out, stats)
        import concurrent.futures
        with concurrent.futures.ThreadPoolExecutor(workers) as ex:
            return np.stack(list(ex.map(lambda s: self.extract(*s), stats)))

    def save(self, path: str) -> None:
        T, means, inv_covs = self.arrays()
        np.savez(path, T=T, means=means, inv_covs=inv_covs)

    @classmethod
    def load(cls, path: str) -> "IvectorExtractorFull":
        lib = _load_lib()
        z = np.load(path)
        T = np.ascontiguousarray(z["T"], np.float64)
        means = np.ascontiguousarray(z["means"], np.float64)
        inv_covs = np.ascontiguousarray(z["inv_covs"], np.float64)
        c, d, r = T.shape
        h = lib.sk_ivector_full_from(_dp(T), _dp(means), _dp(inv_covs), c, d, r)
        return cls(h, r, c, d, arrays=(T, means, inv_covs))


class IvectorExtractor:
    def __init__(self, handle, ivec_dim: int, num_comp: int = 0, dim: int = 0,
                 arrays=None):
        self._handle = handle
        self.ivec_dim = ivec_dim
        self.num_comp = num_comp
        self.dim = dim
        self._arrays = arrays          # (T (C,D,R), means (C,D), inv_vars (C,D))

    def __del__(self):
        try:
            if self._handle is not None and _LIB is not None:
                _LIB.sk_ivector_free(self._handle)
        except Exception:
            pass

    @classmethod
    def train(cls, ubm: UBM, stats: Sequence[Tuple[np.ndarray, np.ndarray]],
              ivec_dim: int = 100, iters: int = 5, seed: int = 0,
              verbose: bool = False,
              backend: str = "native") -> "IvectorExtractor":
        lib = _load_lib()
        c, d = ubm.means.shape
        u = len(stats)
        allN = np.ascontiguousarray(np.stack([s[0] for s in stats]), np.float64)
        allF = np.ascontiguousarray(np.stack([s[1] for s in stats]), np.float64)
        if resolve_backend(backend) == "jax":
            from spoofsv_tpu.spoofkit import ivector_jax
            # the native scorer floors vars at 1e-6 (ivector.cc:67)
            inv_vars = np.ascontiguousarray(
                1.0 / np.maximum(ubm.vars, 1e-6), np.float64)
            T = np.ascontiguousarray(ivector_jax.train_extractor(
                ubm.means, inv_vars, allN, allF, ivec_dim, iters=iters,
                seed=seed, verbose=verbose))
            means = np.ascontiguousarray(ubm.means, np.float64)
            h = lib.sk_ivector_from(_dp(T), _dp(means), _dp(inv_vars),
                                    c, d, ivec_dim)
            return cls(h, ivec_dim, c, d, arrays=(T, means, inv_vars))
        h = lib.sk_train_ivector(
            _dp(np.ascontiguousarray(ubm.means)),
            _dp(np.ascontiguousarray(ubm.vars)), c, d, ivec_dim,
            _dp(allN), _dp(allF), u, iters, seed, int(verbose))
        return cls(h, ivec_dim, c, d)

    def arrays(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(T, ubm_means, inv_vars) — fetched from the native handle once."""
        if self._arrays is None:
            lib = _load_lib()
            c, d, r = self.num_comp, self.dim, self.ivec_dim
            T = np.zeros((c, d, r), np.float64)
            means = np.zeros((c, d), np.float64)
            inv_vars = np.zeros((c, d), np.float64)
            lib.sk_ivector_get(self._handle, _dp(T), _dp(means), _dp(inv_vars))
            self._arrays = (T, means, inv_vars)
        return self._arrays

    def extract(self, N: np.ndarray, F: np.ndarray) -> np.ndarray:
        lib = _load_lib()
        out = np.zeros((self.ivec_dim,), np.float64)
        lib.sk_extract_ivector(self._handle,
                               _dp(np.ascontiguousarray(N, np.float64)),
                               _dp(np.ascontiguousarray(F, np.float64)),
                               _dp(out))
        return out

    def extract_batch(self, stats: Sequence[Tuple[np.ndarray, np.ndarray]],
                      backend: str = "native", workers: int = 8) -> np.ndarray:
        """(U, R) i-vectors (see :meth:`IvectorExtractorFull.extract_batch`)."""
        if resolve_backend(backend) == "jax":
            from spoofsv_tpu.spoofkit import ivector_jax
            T, means, inv_vars = self.arrays()
            allN = np.stack([s[0] for s in stats])
            allF = np.stack([s[1] for s in stats])
            out = ivector_jax.extract_ivectors(T, inv_vars, means, allN, allF)
            return _repair_nonfinite_rows(self.extract, out, stats)
        import concurrent.futures
        with concurrent.futures.ThreadPoolExecutor(workers) as ex:
            return np.stack(list(ex.map(lambda s: self.extract(*s), stats)))

    def save(self, path: str) -> None:
        T, means, inv_vars = self.arrays()
        np.savez(path, T=T, means=means, inv_vars=inv_vars)

    @classmethod
    def load(cls, path: str) -> "IvectorExtractor":
        lib = _load_lib()
        z = np.load(path)
        T = np.ascontiguousarray(z["T"], np.float64)
        means = np.ascontiguousarray(z["means"], np.float64)
        inv_vars = np.ascontiguousarray(z["inv_vars"], np.float64)
        c, d, r = T.shape
        h = lib.sk_ivector_from(_dp(T), _dp(means), _dp(inv_vars), c, d, r)
        return cls(h, r, c, d, arrays=(T, means, inv_vars))


class PLDA:
    def __init__(self, handle, dim: int):
        self._handle = handle
        self.dim = dim

    @classmethod
    def train(cls, ivecs: np.ndarray, labels: np.ndarray,
              verbose: bool = False) -> "PLDA":
        lib = _load_lib()
        ivecs = np.ascontiguousarray(ivecs, np.float64)
        labels = np.ascontiguousarray(labels, np.int32)
        n, d = ivecs.shape
        h = lib.sk_train_plda(_dp(ivecs), n, d,
                              labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                              int(labels.max()) + 1, int(verbose))
        return cls(h, d)

    def transform(self, x: np.ndarray) -> np.ndarray:
        lib = _load_lib()
        out = np.zeros((self.dim,), np.float64)
        lib.sk_plda_transform(self._handle,
                              _dp(np.ascontiguousarray(x, np.float64)), _dp(out))
        return out

    def llr(self, enroll_mean_t: np.ndarray, n_enroll: int,
            test_t: np.ndarray) -> float:
        lib = _load_lib()
        return float(lib.sk_plda_llr(
            self._handle, _dp(np.ascontiguousarray(enroll_mean_t, np.float64)),
            n_enroll, _dp(np.ascontiguousarray(test_t, np.float64))))

    def save(self, path: str) -> None:
        lib = _load_lib()
        d = self.dim
        mean = np.zeros((d,), np.float64)
        transform = np.zeros((d, d), np.float64)
        psi = np.zeros((d,), np.float64)
        lib.sk_plda_get(self._handle, _dp(mean), _dp(transform), _dp(psi))
        np.savez(path, mean=mean, transform=transform, psi=psi)

    @classmethod
    def load(cls, path: str) -> "PLDA":
        lib = _load_lib()
        z = np.load(path)
        mean = np.ascontiguousarray(z["mean"], np.float64)
        transform = np.ascontiguousarray(z["transform"], np.float64)
        psi = np.ascontiguousarray(z["psi"], np.float64)
        d = len(mean)
        h = lib.sk_plda_from(_dp(mean), _dp(transform), _dp(psi), d)
        return cls(h, d)


def compute_eer(target: np.ndarray, nontarget: np.ndarray
                ) -> Tuple[float, float]:
    lib = _load_lib()
    thr = ctypes.c_double(0.0)
    eer = lib.sk_compute_eer(
        _dp(np.ascontiguousarray(target, np.float64)), len(target),
        _dp(np.ascontiguousarray(nontarget, np.float64)), len(nontarget),
        ctypes.byref(thr))
    return float(eer), float(thr.value)


def length_normalize(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x)
    return x * (np.sqrt(len(x)) / n) if n > 0 else x


# ----------------------------------------------------------------------
# Pipeline (run.sh equivalent)
# ----------------------------------------------------------------------

def _models_complete(models_dir: str) -> bool:
    need = ["ivector_models_meta.json", "extractor.npz", "plda.npz",
            "mean_ivec.npy"]
    return all(os.path.exists(os.path.join(models_dir, f)) for f in need)


def load_ivector_models(models_dir: str):
    """Load (stats_model, extractor, plda, mean_ivec) saved by a previous
    ``run_ivector_pipeline(models_dir=...)`` run — the reference's
    first-run-only training (``run.sh [0|1]``, run.sh:105-129)."""
    with open(os.path.join(models_dir, "ivector_models_meta.json")) as f:
        meta = json.load(f)
    if meta["use_full_ubm"]:
        stats_model = FullUBM.load(os.path.join(models_dir, "fubm.npz"))
        extractor = IvectorExtractorFull.load(
            os.path.join(models_dir, "extractor.npz"))
    else:
        stats_model = UBM.load(os.path.join(models_dir, "ubm.npz"))
        extractor = IvectorExtractor.load(
            os.path.join(models_dir, "extractor.npz"))
    plda = PLDA.load(os.path.join(models_dir, "plda.npz"))
    mean_ivec = np.load(os.path.join(models_dir, "mean_ivec.npy"))
    return stats_model, extractor, plda, mean_ivec


def run_ivector_pipeline(cfg: Config, ctime: str, enroll_num: int = 3,
                         eval_num: int = 20, num_gauss: int = 1024,
                         ivec_dim: int = 400, max_train_utts_per_spk: int = 40,
                         ubm_frames_cap: int = 200_000, seed: int = 0,
                         workers: int = 8, verbose: bool = True,
                         use_full_ubm: bool = True, full_ubm_iters: int = 3,
                         models_dir: Optional[str] = None,
                         backend: str = "auto",
                         use_deltas: bool = True) -> Dict[str, float]:
    """Full evaluation: train UBM/T/PLDA on the staged train speakers, score
    mixed + no-spoof trials, report EER / clean threshold / spoof rate.

    Defaults match Kaldi aishell v1 as the reference drives it (1024 Gauss /
    400-dim i-vectors — run.sh:105-129, made affordable by the batched XLA
    backend); pass smaller values (e.g. 256/100) as the fast knob.
    ``use_full_ubm`` mirrors Kaldi's diag→full UBM upgrade (run.sh:110-118):
    stats and the T-matrix then use the full-covariance model.
    ``use_deltas`` applies Kaldi ``add-deltas`` (order 2, window 3 — the sid/
    scripts' defaults) before CMVN, i.e. 60-dim features from 20 cepstra;
    it is recorded in the model meta and honored when reusing saved models.

    ``models_dir``: if set and it contains a complete model set from a prior
    run, UBM/T/PLDA training is skipped and the saved models are reused
    (run.sh's first-run-only training, ``run.sh [0|1]``); otherwise models are
    trained and then saved there for the next invocation.

    ``backend``: 'jax' runs the EM sweeps / Baum-Welch stats / extraction as
    batched XLA einsums (MXU on TPU — see :mod:`ivector_jax`); 'native' is
    the scalar C++ reference path; 'auto' (default) picks jax when available.
    """
    import concurrent.futures

    # 'auto' is size-aware: XLA wins big at Kaldi scale (8.6x at 1024
    # Gauss/400-dim on v5e, 3.3x at 512/400 on ONE CPU core — the EM is
    # matmuls), but below that jit compilation dominates (especially remote
    # TPU compiles) and the scalar C++ is faster. Explicit backend='jax'
    # overrides at any scale.
    if backend == "auto" and num_gauss < 512:
        backend = "native"
    backend = resolve_backend(backend)
    if verbose:
        print(f"[ivector] backend: {backend}")

    root = os.path.join(cfg.src_root_dir, "test", ctime, "ivector_data")
    train_dir = os.path.join(root, "wav", "train")
    test_dir = os.path.join(root, "wav", "test")
    ns_dir = os.path.join(root, "test_nospoof")

    rng = np.random.default_rng(seed)

    if models_dir and _models_complete(models_dir):
        if verbose:
            print(f"[ivector] reusing trained models from {models_dir}")
        with open(os.path.join(models_dir, "ivector_models_meta.json")) as f:
            _meta = json.load(f)
        # Scoring features must match the feature space the models were
        # trained in, whatever this call's knob says.
        use_deltas = bool(_meta.get("use_deltas", False))
        stats_model, extractor, plda, mean_ivec = load_ivector_models(models_dir)
    else:
        # ---- 1. features for train speakers
        train_items: List[Tuple[str, str]] = []
        for spk in sorted(os.listdir(train_dir)):
            utts = sorted(os.listdir(os.path.join(train_dir, spk)))
            if max_train_utts_per_spk:
                utts = utts[:max_train_utts_per_spk]
            train_items += [(spk, os.path.join(train_dir, spk, u)) for u in utts]
        if verbose:
            print(f"[ivector] extracting features for {len(train_items)} train utts")
        with concurrent.futures.ThreadPoolExecutor(workers) as ex:
            train_feats = list(ex.map(
                lambda it: mfcc_vad_features(it[1], use_deltas=use_deltas),
                train_items))

        # ---- 2. UBM on pooled (subsampled) frames
        pool = np.concatenate([f for f in train_feats if len(f)], axis=0)
        if len(pool) > ubm_frames_cap:
            pool = pool[rng.choice(len(pool), ubm_frames_cap, replace=False)]
        if verbose:
            print(f"[ivector] training {num_gauss}-comp diag UBM on {len(pool)} frames")
        ubm = UBM.train(pool, num_gauss, iters=4, seed=seed, verbose=verbose,
                        backend=backend)
        if use_full_ubm:
            if verbose:
                print(f"[ivector] re-estimating full-covariance UBM ({full_ubm_iters} iters)")
            stats_model = FullUBM.train(ubm, pool, iters=full_ubm_iters,
                                        verbose=verbose, backend=backend)
        else:
            stats_model = ubm

        # ---- 3. stats + T-matrix
        if verbose:
            print("[ivector] accumulating stats + training T matrix")
        stats = stats_model.acc_stats_batch(
            [f for f in train_feats if len(f) > 0], backend=backend,
            workers=workers)
        kept = [i for i, f in enumerate(train_feats) if len(f) > 0]
        if use_full_ubm:
            extractor = IvectorExtractorFull.train(stats_model, stats,
                                                   ivec_dim=ivec_dim, iters=5,
                                                   seed=seed, verbose=verbose,
                                                   backend=backend)
        else:
            extractor = IvectorExtractor.train(ubm, stats, ivec_dim=ivec_dim,
                                               iters=5, seed=seed,
                                               verbose=verbose, backend=backend)

        # ---- 4. train i-vectors + PLDA
        train_ivecs = extractor.extract_batch(stats, backend=backend,
                                              workers=workers)
        spk_names = sorted({train_items[i][0] for i in kept})
        spk_idx = {s: i for i, s in enumerate(spk_names)}
        labels = np.asarray([spk_idx[train_items[i][0]] for i in kept], np.int32)
        mean_ivec = train_ivecs.mean(axis=0)
        normed = np.stack([length_normalize(v - mean_ivec) for v in train_ivecs])
        if verbose:
            print(f"[ivector] training PLDA on {len(normed)} ivecs / {len(spk_names)} spk")
        plda = PLDA.train(normed, labels, verbose=verbose)

        if models_dir:
            os.makedirs(models_dir, exist_ok=True)
            if use_full_ubm:
                ubm.save(os.path.join(models_dir, "ubm.npz"))
                stats_model.save(os.path.join(models_dir, "fubm.npz"))
            else:
                ubm.save(os.path.join(models_dir, "ubm.npz"))
            extractor.save(os.path.join(models_dir, "extractor.npz"))
            plda.save(os.path.join(models_dir, "plda.npz"))
            np.save(os.path.join(models_dir, "mean_ivec.npy"), mean_ivec)
            with open(os.path.join(models_dir, "ivector_models_meta.json"),
                      "w") as f:
                json.dump({"use_full_ubm": use_full_ubm,
                           "num_gauss": num_gauss, "ivec_dim": ivec_dim,
                           "use_deltas": use_deltas}, f)
            if verbose:
                print(f"[ivector] models saved to {models_dir}")

    # The mixed and no-spoof test dirs stage the SAME real utterances as
    # separate file copies (generate_test_utterances.py:141-217); cache
    # per-utterance transformed i-vectors by content hash so each real file
    # pays MFCC+VAD+stats+extract once across both scoring passes.
    ivec_cache: Dict[str, Optional[np.ndarray]] = {}

    def _hash_of(path: str) -> str:
        import hashlib
        with open(path, "rb") as fh:
            return hashlib.sha1(fh.read()).hexdigest()

    def utterance_ivector(path: str) -> Optional[np.ndarray]:
        key = _hash_of(path)
        if key in ivec_cache:
            return ivec_cache[key]
        f = mfcc_vad_features(path, use_deltas=use_deltas)
        if len(f) == 0:
            vec = None
        else:
            iv = extractor.extract(*stats_model.acc_stats(f))
            vec = plda.transform(length_normalize(iv - mean_ivec))
        ivec_cache[key] = vec
        return vec

    def prime_ivector_cache(dirs: List[str]) -> None:
        """jax backend: batch the whole scoring set's stats + extraction
        through the XLA kernels instead of per-file native solves."""
        paths = []
        for d in dirs:
            for spk in sorted(os.listdir(d)):
                for u in sorted(os.listdir(os.path.join(d, spk))):
                    paths.append(os.path.join(d, spk, u))
        fresh: List[Tuple[str, str]] = []
        seen = set()
        for p in paths:
            k = _hash_of(p)
            if k not in ivec_cache and k not in seen:
                fresh.append((k, p))
                seen.add(k)
        if not fresh:
            return
        if verbose:
            print(f"[ivector] batch-extracting {len(fresh)} unique test utts")
        with concurrent.futures.ThreadPoolExecutor(workers) as ex:
            feats = list(ex.map(
                lambda kp: mfcc_vad_features(kp[1], use_deltas=use_deltas),
                fresh))
        keep = [i for i, f in enumerate(feats) if len(f) > 0]
        for i, (k, _) in enumerate(fresh):
            if i not in keep:
                ivec_cache[k] = None
        if not keep:
            return
        st = stats_model.acc_stats_batch([feats[i] for i in keep],
                                         backend=backend, workers=workers)
        ivecs = extractor.extract_batch(st, backend=backend, workers=workers)
        for j, i in enumerate(keep):
            ivec_cache[fresh[i][0]] = plda.transform(
                length_normalize(ivecs[j] - mean_ivec))

    if backend == "jax":
        prime_ivector_cache([test_dir, ns_dir])

    def score_testdir(d: str, with_index_split: bool = True):
        """Enroll = first enroll_num utts per speaker (split_data_enroll_eval.py),
        score all eval utts against every enrolled speaker."""
        scores = []  # (enroll_spk, test_spk, utt_index, llr)
        spks = sorted(os.listdir(d))
        enroll: Dict[str, Tuple[np.ndarray, int]] = {}
        evals: Dict[str, List[Tuple[int, np.ndarray]]] = {}
        for spk in spks:
            utts = sorted(os.listdir(os.path.join(d, spk)))
            e_vecs = []
            evals[spk] = []
            for u in utts:
                idx = int(u[-7:-4])
                vec = utterance_ivector(os.path.join(d, spk, u))
                if vec is None:
                    continue
                if idx <= enroll_num:
                    e_vecs.append(vec)
                else:
                    evals[spk].append((idx, vec))
            if e_vecs:
                enroll[spk] = (np.mean(e_vecs, axis=0), len(e_vecs))
        for espk, (emean, n) in enroll.items():
            for tspk, lst in evals.items():
                for idx, vec in lst:
                    scores.append((espk, tspk, idx, plda.llr(emean, n, vec)))
        return scores

    if verbose:
        print("[ivector] scoring mixed test set")
    mixed_scores = score_testdir(test_dir)
    if verbose:
        print("[ivector] scoring no-spoof test set")
    ns_scores = score_testdir(ns_dir)

    def eer_of(scores):
        tgt = np.asarray([s for e, t, i, s in scores if e == t])
        non = np.asarray([s for e, t, i, s in scores if e != t])
        return compute_eer(tgt, non)

    mixed_eer, mixed_thr = eer_of(mixed_scores)
    clean_eer, clean_thr = eer_of(ns_scores)
    # spoof rate: target trials with utt index > enroll+eval are synthetic
    # (ivector_spoofrate.py:12-24)
    spoof_target = [s for e, t, i, s in mixed_scores
                    if e == t and i > enroll_num + eval_num]
    spoof_rate = (float(np.mean(np.asarray(spoof_target) > clean_thr))
                  if spoof_target else 0.0)

    # score files in the kaldi format curve.py parses (trial "<espk> <tspk>W<idx>")
    score_dir = os.path.join(root, "scores")
    os.makedirs(score_dir, exist_ok=True)
    with open(os.path.join(score_dir, "plda_scores_mixed.txt"), "w") as f:
        for e, t, i, s in mixed_scores:
            f.write(f"{e} {t}W{str(i).zfill(3)} {s}\n")
    with open(os.path.join(score_dir, "plda_scores_nospoof.txt"), "w") as f:
        for e, t, i, s in ns_scores:
            f.write(f"{e} {t}W{str(i).zfill(3)} {s}\n")

    result = {"mixed_eer": mixed_eer, "clean_eer": clean_eer,
              "clean_threshold": clean_thr, "spoof_rate": spoof_rate,
              "n_mixed_trials": len(mixed_scores),
              "n_spoof_targets": len(spoof_target)}
    if verbose:
        print(json.dumps(result, indent=2))
    with open(os.path.join(score_dir, "result.json"), "w") as f:
        json.dump(result, f)
    return result


# ----------------------------------------------------------------------
# Standalone score-file recompute (ivector_eer.sh:30 / ivector_spoofrate.py)
# ----------------------------------------------------------------------

def read_score_file(path: str) -> List[Tuple[str, str, int, float]]:
    """Parse ``<espk> <tspk>W<idx> <llr>`` lines (the format
    ``run_ivector_pipeline`` writes and ``curve.py:27-49`` parses)."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 3:
                continue
            espk, trial, s = parts
            out.append((espk, trial[:-4], int(trial[-3:]), float(s)))
    return out


def recompute_eer_from_scores(path: str) -> Tuple[float, float]:
    """EER + threshold from a saved score file — the reference's
    ``ivector_eer.sh:30`` (compute-eer on the stored PLDA scores)."""
    scores = read_score_file(path)
    tgt = np.asarray([s for e, t, i, s in scores if e == t])
    non = np.asarray([s for e, t, i, s in scores if e != t])
    return compute_eer(tgt, non)


def spoof_rate_from_scores(path: str, threshold: float, enroll_num: int = 3,
                           eval_num: int = 20) -> Tuple[float, int]:
    """Spoof rate at a threshold from a saved mixed score file: target
    trials whose utterance index exceeds enroll+eval are synthetic
    (``ivector_spoofrate.py:12-24``). Returns (rate, n_spoof_targets)."""
    scores = read_score_file(path)
    spoof = [s for e, t, i, s in scores
             if e == t and i > enroll_num + eval_num]
    if not spoof:
        return 0.0, 0
    return float(np.mean(np.asarray(spoof) > threshold)), len(spoof)
