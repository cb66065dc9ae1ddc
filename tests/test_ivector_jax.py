"""XLA i-vector backend vs the native C++ reference implementation.

Exact-math surfaces (Baum-Welch stats, i-vector posterior extraction) are
compared bit-for-bit-modulo-f32 against libspoofkit; EM training (whose
component-seeding RNG legitimately differs — numpy vs std::mt19937_64) is
compared at the model-quality level on synthetic clustered data.
"""

import os

import numpy as np
import pytest

from spoofsv_tpu.spoofkit import ivector as ivec
from spoofsv_tpu.spoofkit import ivector_jax


def _gmm_frames(rng, n=3000, d=6):
    """3 well-separated diagonal-gaussian clusters."""
    centers = np.asarray([[4.0] * d, [-4.0] * d, [0.0] * d])
    scales = np.asarray([0.7, 1.2, 0.5])
    comp = rng.integers(0, 3, size=n)
    return (centers[comp] + scales[comp, None] * rng.normal(size=(n, d))
            ).astype(np.float64), comp


def _loglike_diag(frames, w, m, v):
    v = np.maximum(v, 1e-6)
    ll = (np.log(np.maximum(w, 1e-20))[None]
          - 0.5 * frames.shape[1] * np.log(2 * np.pi)
          - 0.5 * np.sum(np.log(v), axis=1)[None]
          - 0.5 * np.sum((frames[:, None, :] - m[None]) ** 2 / v[None], axis=2))
    mx = ll.max(axis=1)
    return float(np.mean(mx + np.log(np.exp(ll - mx[:, None]).sum(axis=1))))


def _loglike_full(frames, w, m, covs):
    from scipy.stats import multivariate_normal
    comp = np.stack([multivariate_normal.logpdf(frames, m[c], covs[c],
                                                allow_singular=True)
                     for c in range(len(w))], axis=1)
    comp = comp + np.log(np.maximum(w, 1e-20))[None]
    mx = comp.max(axis=1)
    return float(np.mean(mx + np.log(np.exp(comp - mx[:, None]).sum(axis=1))))


class TestStatsParity:
    def test_diag_stats_match_native(self):
        rng = np.random.default_rng(11)
        c, d = 8, 6
        w = rng.dirichlet(np.ones(c))
        m = rng.normal(size=(c, d)) * 3
        v = rng.uniform(0.5, 2.0, size=(c, d))
        ubm = ivec.UBM(w, m, v)
        feats = [rng.normal(size=(t, d)) * 2 for t in (37, 120, 260)]
        native = [ubm.acc_stats(f) for f in feats]
        jaxed = ubm.acc_stats_batch(feats, backend="jax")
        for (n0, f0), (n1, f1) in zip(native, jaxed):
            np.testing.assert_allclose(n1, n0, rtol=2e-4, atol=1e-5)
            np.testing.assert_allclose(f1, f0, rtol=2e-4, atol=2e-4)

    def test_full_stats_match_native(self):
        rng = np.random.default_rng(12)
        c, d = 5, 4
        w = rng.dirichlet(np.ones(c))
        m = rng.normal(size=(c, d)) * 2
        a = rng.normal(size=(c, d, d)) * 0.3
        covs = a @ a.transpose(0, 2, 1) + np.eye(d)[None]
        fubm = ivec.FullUBM(w, m, covs)
        feats = [rng.normal(size=(t, d)) * 2 for t in (50, 140)]
        native = [fubm.acc_stats(f) for f in feats]
        jaxed = fubm.acc_stats_batch(feats, backend="jax")
        for (n0, f0), (n1, f1) in zip(native, jaxed):
            np.testing.assert_allclose(n1, n0, rtol=3e-4, atol=1e-5)
            np.testing.assert_allclose(f1, f0, rtol=3e-4, atol=3e-4)


class TestExtractionParity:
    def test_full_extractor_posterior_matches_native(self, tmp_path):
        rng = np.random.default_rng(13)
        c, d, r, u = 6, 4, 5, 7
        T = rng.normal(size=(c, d, r)) * 0.3
        means = rng.normal(size=(c, d))
        a = rng.normal(size=(c, d, d)) * 0.2
        inv_covs = a @ a.transpose(0, 2, 1) + np.eye(d)[None]
        p = str(tmp_path / "ext.npz")
        np.savez(p, T=T, means=means, inv_covs=inv_covs)
        ext = ivec.IvectorExtractorFull.load(p)
        allN = rng.uniform(0.0, 50.0, size=(u, c))
        allN[0, :3] = 0.0              # exercise the N_c < 1e-8 skip
        allF = rng.normal(size=(u, c, d)) * 10
        stats = [(allN[i], allF[i]) for i in range(u)]
        native = np.stack([ext.extract(*s) for s in stats])
        jaxed = ext.extract_batch(stats, backend="jax")
        np.testing.assert_allclose(jaxed, native, rtol=2e-3, atol=2e-3)

    def test_diag_extractor_posterior_matches_native(self, tmp_path):
        rng = np.random.default_rng(14)
        c, d, r, u = 6, 4, 3, 5
        T = rng.normal(size=(c, d, r)) * 0.3
        means = rng.normal(size=(c, d))
        inv_vars = rng.uniform(0.4, 2.5, size=(c, d))
        p = str(tmp_path / "dext.npz")
        np.savez(p, T=T, means=means, inv_vars=inv_vars)
        ext = ivec.IvectorExtractor.load(p)
        allN = rng.uniform(0.0, 40.0, size=(u, c))
        allF = rng.normal(size=(u, c, d)) * 8
        stats = [(allN[i], allF[i]) for i in range(u)]
        native = np.stack([ext.extract(*s) for s in stats])
        jaxed = ext.extract_batch(stats, backend="jax")
        np.testing.assert_allclose(jaxed, native, rtol=2e-3, atol=2e-3)


class TestEmQuality:
    """EM training quality: the jax sweeps must fit the data as well as the
    C++ (same floors/thresholds/update rules; only the split-seeding RNG
    differs, so models are compared by data log-likelihood)."""

    def test_diag_ubm_em(self):
        rng = np.random.default_rng(15)
        frames, _ = _gmm_frames(rng)
        nat = ivec.UBM.train(frames, 4, iters=4, seed=1, backend="native")
        jx = ivec.UBM.train(frames, 4, iters=4, seed=1, backend="jax")
        ll_n = _loglike_diag(frames, nat.weights, nat.means, nat.vars)
        ll_j = _loglike_diag(frames, jx.weights, jx.means, jx.vars)
        assert ll_j > ll_n - 0.05, (ll_j, ll_n)

    def test_full_ubm_em(self):
        rng = np.random.default_rng(16)
        frames, _ = _gmm_frames(rng, n=2000)
        diag = ivec.UBM.train(frames, 3, iters=3, seed=2, backend="native")
        nat = ivec.FullUBM.train(diag, frames, iters=2, backend="native")
        jx = ivec.FullUBM.train(diag, frames, iters=2, backend="jax")
        ll_n = _loglike_full(frames, nat.weights, nat.means, nat.covs)
        ll_j = _loglike_full(frames, jx.weights, jx.means, jx.covs)
        assert ll_j > ll_n - 0.05, (ll_j, ll_n)
        # same diag seed model → the EM path itself should land close
        np.testing.assert_allclose(jx.weights, nat.weights, atol=2e-3)

    def test_t_matrix_em_learns_the_same_subspace(self):
        """T-matrix EM from both backends (different random inits) must land
        on the same dominant total-variability subspace: the leading
        canonical correlations between their i-vector sets must be ≈1, and
        both must separate same- vs cross-speaker pairs comparably."""
        rng = np.random.default_rng(17)
        d, n_spk, utts, t = 5, 4, 8, 400
        spk_shift = rng.normal(size=(n_spk, d)) * 4.0
        feats, labels = [], []
        for s in range(n_spk):
            for _ in range(utts):
                feats.append((spk_shift[s] + rng.normal(size=(t, d))
                              ).astype(np.float64))
                labels.append(s)
        pool = np.concatenate(feats)
        diag = ivec.UBM.train(pool, 6, iters=3, seed=3, backend="native")
        full = ivec.FullUBM.train(diag, pool, iters=2, backend="native")
        stats = full.acc_stats_batch(feats, backend="jax")

        ivs = {}

        def sep(backend):
            ext = ivec.IvectorExtractorFull.train(
                full, stats, ivec_dim=6, iters=5, seed=4, backend=backend)
            iv_all = ext.extract_batch(stats, backend="jax")
            ivs[backend] = iv_all
            iv_all = iv_all - iv_all.mean(axis=0)   # center, like the pipeline
            iv_all = iv_all / np.linalg.norm(iv_all, axis=1, keepdims=True)
            sim = iv_all @ iv_all.T
            lab = np.asarray(labels)
            same = sim[lab[:, None] == lab[None, :]]
            diff = sim[lab[:, None] != lab[None, :]]
            return float(same.mean() - diff.mean())

        s_native, s_jax = sep("native"), sep("jax")
        assert s_native > 0.0, s_native
        assert s_jax > 0.0, s_jax
        assert s_jax > 0.5 * s_native, (s_jax, s_native)

        def _orthobasis(x):
            x = x - x.mean(axis=0)
            u, _, _ = np.linalg.svd(x, full_matrices=False)
            return u

        ccs = np.linalg.svd(_orthobasis(ivs["native"]).T
                            @ _orthobasis(ivs["jax"]), compute_uv=False)
        # measured [0.9996 0.9972 0.9867 0.949 ...] — the trailing dims are
        # noise directions where EM solutions legitimately differ
        assert float(np.mean(ccs[:4])) > 0.9, ccs


class TestBackendResolution:
    def test_auto_resolves_jax_here(self):
        assert ivec.resolve_backend("auto") == "jax"
        assert ivec.resolve_backend("native") == "native"
        with pytest.raises(AssertionError):
            ivec.resolve_backend("cuda")
