"""Native libspoofkit tests: MFCC/VAD/UBM/i-vector/PLDA/EER on synthetic data."""

import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "spoofsv_tpu", "native")


@pytest.fixture(scope="module", autouse=True)
def build_lib():
    subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)


@pytest.fixture(scope="module")
def ivec():
    from spoofsv_tpu.spoofkit import ivector as iv

    return iv


class TestMfcc:
    def test_tone_features(self, ivec, tmp_path):
        from spoofsv_tpu.dsp import host

        sr = 16000
        t = np.arange(sr) / sr
        y = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        host.write_wav(str(tmp_path / "tone.wav"), y, sr)
        feats = ivec.mfcc_vad_features(str(tmp_path / "tone.wav"))
        assert feats.shape[1] == 60         # 20 ceps + order-2 deltas
        assert feats.shape[0] > 50          # ~97 frames, most voiced
        assert np.isfinite(feats).all()
        # sliding CMVN on a stationary tone → near-zero means
        assert np.abs(feats.mean(axis=0)).max() < 1.5
        statics = ivec.mfcc_vad_features(str(tmp_path / "tone.wav"),
                                         use_deltas=False)
        assert statics.shape[1] == 20

    def test_add_deltas_golden(self, ivec):
        """Kaldi add-deltas semantics: bit-parity with an independent numpy
        transcription of feat/feature-functions.cc DeltaFeatures (order-2,
        window-3 defaults of the sid/ scripts — run.sh:108-118)."""

        def np_deltas(x, order, window):
            T, D = x.shape
            scales = [np.array([1.0])]
            for _ in range(order):
                prev = scales[-1]
                po = (len(prev) - 1) // 2
                cur = np.zeros(len(prev) + 2 * window)
                norm = sum(j * j for j in range(-window, window + 1))
                for j in range(-window, window + 1):
                    for k in range(-po, po + 1):
                        cur[j + k + po + window] += j * prev[k + po]
                scales.append(cur / norm)
            out = np.zeros((T, D * (order + 1)))
            for t in range(T):
                for i, sc in enumerate(scales):
                    mo = (len(sc) - 1) // 2
                    for j in range(-mo, mo + 1):
                        if sc[j + mo] == 0.0:
                            continue
                        src = min(max(t + j, 0), T - 1)
                        out[t, i * D:(i + 1) * D] += sc[j + mo] * x[src]
            return out

        rng = np.random.default_rng(7)
        for (T, D, order, window) in [(37, 5, 2, 3), (12, 3, 2, 2),
                                      (50, 20, 1, 3), (3, 4, 2, 3)]:
            x = rng.normal(size=(T, D))
            got = ivec.add_deltas(x, order=order, window=window)
            assert got.shape == (T, D * (order + 1))
            np.testing.assert_allclose(got, np_deltas(x, order, window),
                                       rtol=0, atol=1e-12)
        # a linear ramp's first delta is its slope on interior frames
        ramp = np.arange(20, dtype=np.float64)[:, None] * 2.0
        d = ivec.add_deltas(ramp, order=1, window=2)
        np.testing.assert_allclose(d[4:16, 1], 2.0, atol=1e-12)
        # degenerate single frame: statics preserved, deltas ~0
        one = ivec.add_deltas(np.ones((1, 3)), order=2, window=3)
        np.testing.assert_allclose(one[0, :3], 1.0)
        np.testing.assert_allclose(one[0, 3:], 0.0, atol=1e-12)

    def test_vad_rejects_silence(self, ivec, tmp_path):
        from spoofsv_tpu.dsp import host

        sr = 16000
        t = np.arange(sr // 2) / sr
        speech = 0.3 * np.sin(2 * np.pi * 300 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
        sig = np.concatenate([np.full(sr, 1e-4, np.float32),
                              speech.astype(np.float32),
                              np.full(sr, 1e-4, np.float32)])
        host.write_wav(str(tmp_path / "sp.wav"), sig, sr)
        feats = ivec.mfcc_vad_features(str(tmp_path / "sp.wav"))
        # voiced frames ≈ speech duration (0.5 s → ~50 frames), not 2.5 s
        assert 20 < feats.shape[0] < 120


def synthetic_speakers(rng, n_spk=4, utts=8, frames=300, dim=8, n_centers=8):
    """Textbook i-vector regime: shared acoustic mixture centers + a small
    per-speaker supervector shift (speaker identity = mean offset, which is
    exactly what the T-matrix models; distinct per-speaker clusters would be
    absorbed into the UBM instead)."""
    centers = rng.normal(0, 4.0, (n_centers, dim))
    spk_shift = rng.normal(0, 0.8, (n_spk, dim))
    data = []
    for s in range(n_spk):
        for _ in range(utts):
            which = rng.integers(0, n_centers, frames)
            f = centers[which] + spk_shift[s] + rng.normal(0, 0.7, (frames, dim))
            data.append((s, f.astype(np.float64)))
    return spk_shift, data


class TestUbmIvectorPlda:
    def test_ubm_recovers_clusters(self, ivec):
        rng = np.random.default_rng(0)
        centers = np.asarray([[-5.0, 0.0], [5.0, 0.0], [0.0, 6.0]])
        frames = np.concatenate([
            c + rng.normal(0, 0.5, (500, 2)) for c in centers])
        ubm = ivec.UBM.train(frames, 3, iters=6, seed=1)
        # each true center has a learned mean nearby
        for c in centers:
            d = np.linalg.norm(ubm.means - c, axis=1).min()
            assert d < 0.5, (c, ubm.means)
        np.testing.assert_allclose(ubm.weights.sum(), 1.0, atol=1e-6)

    def test_full_stack_separates_speakers(self, ivec):
        rng = np.random.default_rng(1)
        _, data = synthetic_speakers(rng)
        pool = np.concatenate([f for _, f in data])[::3]
        ubm = ivec.UBM.train(pool, 8, iters=3, seed=2)
        stats = [ubm.acc_stats(f) for _, f in data]
        ext = ivec.IvectorExtractor.train(ubm, stats, ivec_dim=6, iters=3, seed=3)
        ivecs = np.stack([ext.extract(*s) for s in stats])
        labels = np.asarray([s for s, _ in data], np.int32)

        mean = ivecs.mean(0)
        normed = np.stack([ivec.length_normalize(v - mean) for v in ivecs])
        plda = ivec.PLDA.train(normed, labels)
        tr = np.stack([plda.transform(v) for v in normed])

        # same-speaker LLRs should exceed different-speaker LLRs on average
        same, diff = [], []
        for i in range(len(tr)):
            for j in range(i + 1, len(tr)):
                llr = plda.llr(tr[i], 1, tr[j])
                (same if labels[i] == labels[j] else diff).append(llr)
        assert np.mean(same) > np.mean(diff)
        eer, thr = ivec.compute_eer(np.asarray(same), np.asarray(diff))
        assert eer < 0.2, f"EER {eer}"

    def test_full_ubm_recovers_correlated_clusters(self, ivec):
        """Full-cov re-estimation captures a strongly correlated component
        that the diag UBM cannot represent."""
        rng = np.random.default_rng(4)
        cov = np.asarray([[1.0, 0.9], [0.9, 1.0]])
        a = rng.multivariate_normal([-4.0, 0.0], cov, 800)
        b = rng.multivariate_normal([4.0, 0.0], np.eye(2) * 0.3, 800)
        frames = np.concatenate([a, b])
        diag = ivec.UBM.train(frames, 2, iters=5, seed=5)
        full = ivec.FullUBM.train(diag, frames, iters=3)
        np.testing.assert_allclose(full.weights.sum(), 1.0, atol=1e-6)
        # the component near (-4, 0) must have learned the 0.9 correlation
        ci = int(np.argmin(np.abs(full.means[:, 0] + 4.0)))
        c = full.covs[ci]
        rho = c[0, 1] / np.sqrt(c[0, 0] * c[1, 1])
        assert rho > 0.7, (rho, c)

    def test_full_stack_separates_speakers_full_cov(self, ivec):
        """Same full-stack check through the full-covariance UBM + extractor
        (the configuration kaldi_ivectors/run.sh actually runs)."""
        rng = np.random.default_rng(6)
        _, data = synthetic_speakers(rng)
        pool = np.concatenate([f for _, f in data])[::3]
        diag = ivec.UBM.train(pool, 8, iters=3, seed=2)
        full = ivec.FullUBM.train(diag, pool, iters=2)
        stats = [full.acc_stats(f) for _, f in data]
        ext = ivec.IvectorExtractorFull.train(full, stats, ivec_dim=6,
                                              iters=3, seed=3)
        ivecs = np.stack([ext.extract(*s) for s in stats])
        labels = np.asarray([s for s, _ in data], np.int32)
        mean = ivecs.mean(0)
        normed = np.stack([ivec.length_normalize(v - mean) for v in ivecs])
        plda = ivec.PLDA.train(normed, labels)
        tr = np.stack([plda.transform(v) for v in normed])
        same, diff = [], []
        for i in range(len(tr)):
            for j in range(i + 1, len(tr)):
                llr = plda.llr(tr[i], 1, tr[j])
                (same if labels[i] == labels[j] else diff).append(llr)
        eer, _ = ivec.compute_eer(np.asarray(same), np.asarray(diff))
        assert eer < 0.2, f"EER {eer}"

    def test_full_ubm_save_load_roundtrip(self, ivec, tmp_path):
        rng = np.random.default_rng(7)
        frames = rng.normal(size=(600, 3))
        diag = ivec.UBM.train(frames, 2, iters=2, seed=8)
        full = ivec.FullUBM.train(diag, frames, iters=1)
        p = str(tmp_path / "fubm.npz")
        full.save(p)
        back = ivec.FullUBM.load(p)
        np.testing.assert_allclose(back.covs, full.covs)
        n1, f1 = full.acc_stats(frames[:50])
        n2, f2 = back.acc_stats(frames[:50])
        np.testing.assert_allclose(n1, n2)
        np.testing.assert_allclose(f1, f2)

    def test_extractor_plda_save_load_roundtrip(self, ivec, tmp_path):
        """Saved extractor/PLDA must reproduce extract/transform/llr exactly
        (model caching across runs — run.sh first-run-only training)."""
        rng = np.random.default_rng(9)
        _, data = synthetic_speakers(rng, n_spk=3, utts=4, frames=150, dim=4,
                                     n_centers=4)
        pool = np.concatenate([f for _, f in data])[::2]
        diag = ivec.UBM.train(pool, 4, iters=2, seed=1)
        full = ivec.FullUBM.train(diag, pool, iters=1)
        stats = [full.acc_stats(f) for _, f in data]
        ext = ivec.IvectorExtractorFull.train(full, stats, ivec_dim=3,
                                              iters=2, seed=2)
        p = str(tmp_path / "ext.npz")
        ext.save(p)
        back = ivec.IvectorExtractorFull.load(p)
        for s in stats[:4]:
            np.testing.assert_allclose(back.extract(*s), ext.extract(*s),
                                       rtol=1e-12)

        # diag extractor too
        dstats = [diag.acc_stats(f) for _, f in data]
        dext = ivec.IvectorExtractor.train(diag, dstats, ivec_dim=3,
                                           iters=2, seed=2)
        pd = str(tmp_path / "dext.npz")
        dext.save(pd)
        dback = ivec.IvectorExtractor.load(pd)
        for s in dstats[:4]:
            np.testing.assert_allclose(dback.extract(*s), dext.extract(*s),
                                       rtol=1e-12)

        ivecs = np.stack([ext.extract(*s) for s in stats])
        labels = np.asarray([s for s, _ in data], np.int32)
        mean = ivecs.mean(0)
        normed = np.stack([ivec.length_normalize(v - mean) for v in ivecs])
        plda = ivec.PLDA.train(normed, labels)
        pp = str(tmp_path / "plda.npz")
        plda.save(pp)
        pback = ivec.PLDA.load(pp)
        t0 = plda.transform(normed[0])
        np.testing.assert_allclose(pback.transform(normed[0]), t0, rtol=1e-12)
        t1 = plda.transform(normed[5])
        assert pback.llr(t0, 2, t1) == pytest.approx(plda.llr(t0, 2, t1),
                                                     rel=1e-12)

    def test_score_file_recompute(self, ivec, tmp_path):
        """recompute_eer_from_scores/spoof_rate_from_scores reproduce the
        in-pipeline computation from the written score format
        (ivector_eer.sh:30, ivector_spoofrate.py:12-24)."""
        rng = np.random.default_rng(10)
        lines = []
        tgt, non = [], []
        for espk in ("s01", "s02"):
            for tspk in ("s01", "s02"):
                for idx in range(4, 12):
                    s = rng.normal(3.0 if espk == tspk else -3.0, 1.0)
                    lines.append(f"{espk} {tspk}W{str(idx).zfill(3)} {s}\n")
                    (tgt if espk == tspk else non).append(s)
        p = str(tmp_path / "scores.txt")
        with open(p, "w") as f:
            f.writelines(lines)
        eer, thr = ivec.recompute_eer_from_scores(p)
        eer2, thr2 = ivec.compute_eer(np.asarray(tgt), np.asarray(non))
        assert eer == pytest.approx(eer2) and thr == pytest.approx(thr2)
        # spoof rate: indices > enroll+eval(2+5=7) are synthetic
        rate, n = ivec.spoof_rate_from_scores(p, threshold=0.0,
                                              enroll_num=2, eval_num=5)
        spoof = [s for (espk, t, i, s) in ivec.read_score_file(p)
                 if espk == t and i > 7]
        assert n == len(spoof) == 8
        assert rate == pytest.approx(np.mean(np.asarray(spoof) > 0.0))

    def test_eer_known_values(self, ivec):
        target = np.asarray([2.0, 3.0, 4.0, 5.0])
        nontarget = np.asarray([-5.0, -4.0, -3.0, -2.0])
        eer, thr = ivec.compute_eer(target, nontarget)
        assert eer == 0.0
        assert -2.0 <= thr <= 2.0
        # fully overlapped → EER 0.5
        eer2, _ = ivec.compute_eer(np.asarray([0.0, 1.0]), np.asarray([0.0, 1.0]))
        assert 0.2 <= eer2 <= 0.8


class TestFlacCodec:
    """Native FLAC codec (flac.cc) — the staging format of the reference's
    anti-spoofing corpus (generate_test_utterances.py:246-255)."""

    def _tone(self, n=32000, sr=16000, seed=0):
        rng = np.random.default_rng(seed)
        t = np.arange(n) / sr
        y = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.2 * np.sin(2 * np.pi * 660 * t)
             + 0.01 * rng.normal(size=n))
        return (np.clip(y, -1, 1) * 32767).astype(np.int32)

    def test_mono_roundtrip_bit_exact(self, ivec, tmp_path):
        from spoofsv_tpu.spoofkit.flacio import decode_flac, encode_flac
        pcm = self._tone()
        p = str(tmp_path / "m.flac")
        encode_flac(p, pcm, 16000)
        back, sr = decode_flac(p)
        assert sr == 16000
        got = (back * 32768.0).round().astype(np.int32)
        np.testing.assert_array_equal(got, pcm)
        # rice-coded tonal audio must actually compress
        import os
        assert os.path.getsize(p) < len(pcm) * 2

    def test_stereo_and_noise_verbatim_path(self, ivec, tmp_path):
        from spoofsv_tpu.spoofkit.flacio import decode_flac, encode_flac
        rng = np.random.default_rng(3)
        # full-scale white noise forces the verbatim fallback
        noise = rng.integers(-32768, 32767, (5000, 2)).astype(np.int32)
        p = str(tmp_path / "s.flac")
        encode_flac(p, noise, 22050)
        back, sr = decode_flac(p)
        assert sr == 22050 and back.shape == (5000, 2)
        got = (back * 32768.0).round().astype(np.int32)
        np.testing.assert_array_equal(got, noise)

    def test_host_load_dispatch(self, ivec, tmp_path):
        from spoofsv_tpu.dsp import host
        pcm = self._tone(n=16000)
        p = str(tmp_path / "h.flac")
        host.write_flac(p, pcm.astype(np.float32) / 32767.0, 16000)
        y, sr = host.load_wav(p, sr=22050)
        assert sr == 22050 and len(y) == 22050
        assert np.isfinite(y).all() and np.abs(y).max() > 0.1

    def test_short_and_odd_lengths(self, ivec, tmp_path):
        from spoofsv_tpu.spoofkit.flacio import decode_flac, encode_flac
        for n in (1, 2, 3, 4095, 4096, 4097):
            pcm = (np.arange(n) % 251 - 125).astype(np.int32) * 100
            p = str(tmp_path / f"n{n}.flac")
            encode_flac(p, pcm, 16000)
            back, sr = decode_flac(p)
            got = (back * 32768.0).round().astype(np.int32)
            np.testing.assert_array_equal(got, pcm, err_msg=f"n={n}")


class _BitWriter:
    """MSB-first bit writer for hand-crafting FLAC frames in tests."""

    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.n = 0

    def bits(self, v, width):
        for i in range(width - 1, -1, -1):
            self.cur = (self.cur << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.n = 0

    def align(self):
        if self.n:
            self.bits(0, 8 - self.n)


class TestFlacLpcDecode:
    """Hand-crafted LPC subframe — the path real ASVspoof FLACs use (our
    encoder only emits FIXED/VERBATIM, so round-trips don't cover it)."""

    def test_lpc_order2_frame(self, ivec, tmp_path):
        from spoofsv_tpu.spoofkit.flacio import decode_flac
        bs = 16
        order, prec, shift = 2, 12, 10
        coefs = [900, -300]                    # Q10 fixed point
        warmup = [1000, 1010]
        residuals = [3, -2, 0, 5, -7, 1, 2, -1, 0, 4, -3, 2, 1, 0]

        # expected reconstruction
        x = list(warmup)
        for r in residuals:
            pred = (coefs[0] * x[-1] + coefs[1] * x[-2]) >> shift
            x.append(r + pred)

        w = _BitWriter()
        w.bytes += b"fLaC"
        # STREAMINFO (last block)
        w.bits(1, 1); w.bits(0, 7); w.bits(34, 24)
        w.bits(bs, 16); w.bits(bs, 16); w.bits(0, 24); w.bits(0, 24)
        w.bits(16000, 20); w.bits(0, 3); w.bits(15, 5)  # mono, 16-bit
        w.bits(bs, 36)
        for _ in range(16):
            w.bits(0, 8)
        # frame header: sync, fixed-bs, bs code 6 (8-bit), sr code 5 (16k)
        w.bits(0x3FFE, 14); w.bits(0, 1); w.bits(0, 1)
        w.bits(6, 4); w.bits(5, 4)
        w.bits(0, 4); w.bits(4, 3); w.bits(0, 1)        # mono, 16-bit
        w.bits(0, 8)                                    # frame number 0 (utf8)
        w.bits(bs - 1, 8)                               # 8-bit blocksize-1
        w.bits(0, 8)                                    # header CRC (ignored)
        # subframe: pad 0, type LPC order 2 (0b100001), no wasted bits
        w.bits(0, 1); w.bits(0x20 | (order - 1), 6); w.bits(0, 1)
        for v in warmup:
            w.bits(v & 0xFFFF, 16)
        w.bits(prec - 1, 4); w.bits(shift, 5)
        for c in coefs:
            w.bits(c & ((1 << prec) - 1), prec)
        # residual: method 0 (4-bit rice), partition order 0, param 4
        w.bits(0, 2); w.bits(0, 4); w.bits(4, 4)
        for r in residuals:
            zz = (-2 * r - 1) if r < 0 else 2 * r
            q, lo = zz >> 4, zz & 15
            for _ in range(q):
                w.bits(0, 1)
            w.bits(1, 1)
            w.bits(lo, 4)
        w.align()
        w.bits(0, 16)                                   # frame CRC (ignored)

        p = str(tmp_path / "lpc.flac")
        with open(p, "wb") as f:
            f.write(bytes(w.bytes))
        y, sr = decode_flac(p)
        assert sr == 16000
        got = np.round(np.asarray(y) * 32768.0).astype(int)
        np.testing.assert_array_equal(got, np.asarray(x))

    def test_left_side_stereo_frame(self, ivec, tmp_path):
        """left/side channel assignment with constant subframes."""
        from spoofsv_tpu.spoofkit.flacio import decode_flac
        bs, left, right = 8, 1200, 900
        side = left - right
        w = _BitWriter()
        w.bytes += b"fLaC"
        w.bits(1, 1); w.bits(0, 7); w.bits(34, 24)
        w.bits(bs, 16); w.bits(bs, 16); w.bits(0, 24); w.bits(0, 24)
        w.bits(16000, 20); w.bits(1, 3); w.bits(15, 5)  # stereo, 16-bit
        w.bits(bs, 36)
        for _ in range(16):
            w.bits(0, 8)
        w.bits(0x3FFE, 14); w.bits(0, 1); w.bits(0, 1)
        w.bits(6, 4); w.bits(5, 4)
        w.bits(8, 4); w.bits(4, 3); w.bits(0, 1)        # left/side
        w.bits(0, 8); w.bits(bs - 1, 8); w.bits(0, 8)
        # ch0 = left: CONSTANT 16-bit
        w.bits(0, 1); w.bits(0, 6); w.bits(0, 1); w.bits(left & 0xFFFF, 16)
        # ch1 = side: CONSTANT 17-bit (side channel gets +1 bit)
        w.bits(0, 1); w.bits(0, 6); w.bits(0, 1); w.bits(side & 0x1FFFF, 17)
        w.align()
        w.bits(0, 16)
        p = str(tmp_path / "ls.flac")
        with open(p, "wb") as f:
            f.write(bytes(w.bytes))
        y, sr = decode_flac(p)
        got = np.round(np.asarray(y) * 32768.0).astype(int)
        assert got.shape == (bs, 2)
        np.testing.assert_array_equal(got[:, 0], left)
        np.testing.assert_array_equal(got[:, 1], right)

    def test_24bit_and_unknown_length(self, ivec, tmp_path):
        """Review fixes: frame-header sample-size code follows `bits`, and
        unknown-length streams (STREAMINFO total_samples=0) decode fully."""
        from spoofsv_tpu.spoofkit.flacio import decode_flac, encode_flac
        pcm = (np.arange(5000) % 1000 - 500).astype(np.int32) * 4000
        p = str(tmp_path / "x24.flac")
        encode_flac(p, pcm, 16000, bits=24)
        y, _ = decode_flac(p)
        np.testing.assert_array_equal(
            np.round(np.asarray(y) * (1 << 23)).astype(np.int32), pcm)

        pcm16 = (np.arange(9000) % 251 - 125).astype(np.int32) * 100
        p2 = str(tmp_path / "u.flac")
        encode_flac(p2, pcm16, 16000)
        raw = bytearray(open(p2, "rb").read())
        base = 8                       # 4 magic + 4 metadata-block header
        raw[base + 13] &= 0xF0         # zero the 36-bit total_samples field
        raw[base + 14] = raw[base + 15] = raw[base + 16] = raw[base + 17] = 0
        open(p2, "wb").write(bytes(raw))
        y2, _ = decode_flac(p2)
        np.testing.assert_array_equal(
            np.round(np.asarray(y2) * 32768.0).astype(np.int32), pcm16)


class TestWebrtcVad:
    """Invariant tests for the native WebRTC VAD transcription
    (native/src/webrtc_vad.cc — the reference's webrtcvad.Vad classifier,
    GE2E/VAD_segments.py:93). Bit-comparison vs the wheel is pending
    (absent in this image); these pin structure and behavior."""

    @staticmethod
    def _speechy(sr, seconds=2.0, pitch=150.0, amp=0.4):
        t = np.arange(int(sr * seconds)) / sr
        sig = np.zeros_like(t)
        for h in range(1, 20):
            sig += np.sin(2 * np.pi * pitch * h * t) / h
        env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
        return (amp * sig / np.abs(sig).max() * env).astype(np.float32)

    def test_silence_and_speech(self, ivec):
        from spoofsv_tpu.spoofkit import vad

        sr = 16000
        assert vad.webrtc_classifier(np.zeros(sr, np.float32), sr).mean() == 0.0
        f = vad.webrtc_classifier(self._speechy(sr), sr)
        assert f.mean() > 0.9, f.mean()

    def test_quiet_noise_mostly_unvoiced(self, ivec):
        from spoofsv_tpu.spoofkit import vad

        sr = 16000
        rng = np.random.default_rng(0)
        y = (0.002 * rng.normal(size=2 * sr)).astype(np.float32)
        for mode in (2, 3):
            frac = vad.webrtc_classifier(y, sr, aggressiveness=mode).mean()
            assert frac < 0.2, (mode, frac)

    def test_aggressiveness_monotone(self, ivec):
        """Higher modes have higher thresholds -> never more voiced frames
        on the same signal."""
        from spoofsv_tpu.spoofkit import vad

        sr = 16000
        rng = np.random.default_rng(1)
        # borderline signal: weak speech in noise
        y = (0.5 * self._speechy(sr, amp=0.02)
             + (0.01 * rng.normal(size=2 * sr)).astype(np.float32))
        counts = [vad.webrtc_classifier(y, sr, aggressiveness=m).sum()
                  for m in range(4)]
        assert counts[0] >= counts[1] >= counts[2] >= counts[3], counts

    def test_deterministic_and_stateful(self, ivec):
        from spoofsv_tpu.spoofkit import vad

        sr = 16000
        y = self._speechy(sr, seconds=1.0)
        f1 = vad.webrtc_classifier(y, sr)
        f2 = vad.webrtc_classifier(y, sr)
        np.testing.assert_array_equal(f1, f2)

    def test_frame_validation(self, ivec):
        import ctypes

        from spoofsv_tpu.spoofkit.ivector import _load_lib

        lib = _load_lib()
        h = lib.sk_vad_new(2)
        buf = np.zeros(1000, np.int16)
        p = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
        try:
            assert lib.sk_vad_process(h, p, 320, 16000) >= 0   # 20 ms ok
            assert lib.sk_vad_process(h, p, 321, 16000) == -1  # bad length
            assert lib.sk_vad_process(h, p, 320, 44100) == -1  # bad rate
            assert lib.sk_vad_process(h, p, 160, 8000) >= 0    # 20 ms @ 8 kHz
        finally:
            lib.sk_vad_free(h)
        assert lib.sk_vad_new(7) in (None, 0)                  # bad mode

    def test_band_features(self, ivec):
        """Filterbank band mapping, incl. the upstream 2-4 kHz inversion
        quirk (see webrtc_vad.cc): a 600 Hz tone peaks in features[2]
        (500-1000 Hz); a 3.5 kHz tone peaks in features[4], NOT features[5],
        because the decimated high-pass branch is spectrally inverted and
        upstream's buffer assignment keeps it that way."""
        import ctypes

        from spoofsv_tpu.spoofkit.ivector import _load_lib

        lib = _load_lib()
        offsets = np.array([368, 368, 272, 176, 176, 176], np.int16)

        def feats_of(freq):
            tone = (0.5 * np.sin(2 * np.pi * freq * np.arange(240) / 8000)
                    * 32767).astype(np.int16)
            out = np.zeros(6, np.int16)
            tp = lib.sk_vad_features(
                tone.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), 240,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
            assert tp > 10   # loud tone exceeds the kMinEnergy gate
            return out - offsets

        assert np.argmax(feats_of(600)) == 2
        assert np.argmax(feats_of(150)) == 0
        assert np.argmax(feats_of(350)) == 1
        assert np.argmax(feats_of(1500)) == 3
        assert np.argmax(feats_of(3500)) == 4   # inversion quirk
        assert np.argmax(feats_of(2500)) == 5   # inversion quirk

    def test_total_energy_gate(self, ivec):
        import ctypes

        from spoofsv_tpu.spoofkit.ivector import _load_lib

        lib = _load_lib()
        out = np.zeros(6, np.int16)
        zeros = np.zeros(240, np.int16)
        tp = lib.sk_vad_features(
            zeros.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), 240,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
        assert tp == 0
        np.testing.assert_array_equal(
            out, np.array([368, 368, 272, 176, 176, 176]))  # offsets only

    def test_hangover_bridges_short_gap(self, ivec):
        """After >6 voiced frames, a short silence gap stays voiced (mode 2
        overhang: 5 frames at 20 ms), while long silence decays to 0."""
        import ctypes

        from spoofsv_tpu.spoofkit import vad
        from spoofsv_tpu.spoofkit.ivector import _load_lib

        sr = 16000
        speech = self._speechy(sr, seconds=1.0)
        gap = np.zeros(int(0.06 * sr), np.float32)       # 3 frames
        y = np.concatenate([speech, gap, speech])
        flags = vad.webrtc_classifier(y, sr, aggressiveness=2)
        n_sp = len(vad.webrtc_classifier(speech, sr))
        # the 3 gap frames ride the hangover
        assert flags[n_sp: n_sp + 3].all()

        lib = _load_lib()
        h = lib.sk_vad_new(2)
        pcm = vad.float_to_pcm16(np.concatenate(
            [speech, np.zeros(sr, np.float32)]))
        p = pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
        tail = []
        try:
            for off in range(0, len(pcm) - 320, 320):
                frame_p = ctypes.cast(
                    ctypes.addressof(p.contents) + off * 2,
                    ctypes.POINTER(ctypes.c_int16))
                tail.append(lib.sk_vad_process(h, frame_p, 320, 16000))
        finally:
            lib.sk_vad_free(h)
        assert tail[-1] == 0   # long silence eventually detriggers

    def test_collector_integration(self, ivec):
        """classifier='webrtc' flows through vad_chunk end to end."""
        from spoofsv_tpu.spoofkit import vad

        sr = 16000
        y = np.concatenate([np.zeros(sr // 2, np.float32),
                            self._speechy(sr, seconds=1.5),
                            np.zeros(sr // 2, np.float32)])
        chunks, spans = vad.vad_chunk(y, sr, classifier="webrtc")
        assert chunks and all(len(c) > 0 for c in chunks)
        assert spans[0][0] >= 0.2   # leading silence skipped
        with pytest.raises(ValueError, match="unknown VAD classifier"):
            vad.vad_chunk(y, sr, classifier="nope")
