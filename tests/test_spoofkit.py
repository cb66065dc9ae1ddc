"""Spoofkit unit tests: EER sweep goldens, curves, VAD, d-vector alignment."""

import numpy as np
import pytest

from spoofsv_tpu.spoofkit.antispoof import cm_eer
from spoofsv_tpu.spoofkit.curve import ivector_curve
from spoofsv_tpu.spoofkit.dvector import align_embeddings, concat_segs
from spoofsv_tpu.spoofkit.ge2e_harness import eer_sweep, spoof_rate_at_threshold
from spoofsv_tpu.spoofkit.vad import vad_chunk, vad_collector


def _reference_eer_sweep(sim, enroll_num):
    """Direct transcription of GE2E/train_speech_embedder.py:174-196."""
    N, n_verif, _ = sim.shape
    es1 = 2 * enroll_num
    size_1 = n_verif + es1
    diff, EER, EER_thresh, gt_FRR, SPOOF_RATE = 1, 0, 0, 0, 0
    for i in range(50):
        thres = 0.01 * i + 0.5
        t = sim > thres
        FAR = sum(t[j].sum() - t[j, :, j].sum() for j in range(N)) / (N - 1.0) / float(size_1 - es1) / N
        FRR = sum(size_1 - es1 - t[j, :, j].sum() for j in range(N)) / float(size_1 - es1) / N
        gtfrr = sum(size_1 // 2 - es1 // 2 - t[j, :(size_1 - es1) // 2, j].sum()
                    for j in range(N)) / float(size_1 / 2 - es1 / 2) / N
        sr = sum(t[j, -(size_1 - es1) // 2:, j].sum()
                 for j in range(N)) / float(size_1 / 2 - es1 / 2) / N
        if diff > abs(FAR - FRR):
            diff = abs(FAR - FRR)
            EER = (FAR + FRR) / 2
            EER_thresh = thres
            gt_FRR = gtfrr
            SPOOF_RATE = sr
    return EER, EER_thresh, gt_FRR, SPOOF_RATE


class TestEERSweep:
    def test_matches_reference_formulas(self):
        rng = np.random.default_rng(0)
        n, enroll, eval_n = 4, 3, 5
        n_verif = 2 * eval_n * 2          # real + spoof halves
        sim = rng.uniform(0.3, 1.0, (n, n_verif, n))
        # boost diagonal of the real half so it behaves like a verifier
        for j in range(n):
            sim[j, : n_verif // 2, j] += 0.15
        sim = np.clip(sim, 0, 1.2)
        ours = eer_sweep(sim, enroll, with_spoof=True)
        ref_eer, ref_thr, ref_gtfrr, ref_sr = _reference_eer_sweep(sim, enroll)
        assert abs(ours["EER"] - ref_eer) < 1e-9
        assert abs(ours["thresh"] - ref_thr) < 1e-9
        assert abs(ours["gt_FRR"] - ref_gtfrr) < 1e-9
        assert abs(ours["spoof_rate"] - ref_sr) < 1e-9

    def test_spoof_rate_at_threshold_matches_reference(self):
        """Transcription of train_speech_embedder.py:313-321."""
        rng = np.random.default_rng(1)
        n, eval_n = 3, 4
        sim = rng.uniform(0, 1, (n, 4 * eval_n, n))
        thr = 0.55
        ours = spoof_rate_at_threshold(sim, thr, eval_n)
        t = sim > thr
        ref = sum(t[i, -2 * eval_n:, i].sum() for i in range(n)) / float(2 * eval_n) / n
        assert abs(ours - ref) < 1e-12

    def test_perfect_verifier(self):
        """NB: faithful to the reference's mixed-set FRR, which counts rejected
        SPOOF targets as rejections too — so a perfect verifier (all real
        accepted, all spoof rejected) floors at FRR=0.5 → EER=0.25, while
        gt_FRR (real-only) and spoof rate are both 0
        (GE2E/train_speech_embedder.py:180,184-185)."""
        n, enroll = 3, 2
        sim = np.full((n, 8, n), 0.2)
        for j in range(n):
            sim[j, :4, j] = 0.95        # real targets high
            sim[j, 4:, j] = 0.3         # spoof targets low
        r = eer_sweep(sim, enroll)
        assert abs(r["EER"] - 0.25) < 1e-9
        assert r["spoof_rate"] == 0.0
        assert r["gt_FRR"] == 0.0


class TestCurves:
    def test_ivector_curve_parsing(self, tmp_path):
        # trial format "<espk> <tspk>W<idx> <score>": idx>23 & espk==tspk → spoof
        lines = [
            "301 301W005 4.2",     # real target
            "301 301W030 1.0",     # spoof target (idx 30 > 23)
            "301 302W005 -3.0",    # nontarget (ignored)
        ]
        p = tmp_path / "scores.txt"
        p.write_text("\n".join(lines) + "\n")
        srs, frrs = ivector_curve(str(p), thresholds=np.asarray([0.0, 2.0, 5.0]))
        assert srs == [1.0, 0.0, 0.0]         # spoof above threshold
        assert frrs == [0.0, 0.0, 1.0]        # real rejected only at 5.0


class TestCmEer:
    def test_separable(self):
        labels = np.asarray([1, 1, 1, 0, 0, 0])
        scores = np.asarray([0.9, 0.8, 0.7, 0.2, 0.1, 0.3])
        eer, thr = cm_eer(labels, scores)
        assert eer < 0.2
        assert 0.3 <= thr <= 0.7


class TestVad:
    def test_detects_speech_island(self):
        sr = 16000
        rng = np.random.default_rng(2)
        t = np.arange(sr // 2) / sr
        speech = (0.5 * np.sin(2 * np.pi * 220 * t)
                  * (1 + 0.5 * np.sin(2 * np.pi * 4 * t))).astype(np.float32)
        sig = np.concatenate([
            0.001 * rng.normal(size=sr).astype(np.float32), speech,
            0.001 * rng.normal(size=sr).astype(np.float32)])
        segs = vad_collector(sig, sr)
        assert len(segs) >= 1
        s, e = segs[0][0], segs[-1][1]
        assert sr * 0.5 < s < sr * 1.2
        assert sr * 1.3 < e < sr * 2.1

    def test_chunking(self):
        sr = 16000
        t = np.arange(sr) / sr
        y = (0.5 * np.sin(2 * np.pi * 300 * t)
             * (1 + 0.4 * np.sin(2 * np.pi * 5 * t))).astype(np.float32)
        chunks, spans = vad_chunk(y, sr, chunk_s=0.4)
        assert chunks
        assert all(len(c) <= int(0.4 * sr) for c in chunks)
        assert len(chunks) == len(spans)


class TestDvector:
    def test_concat_adjacent(self):
        segs = [np.ones(10), np.ones(5), np.ones(7)]
        times = [(0.0, 1.0), (1.0, 1.5), (3.0, 3.7)]
        merged, spans = concat_segs(times, segs)
        assert len(merged) == 2
        assert len(merged[0]) == 15 and spans[0] == (0.0, 1.5)

    def test_align_embeddings(self):
        e = np.arange(10, dtype=np.float32).reshape(5, 2)
        a = align_embeddings(e)
        assert a.shape == (4, 2)
        np.testing.assert_allclose(a[0], e[:2].mean(0))
