"""Spoofkit unit tests: EER sweep goldens, curves, VAD, d-vector alignment."""

import os

import jax
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


class TestCmFeatureCache:
    def test_second_access_hits_cache(self, tmp_path, monkeypatch):
        """ASVspoofSource caches features (the reference recomputes
        load->STFT->mel from disk every epoch, data/dataset.py-style gap);
        a second epoch must cost zero decode/STFT work."""
        from spoofsv_tpu.config import Config
        from spoofsv_tpu.dsp import host as dsp_host
        from spoofsv_tpu.spoofkit.antispoof import ASVspoofSource

        root = tmp_path
        os.makedirs(root / "data_path" / "ordinary")
        sr = 16000
        rng = np.random.default_rng(0)
        wavs = []
        for i in range(3):
            p = str(root / f"utt{i}.wav")
            y = 0.3 * np.sin(2 * np.pi * (220 + 40 * i)
                             * np.arange(sr // 2) / sr)
            dsp_host.write_wav(p, (y + 0.01 * rng.normal(size=y.size)
                                   ).astype(np.float32), sr)
            wavs.append(p)
        (root / "data_path" / "ordinary" / "wav.path.train").write_text(
            "\n".join(wavs) + "\n")
        cfg = Config().replace(data_root_dir=str(root) + "/",
                               src_root_dir=str(root) + "/",
                               antispoof_dir=str(root / "nope") + "/")

        src = ASVspoofSource(cfg, "train", "t",
                             cache_dir=str(root / "cm_spec"))
        first = [src.get(i, "mel")[0] for i in range(len(src))]

        calls = {"n": 0}
        orig = ASVspoofSource._compute

        def counting(self, idx):
            calls["n"] += 1
            return orig(self, idx)

        monkeypatch.setattr(ASVspoofSource, "_compute", counting)
        second = [src.get(i, "mel")[0] for i in range(len(src))]
        assert calls["n"] == 0, "second epoch must not recompute features"
        for a, b in zip(first, second):
            np.testing.assert_array_equal(a, b)
        # other feature kind computes once, then caches too
        _ = [src.get(i, "lin")[0] for i in range(len(src))]
        assert calls["n"] == len(src)
        _ = [src.get(i, "lin")[0] for i in range(len(src))]
        assert calls["n"] == len(src)


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


class TestNospoofStagedEquivalence:
    """The staged test_nospoof pass (own preprocess + simmat,
    GE2E/train_speech_embedder.py:205-298) must agree with the slice fast
    path. The fast path slices the verification EMBEDDINGS before the cossim
    — slicing the mixed simmat is wrong because the reference ``get_cossim``
    (GE2E/utils.py:36-46) builds own-speaker diagonals from the verification
    set's leave-one-out mean, which a mixed (real+spoof) verification set
    contaminates (the round-2 campaign measured 0.50 vs 0.80 on the
    adversarial staging from exactly this)."""

    def test_simmat_slice_is_not_embedding_slice(self):
        """Regression for the r2 campaign divergence: own-diagonals of a
        sliced mixed simmat differ from the real-only cossim whenever spoof
        embeddings shift the leave-one-out mean; off-diagonals agree."""
        from spoofsv_tpu.spoofkit import ge2e_harness as gh

        rng = np.random.default_rng(0)
        n, es1, v_real, v_spoof, d = 4, 2, 6, 6, 8

        def unit(x):
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        base = unit(rng.normal(size=(n, 1, d)))
        e_enroll = unit(base + 0.1 * rng.normal(size=(n, es1, d))).astype(np.float32)
        real = unit(base + 0.1 * rng.normal(size=(n, v_real, d)))
        spoof = unit(-base + 0.1 * rng.normal(size=(n, v_spoof, d)))  # far mode
        e_verif = np.concatenate([real, spoof], axis=1).astype(np.float32)

        sim_mixed = gh.sim_from_embeddings(e_verif, e_enroll)
        sim_real = gh.sim_from_embeddings(e_verif[:, :v_real], e_enroll)

        own_sliced = np.stack([sim_mixed[j, :v_real, j] for j in range(n)])
        own_fast = np.stack([sim_real[j, :, j] for j in range(n)])
        assert np.abs(own_sliced - own_fast).max() > 0.1, \
            "spoof rows must shift the mixed leave-one-out diagonal"
        # impostor entries are driven by enrollment centroids only → equal
        for j in range(n):
            for k in range(n):
                if j != k:
                    np.testing.assert_allclose(sim_mixed[j, :v_real, k],
                                               sim_real[j, :, k], atol=1e-6)

    def test_staged_matches_slice(self, tmp_path):
        import dataclasses
        import os

        import jax

        from spoofsv_tpu.config import GE2EConfig
        from spoofsv_tpu.dsp import host as dsp_host
        from spoofsv_tpu.models.ge2e import SpeechEmbedder
        from spoofsv_tpu.spoofkit import ge2e_harness as gh

        sr = 16000
        enroll, ev = 1, 2
        n_real, n_spoof = enroll + ev, ev
        work = str(tmp_path)
        mixed_root = os.path.join(work, "ge2e_data")
        ns_root = os.path.join(work, "test_nospoof")
        t = np.arange(int(1.6 * sr)) / sr
        for s, sid in enumerate(("901", "902")):
            os.makedirs(os.path.join(mixed_root, sid))
            os.makedirs(os.path.join(ns_root, sid))
            for j in range(n_real + n_spoof):
                f = 300.0 + 150 * s + 37 * j
                y = (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)
                name = f"{sid}W{str(j + 1).zfill(3)}.wav"
                dsp_host.write_wav(os.path.join(mixed_root, sid, name), y, sr)
                if j < n_real:
                    dsp_host.write_wav(os.path.join(ns_root, sid, name), y, sr)

        ge2e = GE2EConfig()
        ge2e = dataclasses.replace(
            ge2e,
            unprocessed_data=os.path.join(mixed_root, "*", "*.wav"),
            save_simmat_dir=os.path.join(work, "simmat"),
            data=dataclasses.replace(
                ge2e.data, train_path=os.path.join(work, "tisv_train"),
                test_path=os.path.join(work, "tisv_test")),
            model=dataclasses.replace(ge2e.model, hidden=8, num_layer=1,
                                      proj=4),
            test=dataclasses.replace(ge2e.test, N=2,
                                     M=2 * (n_real + n_spoof), epochs=1))
        gh.save_spectrogram_tisv(ge2e, train_spk_num=0, enroll_num=n_real,
                                 eval_num=n_spoof, seed=0, verbose=False)

        # data-level equivalence: the staged copy's crops ARE the first
        # 2·(enroll+eval) crops of the mixed preprocess, in the same order
        ns_path = gh.preprocess_nospoof_tisv(
            ge2e, os.path.join(ns_root, "*", "*.wav"), enroll, ev,
            seed=0, verbose=False)
        for k in range(2):
            mixed = np.load(os.path.join(ge2e.data.test_path,
                                         f"speaker{k}.npy"))
            staged = np.load(os.path.join(ns_path, f"speaker{k}.npy"))
            np.testing.assert_array_equal(mixed[: 2 * n_real], staged)

        embedder = SpeechEmbedder(hidden=8, num_layers=1, proj=4)
        import jax.numpy as jnp
        params = {"embedder": embedder.init(
            jax.random.PRNGKey(0), jnp.zeros((2, ge2e.data.tisv_frame,
                                              ge2e.data.nmels)))}
        ck = os.path.join(work, "emb.npz")
        gh._save_ge2e_ckpt(params, work, "emb.npz")

        res = gh.run_ge2e_evaluation(
            ge2e, enroll_num=enroll, eval_num=ev, model_path=ck,
            epochs=1, verbose=False,
            nospoof_data=os.path.join(ns_root, "*", "*.wav"), seed=0)
        # identical crops through identical math (the fast path re-runs the
        # cossim on the real-only embeddings) → exactly equal thresholds
        assert res["clean_threshold"] == res["clean_threshold_slice"]
        for k in ("EER", "spoof_rate", "gt_FRR"):
            assert np.isfinite(res[k])

        # slice-only fast path: same mixed metrics, slice threshold
        res_slice = gh.run_ge2e_evaluation(
            ge2e, enroll_num=enroll, eval_num=ev, model_path=ck,
            epochs=1, verbose=False)
        assert res_slice["clean_threshold"] == res["clean_threshold_slice"]
        assert res_slice["EER"] == res["EER"]


class TestDeviceSpeakerBank:
    """The device-resident GE2E training path must be loss-curve-identical to
    the host SpeakerBatcher path (same rng sequence, same crops, same step)."""

    def _make_tisv(self, d, n_spk=4, n_crops=6, t=16, f=8):
        rng = np.random.default_rng(1)
        os.makedirs(d, exist_ok=True)
        for s in range(n_spk):
            # stored layout is (U, nmels, frames) like save_spectrogram_tisv
            np.save(os.path.join(d, f"speaker{s}.npy"),
                    rng.normal(size=(n_crops + s, f, t)).astype(np.float32))

    def test_sampling_matches_host_batcher(self, tmp_path):
        from spoofsv_tpu.spoofkit.ge2e_harness import (DeviceSpeakerBank,
                                                       SpeakerBatcher)

        d = str(tmp_path / "tisv")
        self._make_tisv(d)
        host = SpeakerBatcher(d, 3, shuffle=True, seed=7)
        dev = DeviceSpeakerBank(d, 3, seed=7)
        for _ in range(4):
            hb = host.sample_batch(2)                      # (N, M, T, F)
            db = np.asarray(dev.sample_batch(2)).reshape(hb.shape)
            np.testing.assert_array_equal(hb, db)

    def test_train_ge2e_device_equals_host(self, tmp_path):
        import dataclasses

        from spoofsv_tpu.config import GE2EConfig
        from spoofsv_tpu.spoofkit import ge2e_harness as gh

        d = str(tmp_path / "tisv")
        self._make_tisv(d)
        ge2e = GE2EConfig()
        results = {}
        for tag, device_data in (("host", False), ("dev", True)):
            ck = str(tmp_path / f"ck_{tag}")
            g = dataclasses.replace(
                ge2e,
                data=dataclasses.replace(ge2e.data, train_path=d),
                model=dataclasses.replace(ge2e.model, hidden=8, num_layer=1,
                                          proj=4),
                train=dataclasses.replace(ge2e.train, N=2, M=3, epochs=2,
                                          checkpoint_interval=1000,
                                          checkpoint_dir=ck, log_file=None))
            params = gh.train_ge2e(g, max_epochs=2, seed=3, verbose=False,
                                   device_data=device_data)
            results[tag] = jax.tree_util.tree_leaves(params)
        for a, b in zip(results["host"], results["dev"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


class TestVadCollectorParity:
    """collect_from_flags is an exact transcription of the reference's
    ring-buffer collector (GE2E/VAD_segments.py:63-130): golden-test it
    against a direct deque/Frame re-enactment under randomized frame
    decisions, so the only VAD divergence left is the frame classifier
    itself (webrtcvad GMM vs our energy detector)."""

    @staticmethod
    def _reference_collector(flags, frame_s, num_padding):
        import collections

        class Frame:
            def __init__(self, timestamp, duration):
                self.timestamp = timestamp
                self.duration = duration

        frames = [Frame(i * frame_s, frame_s) for i in range(len(flags))]
        ring_buffer = collections.deque(maxlen=num_padding)
        triggered = False
        voiced_frames = []
        out = []
        start = None
        frame = None
        for frame, is_speech in zip(frames, flags):
            if not triggered:
                ring_buffer.append((frame, is_speech))
                num_voiced = len([f for f, s in ring_buffer if s])
                if num_voiced > 0.9 * ring_buffer.maxlen:
                    triggered = True
                    start = ring_buffer[0][0].timestamp
                    for f, s in ring_buffer:
                        voiced_frames.append(f)
                    ring_buffer.clear()
            else:
                voiced_frames.append(frame)
                ring_buffer.append((frame, is_speech))
                num_unvoiced = len([f for f, s in ring_buffer if not s])
                if num_unvoiced > 0.9 * ring_buffer.maxlen:
                    triggered = False
                    out.append((start, frame.timestamp + frame.duration))
                    ring_buffer.clear()
                    voiced_frames = []
        if voiced_frames:
            out.append((start, frame.timestamp + frame.duration))
        return out

    def test_randomized_flag_sequences(self):
        from spoofsv_tpu.spoofkit.vad import collect_from_flags

        rng = np.random.default_rng(0)
        n = 320                      # 20 ms @ 16 kHz
        frame_s = 0.02
        for trial in range(200):
            num_padding = int(rng.integers(2, 14))
            length = int(rng.integers(0, 120))
            p_voiced = rng.uniform(0.2, 0.9)
            flags = rng.random(length) < p_voiced
            got = collect_from_flags(flags, n, num_padding)
            want = self._reference_collector(flags.tolist(), frame_s,
                                             num_padding)
            want_samples = [(int(round(s / frame_s)) * n,
                             int(round(e / frame_s)) * n) for s, e in want]
            assert got == want_samples, (trial, num_padding, length)

    def test_structured_sequences(self):
        from spoofsv_tpu.spoofkit.vad import collect_from_flags

        cases = [
            [],                                  # empty
            [True] * 30,                         # always voiced → leftover
            [False] * 30,                        # never voiced
            [True] * 12 + [False] * 12,          # one island, detrigger
            [False] * 5 + [True] * 10 + [False] * 12 + [True] * 10,
        ]
        for flags in cases:
            got = collect_from_flags(np.asarray(flags, bool), 320, 10)
            want = self._reference_collector(flags, 0.02, 10)
            want_samples = [(int(round(s / 0.02)) * 320,
                             int(round(e / 0.02)) * 320) for s, e in want]
            assert got == want_samples, flags
