#!/usr/bin/env python
"""Quantify the VAD substitution against webrtcvad (optional dev dependency).

The framework replaces the reference's webrtcvad C extension
(``GE2E/VAD_segments.py:17,132``) with an adaptive energy frame classifier
under an exact transcription of the reference's ring-buffer collector
(``spoofsv_tpu/spoofkit/vad.py``). The collector half is golden-tested
(tests/test_spoofkit.py::TestVadCollectorParity); this script measures the
remaining divergence — the frame classifier — when the webrtcvad wheel is
installed:

  * per-frame decision agreement (%) between webrtcvad mode-2 and the energy
    classifier on synthetic speech-like utterances at several SNRs;
  * voiced-sample overlap (IoU) of the final collected segments.

Without webrtcvad (this image does not ship it) the script prints a skip
notice and exits 0. Run: ``python scripts/compare_vad_webrtc.py [n_utts]``.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spoofsv_tpu.spoofkit.vad import (  # noqa: E402
    collect_from_flags, energy_classifier)


def synth_utterance(rng, sr=16000, seconds=3.0, snr_db=25.0):
    """Speech-like test signal: AM harmonic bursts separated by noise gaps."""
    n = int(seconds * sr)
    y = np.zeros(n, np.float32)
    t0 = int(0.3 * sr)
    while t0 < n - sr // 2:
        dur = int(rng.uniform(0.3, 0.8) * sr)
        dur = min(dur, n - t0)
        t = np.arange(dur) / sr
        f0 = rng.uniform(120, 280)
        burst = sum((0.5 / h) * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6))
                    for h in (1, 2, 3))
        burst *= 1 + 0.5 * np.sin(2 * np.pi * rng.uniform(2, 6) * t)
        y[t0: t0 + dur] += burst.astype(np.float32)
        t0 += dur + int(rng.uniform(0.25, 0.7) * sr)
    noise = rng.normal(size=n).astype(np.float32)
    sig_rms = np.sqrt(np.mean(y ** 2) + 1e-12)
    noise_rms = sig_rms / (10 ** (snr_db / 20))
    return 0.6 * (y + noise_rms * noise / np.sqrt(np.mean(noise ** 2)))


def segments_to_mask(segments, n):
    m = np.zeros(n, bool)
    for s, e in segments:
        m[s:e] = True
    return m


def main():
    try:
        import webrtcvad
    except ImportError:
        print("webrtcvad not installed — skipping comparison (the collector "
              "half is exact; see tests/test_spoofkit.py::TestVadCollectorParity)")
        return

    n_utts = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sr, frame_ms = 16000, 20
    n = sr * frame_ms // 1000
    vad = webrtcvad.Vad(2)
    rng = np.random.default_rng(0)

    agree, ious = [], []
    for snr in (35.0, 25.0, 15.0):
        for _ in range(n_utts):
            y = synth_utterance(rng, sr=sr, snr_db=snr)
            n_frames = max(0, (len(y) - 1) // n)
            pcm = np.clip(y * 32767, -32768, 32767).astype("<i2").tobytes()
            web_flags = np.asarray([
                vad.is_speech(pcm[2 * i * n: 2 * (i + 1) * n], sr)
                for i in range(n_frames)], bool)
            e_flags = energy_classifier(y, sr, frame_ms)[:n_frames]
            agree.append(float(np.mean(web_flags == e_flags)))
            w = segments_to_mask(collect_from_flags(web_flags, n, 10), len(y))
            e = segments_to_mask(collect_from_flags(e_flags, n, 10), len(y))
            union = np.logical_or(w, e).sum()
            ious.append(float(np.logical_and(w, e).sum() / union)
                        if union else 1.0)
        print(f"SNR {snr:4.0f} dB: frame agreement "
              f"{100 * np.mean(agree[-n_utts:]):5.1f}%, "
              f"segment IoU {np.mean(ious[-n_utts:]):.3f}")
    print(f"overall: frame agreement {100 * np.mean(agree):5.1f}%, "
          f"segment IoU {np.mean(ious):.3f}")


if __name__ == "__main__":
    main()
