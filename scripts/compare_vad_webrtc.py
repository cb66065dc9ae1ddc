#!/usr/bin/env python
"""Quantify the VAD stack against the webrtcvad wheel (optional dev dep).

The framework ships TWO frame classifiers under an exact transcription of
the reference's ring-buffer collector (``spoofsv_tpu/spoofkit/vad.py``):
the native transcription of WebRTC's fixed-point GMM detector
(``classifier="webrtc"``, native/src/webrtc_vad.cc) and an adaptive energy
detector (``classifier="energy"``). The collector half is golden-tested
(tests/test_spoofkit.py::TestVadCollectorParity); this script measures the
classifier half:

  * with the webrtcvad wheel installed — per-frame agreement (%) and
    collected-segment IoU of the NATIVE transcription vs ``Vad(2)`` (the
    fidelity number the transcription is waiting on), plus the energy
    detector's agreement for context;
  * without the wheel (this image does not ship it) — native-vs-energy
    agreement only, as an informational divergence bound, exit 0.

Run: ``python scripts/compare_vad_webrtc.py [n_utts]``.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spoofsv_tpu.spoofkit.vad import (  # noqa: E402
    collect_from_flags, energy_classifier, float_to_pcm16, webrtc_classifier)


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
        webrtcvad = None

    n_utts = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sr, frame_ms = 16000, 20
    n = sr * frame_ms // 1000
    rng = np.random.default_rng(0)

    def run(pair_name, flags_a_fn, flags_b_fn):
        agree, ious = [], []
        for snr in (35.0, 25.0, 15.0):
            for _ in range(n_utts):
                y = synth_utterance(rng, sr=sr, snr_db=snr)
                a = flags_a_fn(y)
                b = flags_b_fn(y)[: len(a)]
                agree.append(float(np.mean(a == b)))
                ma = segments_to_mask(collect_from_flags(a, n, 10), len(y))
                mb = segments_to_mask(collect_from_flags(b, n, 10), len(y))
                union = np.logical_or(ma, mb).sum()
                ious.append(float(np.logical_and(ma, mb).sum() / union)
                            if union else 1.0)
            print(f"[{pair_name}] SNR {snr:4.0f} dB: frame agreement "
                  f"{100 * np.mean(agree[-n_utts:]):5.1f}%, "
                  f"segment IoU {np.mean(ious[-n_utts:]):.3f}")
        print(f"[{pair_name}] overall: frame agreement "
              f"{100 * np.mean(agree):5.1f}%, segment IoU {np.mean(ious):.3f}")

    def native_flags(y):
        return webrtc_classifier(y, sr, frame_ms, aggressiveness=2)

    def energy_flags(y):
        return energy_classifier(y, sr, frame_ms)

    if webrtcvad is None:
        print("webrtcvad not installed — wheel comparison pending; the "
              "native transcription's invariants are tested in "
              "tests/test_native.py::TestWebrtcVad. Reporting "
              "native-vs-energy divergence for context:")
        run("native-vs-energy", native_flags, energy_flags)
        return

    def wheel_flags(y):
        # fresh detector per utterance: webrtcvad's GMM adapts over a
        # stream, and the native side constructs a new detector per call —
        # sharing one Vad across utterances would report adaptation-state
        # drift as transcription divergence
        vad = webrtcvad.Vad(2)
        pcm = float_to_pcm16(y).tobytes()
        n_frames = max(0, (len(y) - 1) // n)
        return np.asarray([
            vad.is_speech(pcm[2 * i * n: 2 * (i + 1) * n], sr)
            for i in range(n_frames)], bool)

    run("native-vs-wheel", native_flags, wheel_flags)
    run("energy-vs-wheel", energy_flags, wheel_flags)


if __name__ == "__main__":
    main()
