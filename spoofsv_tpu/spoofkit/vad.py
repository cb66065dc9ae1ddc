"""Voice activity detection — host-native replacement for webrtcvad.

The reference depends on the webrtcvad C extension (``GE2E/VAD_segments.py``):
a frame generator, a 90 %-ring-buffer trigger collector, and 0.4 s chunking of
voiced segments. This re-implementation keeps the collector semantics (trigger
on ≥90 % voiced frames in a sliding window, release on ≥90 % unvoiced) on top
of an adaptive energy frame classifier, so `dvector_create` runs without the
native wheel.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def frame_generator(y: np.ndarray, sr: int, frame_ms: int = 20):
    """Yield (start_sample, frame) tuples of ``frame_ms`` frames
    (``GE2E/VAD_segments.py:47-60``)."""
    n = int(sr * frame_ms / 1000)
    offset = 0
    while offset + n <= len(y):
        yield offset, y[offset: offset + n]
        offset += n


def _energy_voiced_flags(y: np.ndarray, sr: int, frame_ms: int = 20,
                         aggressiveness: int = 2) -> Tuple[np.ndarray, int]:
    """Energy-based per-frame voiced decision with an adaptive threshold.

    aggressiveness 0..3 scales the threshold like webrtcvad's modes (higher =
    stricter = fewer voiced frames)."""
    n = int(sr * frame_ms / 1000)
    n_frames = len(y) // n
    if n_frames == 0:
        return np.zeros(0, bool), n
    frames = y[: n_frames * n].reshape(n_frames, n)
    e = np.sqrt(np.mean(frames.astype(np.float64) ** 2, axis=1) + 1e-12)
    log_e = 20 * np.log10(e + 1e-12)
    floor = np.percentile(log_e, 10)
    peak = np.percentile(log_e, 95)
    if peak - floor < 15.0:
        # no real silence floor in the recording (continuous audio) — treat
        # everything above an absolute hum floor as voiced
        thresh = min(floor, -55.0)
    else:
        frac = 0.25 + 0.15 * aggressiveness
        thresh = floor + frac * (peak - floor)
    return log_e >= thresh, n


def vad_collector(y: np.ndarray, sr: int, frame_ms: int = 20,
                  padding_ms: int = 200, aggressiveness: int = 2
                  ) -> List[Tuple[int, int]]:
    """Collect voiced (start, end) sample ranges with webrtc-style 90 %
    ring-buffer hysteresis (``GE2E/VAD_segments.py:63-130``)."""
    flags, n = _energy_voiced_flags(y, sr, frame_ms, aggressiveness)
    num_padding = max(1, padding_ms // frame_ms)
    ring: List[Tuple[int, bool]] = []
    triggered = False
    segments: List[Tuple[int, int]] = []
    start = 0
    for i, voiced in enumerate(flags):
        ring.append((i, bool(voiced)))
        if len(ring) > num_padding:
            ring.pop(0)
        if not triggered:
            if sum(1 for _, v in ring if v) > 0.9 * len(ring) and len(ring) == num_padding:
                triggered = True
                start = ring[0][0] * n
        else:
            if sum(1 for _, v in ring if not v) > 0.9 * len(ring):
                triggered = False
                segments.append((start, (i + 1) * n))
                ring = []
    if triggered:
        segments.append((start, len(flags) * n))
    return segments


def vad_chunk(y: np.ndarray, sr: int, chunk_s: float = 0.4,
              aggressiveness: int = 2) -> Tuple[List[np.ndarray], List[Tuple[float, float]]]:
    """Voiced audio split into ≤``chunk_s`` pieces with their time spans —
    the shape `dvector_create` consumes (``GE2E/VAD_segments.py:132-150``)."""
    segments = vad_collector(y, sr, aggressiveness=aggressiveness)
    chunks, spans = [], []
    step = int(chunk_s * sr)
    for s, e in segments:
        for cs in range(s, e, step):
            ce = min(cs + step, e)
            if ce - cs < int(0.02 * sr):
                continue
            chunks.append(y[cs:ce])
            spans.append((cs / sr, ce / sr))
    return chunks, spans
