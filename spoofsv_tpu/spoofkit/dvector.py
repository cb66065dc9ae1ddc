"""d-vector creation for diarization-style consumers (uis-rnn format).

Re-design of ``GE2E/dvector_create.py:24-122``: VAD-chunked 240 ms sliding
windows → batched embedder forward (one jitted call per utterance instead of a
per-window Python loop) → time-aligned averaged segment embeddings, saved as
``train_sequence.npy`` / ``train_cluster_id.npy``.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Tuple

import numpy as np

from spoofsv_tpu.config import GE2EConfig
from spoofsv_tpu.dsp import host as dsp_host
from spoofsv_tpu.spoofkit.vad import vad_chunk


def concat_segs(times: List[Tuple[float, float]],
                segs: List[np.ndarray]) -> Tuple[List[np.ndarray], List[Tuple[float, float]]]:
    """Merge adjacent VAD chunks into continuous segments
    (``GE2E/dvector_create.py:24-39``)."""
    if not segs:
        return [], []
    concat_seg, seg_times = [], []
    cur = segs[0]
    cur_t = list(times[0])
    for t, s in zip(times[1:], segs[1:]):
        if abs(t[0] - cur_t[1]) < 1e-6:
            cur = np.concatenate([cur, s])
            cur_t[1] = t[1]
        else:
            concat_seg.append(cur)
            seg_times.append(tuple(cur_t))
            cur = s
            cur_t = list(t)
    concat_seg.append(cur)
    seg_times.append(tuple(cur_t))
    return concat_seg, seg_times


def get_stfts(segs: List[np.ndarray], ge2e: GE2EConfig,
              window_s: float = 0.24, hop_frac: float = 0.5
              ) -> List[np.ndarray]:
    """Sliding 240 ms log-mel windows per segment
    (``GE2E/dvector_create.py:42-59``). Each window → (frames, nmels)."""
    d = ge2e.data
    out = []
    win = int(window_s * d.sr)
    step = int(win * hop_frac)
    for seg in segs:
        for s in range(0, max(1, len(seg) - win + 1), step):
            piece = seg[s: s + win]
            if len(piece) < win:
                break
            S = dsp_host.ge2e_logmel(piece, d.sr, d.nfft, d.window, d.hop, d.nmels)
            out.append(S.T.astype(np.float32))
    return out


def align_embeddings(embeddings: np.ndarray) -> np.ndarray:
    """Average consecutive window pairs into aligned segment embeddings
    (``GE2E/dvector_create.py:62-85``)."""
    partitions = []
    start, end = 0, len(embeddings)
    i = 0
    while start + 2 <= end:
        partitions.append((start, start + 2))
        start += 1
        i += 1
    if not partitions:
        partitions = [(0, len(embeddings))]
    avg = np.stack([embeddings[s:e].mean(axis=0) for s, e in partitions])
    return avg


def create_dvectors(ge2e: GE2EConfig, embedder, params,
                    pattern: Optional[str] = None, out_dir: str = ".",
                    min_va: float = 0.05, verbose: bool = True,
                    vad_classifier=None
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Build uis-rnn-compatible (train_sequence, train_cluster_id) arrays.

    ``vad_classifier``: None → the default ("webrtc", the native
    transcription of the detector the reference uses,
    dvector_create.py:92 -> VAD_chunk(2, ...)), "energy", or a callable.
    """
    import jax.numpy as jnp

    pattern = pattern or ge2e.unprocessed_data
    files = sorted(glob.glob(pattern))
    sequences, cluster_ids = [], []
    for path in files:
        y, sr = dsp_host.load_wav(path, sr=ge2e.data.sr)
        chunks, spans = vad_chunk(y, sr, classifier=vad_classifier)
        if sum(len(c) for c in chunks) < min_va * sr:
            continue
        segs, _ = concat_segs(spans, chunks)
        windows = get_stfts(segs, ge2e)
        if not windows:
            continue
        batch = jnp.asarray(np.stack(windows))
        emb = np.asarray(embedder.apply(params, batch))
        aligned = align_embeddings(emb)
        sequences.append(aligned)
        spk = os.path.basename(os.path.dirname(path))
        cluster_ids.append([spk] * len(aligned))
        if verbose:
            print(path, "→", aligned.shape)
    if sequences:
        train_sequence = np.concatenate(sequences, axis=0)
        train_cluster_id = np.asarray(
            [c for ids in cluster_ids for c in ids])
    else:
        train_sequence = np.zeros((0, embedder.proj), np.float32)
        train_cluster_id = np.zeros((0,), dtype="<U16")
    np.save(os.path.join(out_dir, "train_sequence.npy"), train_sequence)
    np.save(os.path.join(out_dir, "train_cluster_id.npy"), train_cluster_id)
    return train_sequence, train_cluster_id
