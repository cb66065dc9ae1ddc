"""Anti-spoofing countermeasure (CM) subsystem: dataset, train, score.

Re-design of ``anti_spoofing/spoof_conv1d.py`` + ``anti_spoofing/main_spoof_conv1d.py``:
binary bonafide/spoof classification on the TTS mel features with a
sigmoid-output Critic1D, trained with BCE and Adam(amsgrad, wd 1e-4), scored
into an ASVspoof-format file. The reference's ``melDisc_v1/v2`` variants have
broken constructors (``anti_spoofing/discriminator.py:136,176`` call
``super(melDisc, ...)`` — SURVEY §7.4); here the pooling variants are honest
config knobs on :class:`spoofsv_tpu.models.discriminator.Critic1D`.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from spoofsv_tpu.config import Config
from spoofsv_tpu.dsp import host as dsp_host


class ASVspoofSource:
    """Bonafide + spoof utterance list with TTS-style mel features at 16 kHz
    (``anti_spoofing/spoof_conv1d.py:9-68``).

    train: first 20k utterances of the TTS train list (bonafide) + ASVspoof2019
    LA train spoofs; dev: remaining bonafide + the generated
    ``customized_data_<ctime>.txt`` spoof protocol.
    """

    def __init__(self, cfg: Config, step: str, ctime: str,
                 bonafide_cap: int = 20000,
                 cache_dir: Optional[str] = "auto"):
        """``cache_dir``: feature cache directory (``"auto"`` →
        ``<src_root>/cm_spec``, ``None`` → disabled). The reference recomputes
        load→trim→STFT→mel from disk every epoch
        (``anti_spoofing/spoof_conv1d.py:44-68`` has no cache; the r2 campaign
        CM stage spent 1643 s mostly here) — this mirrors the TTS pipeline's
        atomic ``.npy`` cache instead."""
        self.cfg = cfg
        if cache_dir == "auto":
            cache_dir = os.path.join(cfg.src_root_dir, "cm_spec")
        self.cache_dir = cache_dir
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
        proto_fn = os.path.join(cfg.data_root_dir, "data_path", "ordinary",
                                "wav.path.train")
        with open(proto_fn) as f:
            audio_fn = [l.strip() for l in f if l.strip()]
        if step == "train":
            self.files = audio_fn[:bonafide_cap]
            suffix = "ASVspoof2019.LA.cm.train.trn.txt"
            mid = "ASVspoof2019_LA_train"
        else:
            self.files = audio_fn[bonafide_cap:]
            suffix = f"customized_data_{ctime}.txt"
            mid = ctime
        n_real = len(self.files)

        spoof_fn = os.path.join(cfg.antispoof_dir,
                                "ASVspoof2019_LA_cm_protocols", suffix)
        n_spoof = 0
        if os.path.exists(spoof_fn):
            with open(spoof_fn) as f:
                for proto in f:
                    parts = proto.strip().split()
                    if parts and parts[-1] == "spoof":
                        base = os.path.join(cfg.antispoof_dir, mid, "flac",
                                            parts[1])
                        # our staging writes .wav; the reference wrote .flac
                        for ext in (".flac", ".wav"):
                            if os.path.exists(base + ext):
                                self.files.append(base + ext)
                                n_spoof += 1
                                break
        self.labels = np.concatenate([np.ones(n_real, np.float32),
                                      np.zeros(n_spoof, np.float32)])

    def __len__(self):
        return len(self.files)

    def _compute(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        cfg = self.cfg
        y, sr = dsp_host.load_wav(self.files[idx], sr=16000)
        y, _ = dsp_host.trim_silence(y, 22.0)
        y = dsp_host.preemphasis(y, cfg.preemph)
        lin = dsp_host.stft_mag(y, cfg.stft.fft_length, cfg.stft.hop_length)
        from spoofsv_tpu.dsp.primitives import mel_filterbank

        fb = mel_filterbank(sr, cfg.stft.fft_length, cfg.mel.freq_bins)
        mel = fb @ lin
        lin_n = (lin / max(lin.max(), 1e-8)) ** cfg.norm.analysis_power
        mel_n = (mel / max(mel.max(), 1e-8)) ** cfg.norm.analysis_power
        r = cfg.mel.reduction
        tr = mel.shape[1] // r
        return (mel_n[:, : tr * r : r].T.astype(np.float32),
                lin_n[:, : tr * r].T.astype(np.float32))

    def _cache_path(self, idx: int, feat: str) -> str:
        import hashlib

        key = hashlib.sha1(self.files[idx].encode()).hexdigest()[:20]
        return os.path.join(self.cache_dir, f"{key}.{feat}.npy")

    def get(self, idx: int, feat: str = "mel") -> Tuple[np.ndarray, float]:
        """One feature kind for one utterance, through the cache."""
        assert feat in ("mel", "lin")
        label = float(self.labels[idx])
        if self.cache_dir:
            p = self._cache_path(idx, feat)
            if os.path.exists(p):
                return np.load(p), label
        mel, lin = self._compute(idx)
        out = mel if feat == "mel" else lin
        if self.cache_dir:
            # cache only the requested kind: lin arrays are ~25x mel's size
            # and a CM run uses a single feature kind throughout
            path = self._cache_path(idx, feat)
            tmp = f"{path}.tmp.{os.getpid()}"
            np.save(tmp, out)
            os.replace(tmp + ".npy", path)
        return out, label

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray, float]:
        mel, label = self.get(idx, "mel")
        lin, _ = self.get(idx, "lin")
        return mel, lin, label

    def warm_cache(self, feat: str = "mel", workers: int = 8) -> None:
        """Precompute all features into the cache (threaded, like
        ``TTSDataSource.warm_cache``)."""
        if not self.cache_dir:
            return
        import concurrent.futures

        with concurrent.futures.ThreadPoolExecutor(workers) as ex:
            list(ex.map(lambda i: self.get(i, feat), range(len(self))))


def batches(source: ASVspoofSource, batch_size: int, bucket_frames,
            shuffle: bool, seed: int = 0,
            feat: str = "mel") -> Iterator[Dict[str, np.ndarray]]:
    """Static-bucket batches of (features, labels, mask)."""
    import bisect

    order = np.arange(len(source))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    pool: Dict[int, List] = {}
    buckets = sorted(bucket_frames)

    def emit(items):
        t = max(x[0].shape[0] for x in items)
        i = bisect.bisect_left(buckets, t)
        tb = buckets[min(i, len(buckets) - 1)]
        f_dim = items[0][0].shape[1]
        x = np.zeros((len(items), tb, f_dim), np.float32)
        mask = np.zeros((len(items), tb), bool)
        lab = np.zeros((len(items),), np.float32)
        for j, (m, lbl, idx) in enumerate(items):
            tt = min(m.shape[0], tb)
            x[j, :tt] = m[:tt]
            mask[j, :tt] = True
            lab[j] = lbl
        return {"x": x, "label": lab, "mask": mask,
                "idx": np.asarray([it[2] for it in items], np.int64)}

    for idx in order:
        m, label = source.get(int(idx), feat)
        t = m.shape[0]
        i = bisect.bisect_left(buckets, t)
        b = buckets[min(i, len(buckets) - 1)]
        pool.setdefault(b, []).append((m, label, int(idx)))
        if len(pool[b]) == batch_size:
            yield emit(pool[b])
            pool[b] = []
    for b, items in pool.items():
        if items:
            yield emit(items)


def make_cm_train_step(model, lr: float = 1e-3, weight_decay: float = 1e-4):
    """BCE + Adam(amsgrad, β=(0.9,0.98), ε=1e-9, wd 1e-4)
    (``anti_spoofing/main_spoof_conv1d.py:52,87``)."""
    import jax
    import jax.numpy as jnp
    import optax

    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.amsgrad(lr, b1=0.9, b2=0.98, eps=1e-9),
    )

    def init_fn(rng, x):
        params = model.init(rng, jnp.asarray(x))
        return params, tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, x, label, rng):
        def loss_fn(p):
            pred = model.apply(p, x, deterministic=False,
                               rngs={"dropout": rng})
            # floor the log args with maximum — `1 - pred + eps` is unsafe
            # under XLA reassociation (see train/losses.py::binary_divergence)
            pred = jnp.clip(pred, 0.0, 1.0)
            return jnp.mean(-label * jnp.log(jnp.maximum(pred, 1e-6))
                            - (1 - label) * jnp.log(jnp.maximum(1 - pred, 1e-6)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def score_fn(params, x):
        return model.apply(params, x, deterministic=True)

    return init_fn, step_fn, score_fn


def write_cm_scores(scores: List[Tuple[int, float, float]], ctime: str,
                    out_dir: str = "./cm_scores") -> str:
    """ASVspoof-format score file (``anti_spoofing/main_spoof_conv1d.py:109-129``)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"scores_{ctime}.txt")
    with open(path, "w") as f:
        for idx, label, score in scores:
            gt = "bonafide" if label == 1 else "spoof"
            f.write(f"LA_D_{str(idx).zfill(7)} - {gt} {score}\n")
    return path


def cm_eer(labels: np.ndarray, scores: np.ndarray) -> Tuple[float, float]:
    """Equal error rate of CM scores (bonafide=1 high score). Returns
    (eer, threshold)."""
    order = np.argsort(scores)
    labels = np.asarray(labels)[order]
    scores = np.asarray(scores)[order]
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    best = (1.0, 0.0)
    # sweep thresholds at each score
    fn = np.cumsum(labels)               # positives below threshold (rejected)
    tn = np.cumsum(1 - labels)           # negatives below threshold (correct)
    frr = fn / max(n_pos, 1)
    far = (n_neg - tn) / max(n_neg, 1)
    k = int(np.argmin(np.abs(far - frr)))
    return float((far[k] + frr[k]) / 2), float(scores[k])
