"""GE2E speaker-verification subsystem: preprocess, train, test, spoof rate.

TPU-native re-design of ``GE2E/data_preprocess.py`` and
``GE2E/train_speech_embedder.py``:

  * TISV preprocessing keeps the reference's exact staging rules — log10-mel-
    power features, first & last 120-frame crops per utterance, train speakers
    capped at 100 utterances, test speakers laid out as 2·(enroll+eval) crops
    (enroll first) with random resample-duplication when short
    (``GE2E/data_preprocess.py:36-93``);
  * the training step is one jitted program — LSTM embedder forward, the
    vectorized GE2E loss (no O(N²M) Python loops), per-group gradient clipping
    (3.0 embedder / 1.0 loss — ``train_speech_embedder.py:84-85``) and SGD;
  * the test harness reproduces the EER sweep over thresholds 0.5+0.01·i,
    the FAR/FRR/gt-FRR/spoof-rate-at-EER bookkeeping, `test_nospoof` threshold
    transfer, and the final average spoof rate (``:113-322``).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from spoofsv_tpu.config import GE2EConfig
from spoofsv_tpu.dsp import host as dsp_host


# ----------------------------------------------------------------------
# Preprocessing (TISV crops)
# ----------------------------------------------------------------------

def save_spectrogram_tisv(ge2e: GE2EConfig, train_spk_num: int,
                          enroll_num: int, eval_num: int,
                          seed: Optional[int] = None, verbose: bool = True) -> None:
    """Crop + save per-speaker feature arrays (``GE2E/data_preprocess.py:15-93``).

    NB: the reference calls this with ``enroll_num = args.enroll_num +
    args.eval_num`` (``:102``) so "enroll" here means enroll+eval real crops.
    """
    rng = np.random.default_rng(seed)
    audio_dirs = sorted(glob.glob(os.path.dirname(ge2e.unprocessed_data)),
                        key=lambda x: x[-3:])
    os.makedirs(ge2e.data.train_path, exist_ok=True)
    os.makedirs(ge2e.data.test_path, exist_ok=True)
    d = ge2e.data
    utter_min_len = (d.tisv_frame * d.hop + d.window) * d.sr

    for i, folder in enumerate(audio_dirs):
        utterances: List[np.ndarray] = []
        eval_spec: List[np.ndarray] = []
        if i < train_spk_num:
            utts_list = os.listdir(folder)[:100]
        else:
            utts_list = sorted(os.listdir(folder), key=lambda x: x[:-4])
        for k, utter_name in enumerate(utts_list):
            if not utter_name.endswith(".wav"):
                continue
            y, sr = dsp_host.load_wav(os.path.join(folder, utter_name), sr=d.sr)
            y, _ = dsp_host.trim_silence(y, 30.0)
            if len(y) > utter_min_len:
                S = dsp_host.ge2e_logmel(y, d.sr, d.nfft, d.window, d.hop, d.nmels)
                first = S[:, : d.tisv_frame]
                last = S[:, -d.tisv_frame:]
                if i >= train_spk_num and k >= enroll_num:
                    eval_spec += [first, last]
                else:
                    utterances += [first, last]

        if i >= train_spk_num:
            # duplication rules (:66-83)
            n_enroll = len(utterances)
            if 2 * enroll_num - n_enroll > 0:
                for _ in range(enroll_num - n_enroll // 2):
                    utterances.append(utterances[rng.integers(0, n_enroll // 2)])
                    utterances.append(utterances[rng.integers(0, n_enroll // 2)])
            n_eval = len(eval_spec)
            if 2 * eval_num - n_eval > 0:
                for _ in range(eval_num - n_eval // 2):
                    eval_spec.append(eval_spec[rng.integers(0, n_eval // 2)])
                    eval_spec.append(eval_spec[rng.integers(0, n_eval // 2)])
            utterances = utterances + eval_spec
            arr = np.array(utterances)
            assert arr.shape[0] == 2 * (enroll_num + eval_num)   # :88
            np.save(os.path.join(d.test_path,
                                 f"speaker{i - train_spk_num}.npy"), arr)
        else:
            np.save(os.path.join(d.train_path, f"speaker{i}.npy"),
                    np.array(utterances))
        if verbose:
            print(f"speaker {i} ({'train' if i < train_spk_num else 'test'}): "
                  f"{len(utterances)} crops")


def save_spectrogram_tisv_generic(ge2e: GE2EConfig, verbose: bool = True) -> None:
    """Generic 80/20-ish preprocessor with VAD splitting for plain corpora
    (``GE2E/synthetic_data_preprocess.py:13-52``): per non-silent interval
    long enough, keep first & last ``tisv_frame`` log-mel frames; speakers
    split ``(total//10)*8`` train / rest test."""
    audio_dirs = sorted(glob.glob(os.path.dirname(ge2e.unprocessed_data)))
    os.makedirs(ge2e.data.train_path, exist_ok=True)
    os.makedirs(ge2e.data.test_path, exist_ok=True)
    d = ge2e.data
    utter_min_len = (d.tisv_frame * d.hop + d.window) * d.sr
    train_speaker_num = (len(audio_dirs) // 10) * 8
    for i, folder in enumerate(audio_dirs):
        utterances = []
        for utter_name in os.listdir(folder):
            if not utter_name.endswith(".wav"):
                continue
            y, sr = dsp_host.load_wav(os.path.join(folder, utter_name), sr=d.sr)
            for a, b in dsp_host.split_nonsilent(y, top_db=30.0):
                if b - a > utter_min_len:
                    S = dsp_host.ge2e_logmel(y[a:b], d.sr, d.nfft, d.window,
                                             d.hop, d.nmels)
                    utterances.append(S[:, : d.tisv_frame])
                    utterances.append(S[:, -d.tisv_frame:])
        arr = np.array(utterances)
        if i < train_speaker_num:
            np.save(os.path.join(d.train_path, f"speaker{i}.npy"), arr)
        else:
            np.save(os.path.join(d.test_path,
                                 f"speaker{i - train_speaker_num}.npy"), arr)
        if verbose:
            print(f"speaker {i}: {len(utterances)} crops")


class OnTheFlySpeakerBatcher:
    """On-the-fly feature extraction per speaker directory — the
    ``SpeakerDatasetTIMIT`` path (``GE2E/data_load.py:19-46``)."""

    def __init__(self, ge2e: GE2EConfig, m: int, seed: int = 0):
        self.ge2e = ge2e
        self.m = m
        pattern = (ge2e.data.train_path_unprocessed if ge2e.training
                   else ge2e.data.test_path_unprocessed) or ge2e.unprocessed_data
        self.speakers = sorted(glob.glob(os.path.dirname(pattern)))
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.speakers)

    def sample_batch(self, n: int) -> np.ndarray:
        d = self.ge2e.data
        idx = self.rng.choice(len(self.speakers), size=n, replace=False)
        out = []
        for i in idx:
            wavs = [f for f in os.listdir(self.speakers[int(i)])
                    if f.lower().endswith(".wav")]
            self.rng.shuffle(wavs)
            feats = []
            for w in wavs[: self.m]:
                y, sr = dsp_host.load_wav(
                    os.path.join(self.speakers[int(i)], w), sr=d.sr)
                _, mel_db, _ = dsp_host.mfccs_and_spec(
                    y, d.sr, d.nfft, d.window, d.hop, d.nmels, d.tisv_frame,
                    wav_process=True)
                feats.append(mel_db[: d.tisv_frame + 1])
            out.append(np.stack(feats))
        return np.stack(out)


class SpeakerBatcher:
    """Loads preprocessed speaker npys; samples (N, M, frames, nmels) batches
    (``GE2E/data_load.py:48-86``)."""

    def __init__(self, path: str, m: int, shuffle: bool = True, seed: int = 0):
        self.path = path
        self.files = sorted(os.listdir(path),
                            key=lambda x: int(x[7:-4]) if x[7:-4].isdigit() else 0)
        self.m = m
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self._cache: Dict[str, np.ndarray] = {}

    def __len__(self):
        return len(self.files)

    def _load(self, fname: str) -> np.ndarray:
        if fname not in self._cache:
            self._cache[fname] = np.load(os.path.join(self.path, fname))
        return self._cache[fname]

    def sample_batch(self, n: int) -> np.ndarray:
        """(N, M, frames, nmels), time-major per utterance."""
        if self.shuffle:
            idx = self.rng.choice(len(self.files), size=n, replace=False)
        else:
            idx = np.arange(n)
        out = []
        for i in idx:
            utters = self._load(self.files[int(i)])      # (U, nmels, frames)
            if self.shuffle:
                sel = self.rng.integers(0, utters.shape[0], self.m)
            else:
                sel = np.arange(self.m)
            out.append(np.transpose(utters[sel], (0, 2, 1)))
        return np.stack(out)

    def ordered_batches(self, n: int):
        """Non-shuffling sequential N-speaker groups (drop_last semantics)."""
        for s in range(0, (len(self.files) // n) * n, n):
            out = []
            for i in range(s, s + n):
                utters = self._load(self.files[i])
                out.append(np.transpose(utters[: self.m], (0, 2, 1)))
            yield np.stack(out)


class DeviceSpeakerBank:
    """Device-resident TISV speaker bank for the GE2E training hot loop.

    ``SpeakerBatcher.sample_batch`` assembles every (N, M, T, F) batch on the
    host (~6 MB at reference dims) and uploads it per step — through a
    tunneled TPU transport that dominated the campaign's GE2E stage
    (~0.53 s/step for a ~100 ms forward). This bank uploads ALL speaker
    crops once (one flat (total, T, F) array) and per step ships only the
    N·M int32 gather indices; the batch is gathered on device inside one
    jitted program. Sampling draws from the SAME host rng sequence as
    ``SpeakerBatcher`` (speaker ``choice`` then per-speaker ``integers``), so
    training batches — and hence the loss curve — are bit-identical to the
    host path (``GE2E/data_load.py:48-86``)."""

    def __init__(self, path: str, m: int, seed: int = 0):
        import jax
        import jax.numpy as jnp

        self.files = sorted(os.listdir(path),
                            key=lambda x: int(x[7:-4]) if x[7:-4].isdigit() else 0)
        self.m = m
        self.rng = np.random.default_rng(seed)
        arrays = [np.load(os.path.join(path, f)) for f in self.files]
        self.counts = np.array([a.shape[0] for a in arrays])
        self.offsets = np.concatenate([[0], np.cumsum(self.counts)[:-1]])
        flat = np.concatenate([np.transpose(a, (0, 2, 1)) for a in arrays])
        self._flat = jax.device_put(jnp.asarray(flat, jnp.float32))

        @jax.jit
        def gather(flat_arr, idx):
            return jnp.take(flat_arr, idx, axis=0)

        self._gather = gather
        self._jnp = jnp

    def __len__(self) -> int:
        return len(self.files)

    def sample_batch(self, n: int):
        """Device-resident (N·M, T, F) batch (reshape to (N, M, ...) is done
        by the consumer inside its own jit to avoid an extra dispatch)."""
        spk = self.rng.choice(len(self.files), size=n, replace=False)
        idx = np.empty((n, self.m), np.int64)
        for i, s in enumerate(spk):
            idx[i] = self.offsets[s] + self.rng.integers(0, self.counts[s],
                                                         self.m)
        return self._gather(self._flat,
                            self._jnp.asarray(idx.reshape(-1), self._jnp.int32))


# ----------------------------------------------------------------------
# Training
# ----------------------------------------------------------------------

def make_ge2e_train_step(embedder, loss_mod, lr: float,
                         n_speakers: Optional[int] = None,
                         donate: bool = False):
    """``n_speakers``: when set, ``step_fn`` also accepts flat
    ``(N·M, T, F)`` batches (the :class:`DeviceSpeakerBank` layout) and
    reshapes inside the jit — no extra host dispatch. ``donate``: donate
    params/opt state buffers (in-place updates; callers must not reuse the
    passed-in state afterwards)."""
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    def clip_by_norm(tree, max_norm):
        leaves = jax.tree_util.tree_leaves(tree)
        norm = jnp.sqrt(sum(jnp.sum(l ** 2) for l in leaves))
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
        return jax.tree_util.tree_map(lambda l: l * scale, tree)

    tx = optax.sgd(lr)

    def init_fn(rng, batch):
        n, m, t, f = batch.shape
        flat = jnp.asarray(batch.reshape(n * m, t, f))
        r1, r2 = jax.random.split(jax.random.PRNGKey(0) if rng is None else rng)
        p_emb = embedder.init(r1, flat)
        p_loss = loss_mod.init(r2, jnp.zeros((n, m, embedder.proj)))
        params = {"embedder": p_emb, "loss": p_loss}
        return params, tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step_fn(params, opt_state, batch):
        if batch.ndim == 3:
            assert n_speakers, "flat batches need n_speakers at factory time"
            batch = batch.reshape(n_speakers, -1, *batch.shape[1:])
        n, m = batch.shape[0], batch.shape[1]

        def loss_fn(p):
            flat = batch.reshape(n * m, batch.shape[2], batch.shape[3])
            e = embedder.apply(p["embedder"], flat)
            e = e.reshape(n, m, -1)
            return loss_mod.apply(p["loss"], e)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # per-group clip: embedder 3.0, (w, b) 1.0 (train_speech_embedder.py:84-85)
        grads = {"embedder": clip_by_norm(grads["embedder"], 3.0),
                 "loss": clip_by_norm(grads["loss"], 1.0)}
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax as _o
        params = _o.apply_updates(params, updates)
        return params, opt_state, loss

    return init_fn, step_fn


def train_ge2e(ge2e: GE2EConfig, max_epochs: Optional[int] = None,
               seed: int = 0, verbose: bool = True,
               device_data: bool = True):
    """Full GE2E training loop (``GE2E/train_speech_embedder.py:40-111``).

    TPU-native hot loop (``device_data=True``, default): the preprocessed
    speaker crops live on device (:class:`DeviceSpeakerBank` — per-step
    host→device traffic is N·M int32 indices), the step donates its
    params/opt buffers, and losses stay device-resident between log points
    (each ``float(loss)`` fetch synchronizes every queued step on tunneled
    transports — the reference fetches per step, which cost the round-2
    campaign ~0.53 s/step for a ~100 ms forward). Batches are drawn from the
    same rng sequence as ``SpeakerBatcher``, so the loss curve is
    bit-identical to the host path."""
    import jax
    import jax.numpy as jnp

    from spoofsv_tpu.models.ge2e import GE2ELoss, SpeechEmbedder

    embedder = SpeechEmbedder(hidden=ge2e.model.hidden,
                              num_layers=ge2e.model.num_layer,
                              proj=ge2e.model.proj)
    loss_mod = GE2ELoss()
    n = ge2e.train.N
    if device_data:
        batcher = DeviceSpeakerBank(ge2e.data.train_path, ge2e.train.M,
                                    seed=seed)
    else:
        batcher = SpeakerBatcher(ge2e.data.train_path, ge2e.train.M,
                                 shuffle=True, seed=seed)
    init_fn, step_fn = make_ge2e_train_step(embedder, loss_mod, ge2e.train.lr,
                                            n_speakers=n,
                                            donate=device_data)

    batch0 = batcher.sample_batch(n)
    if device_data:
        batch0 = jnp.reshape(batch0, (n, -1, *batch0.shape[1:]))
    params, opt_state = init_fn(jax.random.PRNGKey(seed), np.asarray(batch0))
    os.makedirs(ge2e.train.checkpoint_dir, exist_ok=True)

    epochs = max_epochs or ge2e.train.epochs
    iteration = 0
    batches_per_epoch = max(1, len(batcher) // n)

    def log(msg):
        print(msg)
        if ge2e.train.log_file:
            os.makedirs(os.path.dirname(ge2e.train.log_file) or ".",
                        exist_ok=True)
            with open(ge2e.train.log_file, "a") as f:
                f.write(msg + "\n")

    for e in range(epochs):
        total = 0.0
        fetched = 0
        pending: List = []   # device-held losses since the last fetch
        for b in range(batches_per_epoch):
            batch = batcher.sample_batch(n)
            if not device_data:
                batch = jnp.asarray(batch)
            params, opt_state, loss = step_fn(params, opt_state, batch)
            pending.append(loss)
            iteration += 1
            if verbose and (b + 1) % ge2e.train.log_interval == 0:
                vals = np.asarray(jnp.stack(pending))  # one stacked fetch
                total += float(vals.sum())
                fetched += len(vals)
                pending = []
                log(f"Epoch:{e+1}[{b+1}/{batches_per_epoch}],"
                    f"Iteration:{iteration}\tLoss:{float(vals[-1]):.4f}\t"
                    f"TLoss:{total/fetched:.4f}")
        if pending and (e + 1) % ge2e.train.checkpoint_interval == 0:
            # materialize before snapshotting so the checkpoint isn't racing
            # queued donated-buffer updates
            jax.block_until_ready(pending[-1])
        if (e + 1) % ge2e.train.checkpoint_interval == 0:
            _save_ge2e_ckpt(params, ge2e.train.checkpoint_dir,
                            f"ckpt_epoch_{e+1}.npz")
    _save_ge2e_ckpt(params, ge2e.train.checkpoint_dir,
                    f"final_epoch_{epochs}.npz")
    return params


def _save_ge2e_ckpt(params, ckpt_dir: str, name: str) -> None:
    import jax

    flat = {"/".join(str(getattr(k, "key", k)) for k in path): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(params)}
    np.savez(os.path.join(ckpt_dir, name), **flat)


def load_ge2e_params(path: str, embedder, proj: int):
    """Load either our .npz checkpoints or a reference torch state_dict."""
    if path.endswith((".model", ".pth", ".pt")):
        from spoofsv_tpu.utils.torch_import import import_ge2e_embedder

        return import_ge2e_embedder(path)
    import jax
    import jax.numpy as jnp

    data = np.load(path)
    # rebuild structure by unflattening the saved paths
    tree: Dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    # training checkpoints wrap {embedder, loss}; apply() wants the embedder's
    # own {"params": ...} tree
    if "embedder" in tree:
        tree = tree["embedder"]
    return tree


# ----------------------------------------------------------------------
# Test harness: EER + spoof rate
# ----------------------------------------------------------------------

def embed_test_batch(embedder, emb_params, batch: np.ndarray,
                     enroll_num: int):
    """(N, M, F, T) test batch → (e_enroll (N, 2e, D), e_verif (N, M-2e, D))
    (the embedding passes of ``GE2E/train_speech_embedder.py:131-160``)."""
    import jax.numpy as jnp

    n, m = batch.shape[0], batch.shape[1]
    es1 = 2 * enroll_num
    enroll = jnp.asarray(batch[:, :es1].reshape(n * es1, *batch.shape[2:]))
    verif = jnp.asarray(batch[:, es1:].reshape(n * (m - es1), *batch.shape[2:]))
    e_enroll = embedder.apply(emb_params, enroll).reshape(n, es1, -1)
    e_verif = embedder.apply(emb_params, verif).reshape(n, m - es1, -1)
    return e_enroll, e_verif


def sim_from_embeddings(e_verif, e_enroll) -> np.ndarray:
    """(N, V, D) verification + (N, 2e, D) enrollment embeddings → (N, V, N)
    similarity matrix (``train_speech_embedder.py:161-165``).

    NB the own-speaker diagonal follows the reference's ``get_cossim`` quirk
    (``GE2E/utils.py:36-46``): ``sim[j, i, j]`` is the cosine against the
    leave-one-out mean of speaker j's *verification* embeddings — the
    enrollment centroids only drive the impostor (off-diagonal) entries. The
    diagonal therefore depends on the composition of the verification set
    passed in; see ``run_ge2e_evaluation`` for why that matters."""
    from spoofsv_tpu.models.ge2e import get_centroids, get_cossim

    return np.asarray(get_cossim(e_verif, get_centroids(e_enroll)))


def build_sim_matrix(embedder, emb_params, batch: np.ndarray,
                     enroll_num: int) -> np.ndarray:
    """(N, M, F, T) test batch → similarity matrix (N, M-2e, N)
    (``GE2E/train_speech_embedder.py:131-165``)."""
    e_enroll, e_verif = embed_test_batch(embedder, emb_params, batch, enroll_num)
    return sim_from_embeddings(e_verif, e_enroll)


def eer_sweep(sim: np.ndarray, enroll_num: int, with_spoof: bool = True
              ) -> Dict[str, float]:
    """Threshold sweep 0.5+0.01·i (``GE2E/train_speech_embedder.py:176-196``).

    Returns EER, threshold, FAR, FRR and — when ``with_spoof`` — the gt-FRR and
    spoof-rate at the EER threshold (verification rows = [real | spoof], each
    half 2·eval crops).
    """
    n, n_verif, _ = sim.shape
    es1 = 2 * enroll_num
    size_1 = n_verif + es1
    best = {"diff": 1.0, "EER": 0.0, "thresh": 0.0, "FAR": 0.0, "FRR": 0.0,
            "gt_FRR": 0.0, "spoof_rate": 0.0}
    half = n_verif // 2
    for i in range(50):
        thres = 0.5 + 0.01 * i
        t = sim > thres
        far = sum(t[j].sum() - t[j, :, j].sum() for j in range(n)) / (n - 1) / n_verif / n
        frr = sum(n_verif - t[j, :, j].sum() for j in range(n)) / n_verif / n
        if with_spoof:
            gtfrr = sum(half - t[j, :half, j].sum() for j in range(n)) / half / n
            sr = sum(t[j, -half:, j].sum() for j in range(n)) / half / n
        else:
            gtfrr = frr
            sr = 0.0
        diff = abs(far - frr)
        if diff < best["diff"]:
            best = {"diff": diff, "EER": (far + frr) / 2, "thresh": thres,
                    "FAR": float(far), "FRR": float(frr),
                    "gt_FRR": float(gtfrr), "spoof_rate": float(sr)}
    return best


def spoof_rate_at_threshold(sim: np.ndarray, threshold: float,
                            eval_num: int) -> float:
    """Spoof rate of the mixed simmat at an external (clean-EER) threshold
    (``GE2E/train_speech_embedder.py:313-322``)."""
    n = sim.shape[0]
    t = sim > threshold
    return float(sum(t[j, -2 * eval_num:, j].sum() for j in range(n))
                 / (2 * eval_num) / n)


def preprocess_nospoof_tisv(ge2e: GE2EConfig, nospoof_glob: str,
                            enroll_num: int, eval_num: int,
                            out_path: Optional[str] = None,
                            seed: Optional[int] = None,
                            verbose: bool = True) -> str:
    """Preprocess the staged real-only ``test_nospoof`` copy into its own TISV
    directory (the reference's second ``data_preprocess.py`` pass feeding
    ``test_nospoof`` — ``GE2E/train_speech_embedder.py:205-298``).

    Every speaker is a test speaker with ``enroll+eval`` real utterances, so
    the crop layout is ``2·(enroll+eval)`` real crops in sorted-name order —
    the same order the mixed staging puts its real crops in.
    """
    import dataclasses

    out = out_path or (ge2e.data.test_path.rstrip("/") + "_nospoof")
    ns_cfg = dataclasses.replace(
        ge2e, unprocessed_data=nospoof_glob,
        data=dataclasses.replace(ge2e.data, test_path=out))
    save_spectrogram_tisv(ns_cfg, train_spk_num=0,
                          enroll_num=enroll_num + eval_num, eval_num=0,
                          seed=seed, verbose=verbose)
    return out


def run_ge2e_evaluation(ge2e: GE2EConfig, enroll_num: int = 3,
                        eval_num: int = 20, model_path: Optional[str] = None,
                        epochs: Optional[int] = None, verbose: bool = True,
                        nospoof_data: Optional[str] = None,
                        nospoof_test_path: Optional[str] = None,
                        seed: Optional[int] = None) -> Dict[str, float]:
    """Full reference evaluation protocol (``train_speech_embedder.py:300-322``):
    mixed test (EER + SR-at-EER), no-spoof test (clean threshold), then the
    final average spoof rate of saved mixed simmats at the clean threshold.

    The no-spoof threshold comes from one of two formulations:

    * **staged** (``nospoof_data`` = glob over the staged ``test_nospoof``
      copy, e.g. ``<test_root>/ivector_data/test_nospoof/*/*.wav``): the copy
      gets its own TISV preprocess + similarity matrices, exactly like the
      reference's second ``test_nospoof`` pass;
    * **slice** (default fast path): re-run the cossim on the first
      ``2·eval_num`` verification *embeddings* only (the staging puts real
      crops first: real utterances get the low ``W###`` indices,
      ``spoofgen.py``). The slice must happen on the embeddings BEFORE the
      cossim, never on the mixed simmat: the reference's ``get_cossim``
      (``GE2E/utils.py:36-46``) computes own-speaker diagonals against the
      leave-one-out mean of the *verification* set, so a mixed simmat's
      diagonal is contaminated by the spoof rows (the round-2 campaign
      measured 0.50 vs the staged 0.80 on the adversarial staging from
      exactly this). Slicing the embeddings reproduces the staged
      computation bit-for-bit whenever the staged TISV needed no
      crop-duplication padding (it is the same crops through the same math).
    """
    from spoofsv_tpu.models.ge2e import SpeechEmbedder

    embedder = SpeechEmbedder(hidden=ge2e.model.hidden,
                              num_layers=ge2e.model.num_layer,
                              proj=ge2e.model.proj)
    params = load_ge2e_params(model_path or ge2e.model.model_path, embedder,
                              ge2e.model.proj)

    batcher = SpeakerBatcher(ge2e.data.test_path, ge2e.test.M, shuffle=False)
    os.makedirs(ge2e.save_simmat_dir, exist_ok=True)

    n_epochs = epochs or ge2e.test.epochs
    simmats = []
    mixed_results = []
    slice_thresholds = []
    for e in range(n_epochs):
        for bi, batch in enumerate(batcher.ordered_batches(ge2e.test.N)):
            e_enroll, e_verif = embed_test_batch(embedder, params, batch,
                                                 enroll_num)
            sim = sim_from_embeddings(e_verif, e_enroll)
            np.save(os.path.join(ge2e.save_simmat_dir,
                                 f"simmat_e{e+1}_b{bi+1}.npy"), sim)
            simmats.append(sim)
            r = eer_sweep(sim, enroll_num, with_spoof=True)
            mixed_results.append(r)
            # slice formulation: cossim re-run on the real verification
            # embeddings ONLY (slicing the mixed simmat instead would keep
            # spoof-contaminated leave-one-out diagonals — see docstring)
            sim_real = sim_from_embeddings(e_verif[:, : 2 * eval_num],
                                           e_enroll)
            r_ns = eer_sweep(sim_real, enroll_num, with_spoof=False)
            slice_thresholds.append(r_ns["thresh"])
            if verbose:
                print(f"epoch {e+1} batch {bi+1}: EER={r['EER']:.4f} "
                      f"(thres {r['thresh']:.2f}) clean-thres {r_ns['thresh']:.2f}")

    staged_thresholds: List[float] = []
    if nospoof_data is not None:
        ns_path = preprocess_nospoof_tisv(ge2e, nospoof_data, enroll_num,
                                          eval_num, out_path=nospoof_test_path,
                                          seed=seed, verbose=verbose)
        ns_batcher = SpeakerBatcher(ns_path, 2 * (enroll_num + eval_num),
                                    shuffle=False)
        for e in range(n_epochs):
            for bi, batch in enumerate(ns_batcher.ordered_batches(ge2e.test.N)):
                sim_ns = build_sim_matrix(embedder, params, batch, enroll_num)
                r_ns = eer_sweep(sim_ns, enroll_num, with_spoof=False)
                staged_thresholds.append(r_ns["thresh"])
                if verbose:
                    print(f"nospoof epoch {e+1} batch {bi+1}: "
                          f"EER={r_ns['EER']:.4f} thres {r_ns['thresh']:.2f}")

    avg_eer = float(np.mean([r["EER"] for r in mixed_results]))
    clean_thres = float(np.mean(staged_thresholds or slice_thresholds))
    final_sr = float(np.mean([
        spoof_rate_at_threshold(s, clean_thres, eval_num) for s in simmats]))
    result = {"EER": avg_eer, "clean_threshold": clean_thres,
              "clean_threshold_slice": float(np.mean(slice_thresholds)),
              "spoof_rate": final_sr,
              "spoof_rate_at_eer": float(np.mean(
                  [r["spoof_rate"] for r in mixed_results])),
              "gt_FRR": float(np.mean([r["gt_FRR"] for r in mixed_results]))}
    if verbose:
        print(json.dumps(result, indent=2))
    return result
