"""Spoof test-set generation + staging for the three evaluation systems.

TPU-native re-design of ``generate_test_utterances.py``:

  * synthesis batches MANY speakers' utterances through one jitted
    decode→SSRN→Griffin-Lim program (the reference loops speakers on a single
    20-utterance batch — ``generate_test_utterances.py:99-139``);
  * staging (i-vector / GE2E / anti-spoofing layouts, transcripts, protocols)
    is pure Python (shutil/os), replacing the reference's ``os.system``
    cp/ln/mkdir shell-outs (``:141-260``).

Layout contract (kept verbatim):
  test/<ctime>/spoof_data/s<spk>/s<spk>_NNN.wav
  test/<ctime>/ivector_data/{wav/{train,dev,test},test_nospoof,transcript/...}
  test/<ctime>/ge2e_data/<spk dirs>                (symlinks)
  <ANTISPOOF_DIR>/<ctime>/flac/LA_D_NNNNNNN.(flac|wav) + protocol file
"""

from __future__ import annotations

import os
import random
import shutil
from typing import List, Optional, Sequence

import numpy as np

from spoofsv_tpu.config import Config
from spoofsv_tpu.data.text import encode_texts
from spoofsv_tpu.dsp import host as dsp_host
from spoofsv_tpu.infer.synthesize import Synthesizer, finalize_audio


def load_harvard_sentences(cfg: Config, n: int) -> List[str]:
    with open(cfg.tts_texts) as f:
        sentences = [l.strip() for l in f if l.strip()]
    return sentences[:n]


def generate_spoof_set(cfg: Config, ctime: str, synthesizer: Synthesizer,
                       eval_utt_num: int = 20,
                       speakers: Optional[Sequence[str]] = None,
                       speaker_batch: int = 8, seed: int = 0,
                       verbose: bool = True) -> str:
    """Synthesize ``eval_utt_num`` Harvard utterances for every speaker.

    Batches ``speaker_batch`` speakers at a time → one device batch of
    ``speaker_batch * eval_utt_num`` utterances per jitted call (vs the
    reference's per-speaker batches of 20 on CPU Griffin-Lim).
    """
    import jax
    import jax.numpy as jnp

    save_dir = os.path.join(cfg.src_root_dir, "test", ctime, "spoof_data")
    sentences = load_harvard_sentences(cfg, eval_utt_num)
    text_ids = encode_texts(sentences, cfg.vocabulary)

    if speakers is None:
        speakers = sorted(os.listdir(os.path.join(cfg.data_root_dir, "wav22")))
    key = jax.random.PRNGKey(seed)

    for s0 in range(0, len(speakers), speaker_batch):
        chunk = speakers[s0: s0 + speaker_batch]
        embs = np.stack([
            np.load(os.path.join(cfg.spk_emb_dir, spk + ".npy")).astype(np.float32)
            for spk in chunk])
        b = len(chunk) * eval_utt_num
        text = np.tile(text_ids, (len(chunk), 1))
        spk = np.repeat(embs, eval_utt_num, axis=0)
        if synthesizer.mesh is not None:
            # pad to the data-axis multiple (XLA shardings need even splits);
            # padded rows are sliced away below
            n_shards = int(np.prod(synthesizer.mesh.devices.shape))
            if b % n_shards:
                pad = n_shards - b % n_shards
                text = np.concatenate([text, text[-1:].repeat(pad, 0)])
                spk = np.concatenate([spk, spk[-1:].repeat(pad, 0)])
        key, sub = jax.random.split(key)
        audio, _, _ = synthesizer(jnp.asarray(text), jnp.asarray(spk), sub)
        audio = np.asarray(audio)[:b]
        for ci, spk_name in enumerate(chunk):
            out_dir = os.path.join(save_dir, "s" + spk_name[1:])
            os.makedirs(out_dir, exist_ok=True)
            for k in range(eval_utt_num):
                wav = finalize_audio(audio[ci * eval_utt_num + k], cfg,
                                     trim_db=30.0, max_seconds=9.0)
                dsp_host.write_wav(
                    os.path.join(out_dir,
                                 f"s{spk_name[1:]}_{str(k+1).zfill(3)}.wav"),
                    wav, cfg.sampling_rate)
            if verbose:
                print("Generated utterances of speaker", spk_name)
    return save_dir


def stage_ivector_data(cfg: Config, ctime: str, train_spk_num: int = 88,
                       enroll_utt_num: int = 3, eval_utt_num: int = 20,
                       seed: Optional[int] = None, verbose: bool = True) -> str:
    """Stage real + synthetic wavs for the i-vector system
    (``generate_test_utterances.py:141-217``).

    First ``train_spk_num`` speakers (sorted) provide all their real
    utterances as training data (speaker 0 doubling as dev); the remaining
    speakers get ``enroll+eval`` random real utterances plus ``eval`` synthetic
    ones renamed ``<spk>W###.wav``, with Kaldi-style transcripts (mixed +
    no-spoof control).
    """
    if seed is not None:
        random.seed(seed)
    test_root = os.path.join(cfg.src_root_dir, "test", ctime)
    ivector_root = os.path.join(test_root, "ivector_data")
    spoof_dir = os.path.join(test_root, "spoof_data")
    real_root = os.path.join(cfg.data_root_dir, "wav22")
    txt_root = os.path.join(cfg.data_root_dir, "txt")

    real_list = sorted(os.listdir(real_root))
    syn_list = sorted(os.listdir(spoof_dir))
    sentences = load_harvard_sentences(cfg, eval_utt_num)

    os.makedirs(os.path.join(ivector_root, "transcript"), exist_ok=True)
    tr = open(os.path.join(ivector_root, "transcript", "VCTK-transcript.txt"), "w")
    tr_ns = open(os.path.join(ivector_root, "VCTK-transcript_nospoof.txt"), "w")

    def read_txt(spk: str, utt: str) -> str:
        with open(os.path.join(txt_root, spk, utt[:-4] + ".txt")) as f:
            return f.readline().strip()

    try:
        for i, spk in enumerate(real_list):
            sid = spk[1:]
            assert sid == syn_list[i][1:], (spk, syn_list[i])  # :159
            utts = os.listdir(os.path.join(real_root, spk))
            random.shuffle(utts)
            if i < train_spk_num:
                dst_dir = os.path.join(ivector_root, "wav", "train", sid)
                os.makedirs(dst_dir, exist_ok=True)
                for j, utt in enumerate(utts):
                    name = f"{sid}W{str(j+1).zfill(3)}"
                    shutil.copy(os.path.join(real_root, spk, utt),
                                os.path.join(dst_dir, name + ".wav"))
                    line = read_txt(spk, utt)
                    tr.write(f"{name}    {line}\n")
                    tr_ns.write(f"{name}    {line}\n")
                if i == 0:  # dev set = copy of first training speaker (:178-181)
                    dev_dir = os.path.join(ivector_root, "wav", "dev")
                    os.makedirs(dev_dir, exist_ok=True)
                    shutil.copytree(dst_dir, os.path.join(dev_dir, sid),
                                    dirs_exist_ok=True)
            else:
                test_dir = os.path.join(ivector_root, "wav", "test", sid)
                ns_dir = os.path.join(ivector_root, "test_nospoof", sid)
                os.makedirs(test_dir, exist_ok=True)
                os.makedirs(ns_dir, exist_ok=True)
                for j in range(enroll_utt_num + eval_utt_num):
                    utt = utts[j]
                    name = f"{sid}W{str(j+1).zfill(3)}"
                    src = os.path.join(real_root, spk, utt)
                    shutil.copy(src, os.path.join(test_dir, name + ".wav"))
                    shutil.copy(src, os.path.join(ns_dir, name + ".wav"))
                    line = read_txt(spk, utt)
                    tr.write(f"{name}    {line}\n")
                    tr_ns.write(f"{name}    {line}\n")
                syn_utts = sorted(os.listdir(os.path.join(spoof_dir, "s" + sid)),
                                  key=lambda x: x[:-4])
                for j in range(eval_utt_num):
                    idx = j + eval_utt_num + enroll_utt_num + 1
                    name = f"{sid}W{str(idx).zfill(3)}"
                    shutil.copy(os.path.join(spoof_dir, "s" + sid, syn_utts[j]),
                                os.path.join(test_dir, name + ".wav"))
                    tr.write(f"{name}    {sentences[j]}\n")
            if verbose:
                print("i-vector staging:", i, sid)
    finally:
        tr.close()
        tr_ns.close()
    return ivector_root


def stage_ge2e_data(cfg: Config, ctime: str) -> str:
    """Symlink GE2E data onto the i-vector layout
    (``generate_test_utterances.py:219-226``)."""
    test_root = os.path.join(cfg.src_root_dir, "test", ctime)
    ge2e_dir = os.path.join(test_root, "ge2e_data")
    os.makedirs(ge2e_dir, exist_ok=True)
    for sub in ("train", "test"):
        src_root = os.path.join(test_root, "ivector_data", "wav", sub)
        if not os.path.isdir(src_root):
            continue
        for spk in os.listdir(src_root):
            link = os.path.join(ge2e_dir, spk)
            if not os.path.exists(link):
                os.symlink(os.path.abspath(os.path.join(src_root, spk)), link)
    return ge2e_dir


def stage_antispoof_data(cfg: Config, ctime: str, bonafide_per_spk: int = 10,
                         n_speakers: int = 108, verbose: bool = True) -> str:
    """Stage bonafide + spoof audio for the countermeasure system
    (``generate_test_utterances.py:228-260``).

    Writes 16 kHz FLAC via the native libspoofkit codec, matching the
    reference's soundfile staging bit-for-bit in format (16-bit FLAC, same
    ``LA_D_NNNNNNN`` ids); the CM feature pipeline reads either .flac or .wav.
    """
    test_root = os.path.join(cfg.src_root_dir, "test", ctime)
    spoof_dir = os.path.join(test_root, "spoof_data")
    save_dir = os.path.join(cfg.antispoof_dir, ctime, "flac")
    proto_dir = os.path.join(cfg.antispoof_dir, "ASVspoof2019_LA_cm_protocols")
    os.makedirs(save_dir, exist_ok=True)
    os.makedirs(proto_dir, exist_ok=True)

    bonafide_num = bonafide_per_spk * n_speakers
    protocol_path = os.path.join(proto_dir, f"customized_data_{ctime}.txt")
    index = 0
    with open(protocol_path, "w") as protocol:
        dev_proto_path = os.path.join(proto_dir, "ASVspoof2019.LA.cm.dev.trl.txt")
        if os.path.exists(dev_proto_path):
            with open(dev_proto_path) as f:
                dev_proto = f.readlines()
            for k in range(min(bonafide_num, len(dev_proto))):
                info = dev_proto[index].strip().split()
                assert info[-1] == "bonafide"    # :241
                src_flac = os.path.join(cfg.antispoof_dir, "ASVspoof2019_LA_dev",
                                        "flac", info[1] + ".flac")
                dst = os.path.join(save_dir, f"LA_D_{str(index+1).zfill(7)}.flac")
                if os.path.exists(src_flac):
                    shutil.copy(src_flac, dst)
                protocol.write(f"{info[0]} LA_D_{str(index+1).zfill(7)} - - bonafide\n")
                index += 1
        elif verbose:
            print("no ASVspoof2019 dev protocol found — staging spoof side only")

        for spk in sorted(os.listdir(spoof_dir)):
            for utt in sorted(os.listdir(os.path.join(spoof_dir, spk))):
                y, sr = dsp_host.load_wav(os.path.join(spoof_dir, spk, utt),
                                          sr=16000)
                dsp_host.write_flac(
                    os.path.join(save_dir, f"LA_D_{str(index+1).zfill(7)}.flac"),
                    y, 16000)
                protocol.write(f"{spk} LA_D_{str(index+1).zfill(7)} - - spoof\n")
                index += 1
    return save_dir
