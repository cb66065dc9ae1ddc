"""Data pipeline tests on a synthetic miniature VCTK-style corpus."""

import os

import numpy as np
import pytest

from spoofsv_tpu.config import Config
from spoofsv_tpu.data.pipeline import BucketedLoader, TTSDataSource, pad_batch
from spoofsv_tpu.data.text import build_char2idx, encode_texts, text2id
from spoofsv_tpu.data.vctk import (
    prepare_vctk,
    speaker_id_from_path,
    split_speaker_files,
    utterance_id_from_path,
)
from spoofsv_tpu.dsp import host as dsp_host


class TestSplits:
    def test_split_positions(self):
        files = [f"p1_{i:03d}.wav" for i in range(7)]
        s = split_speaker_files(files)
        # n=7: dev at {1,2,5}, test at {3,4,6}
        assert s["validate"] == ["p1_001.wav", "p1_002.wav", "p1_005.wav"]
        assert s["synthesize"] == ["p1_003.wav", "p1_004.wav", "p1_006.wav"]
        assert s["train"] == ["p1_000.wav"]

    def test_prepare_excludes_p315(self, mini_corpus):
        cfg = mini_corpus
        base = os.path.join(cfg.data_root_dir, "data_path", "ordinary")
        all_paths = []
        for mode in ("train", "validate", "synthesize"):
            with open(os.path.join(base, f"wav.path.{mode}")) as f:
                all_paths += [l.strip() for l in f]
        assert all_paths and not any("p315" in p for p in all_paths)
        # 2 speakers × 8 files
        assert len(all_paths) == 16

    def test_path_helpers(self):
        assert speaker_id_from_path("/x/wav22/p225/p225_001.wav") == "p225"
        assert utterance_id_from_path("/x/p225_001.wav") == "p225_001"


class TestText:
    def test_text2id_matches_reference_semantics(self):
        cfg = Config()
        c2i = build_char2idx(cfg.vocabulary)
        ids = text2id('Hello, "World"?', cfg.vocabulary, c2i)
        # lowercase, quote merged onto apostrophe id, EOS appended
        assert ids[-1] == c2i["E"]
        assert c2i['"'] == c2i["'"]
        decoded = "".join(cfg.vocabulary[i] for i in ids)
        assert decoded == "hello, 'world'?E"

    def test_encode_pad(self):
        out = encode_texts(["ab", "abcdef"], Config().vocabulary)
        assert out.shape == (2, 7)  # 6 chars + EOS
        assert out[0, 3] == 0       # padded with P id 0


class TestSourceAndLoader:
    def test_source_item(self, mini_corpus, tmp_path):
        src = TTSDataSource(mini_corpus, "train", spec_dir=str(tmp_path / "spec"))
        ex = src[0]
        assert ex.mel.shape[1] == 80 and ex.lin.shape[1] == 513
        assert ex.lin.shape[0] == 4 * ex.mel.shape[0]
        assert ex.spk.shape == (200,)
        assert ex.text.dtype == np.int32 and len(ex.text) > 5
        # cache hit second time
        ex2 = src[0]
        np.testing.assert_allclose(ex.mel, ex2.mel)
        assert os.path.exists(os.path.join(str(tmp_path / "spec"),
                                           ex.utt_id + "_mel.npy"))

    def test_bucketed_loader_static_shapes(self, mini_corpus):
        src = TTSDataSource(mini_corpus, "train")
        loader = BucketedLoader(src, batch_size=4, shuffle=True, seed=1)
        cfg = mini_corpus
        shapes = set()
        count = 0
        for batch in loader:
            assert batch["mel"].shape[1] in cfg.tpu.bucket_frames
            assert batch["text"].shape[1] in cfg.tpu.bucket_text
            assert batch["mel_mask"].any(axis=1).all()  # every row has content
            assert batch["att_mask"].shape == (
                batch["mel"].shape[0], batch["text"].shape[1], batch["mel"].shape[1])
            shapes.add(batch["mel"].shape[1:])
            count += batch["mel"].shape[0]
        assert count == len(src)

    def test_loader_with_lin(self, mini_corpus):
        src = TTSDataSource(mini_corpus, "validate")
        loader = BucketedLoader(src, batch_size=2, with_lin=True, shuffle=False)
        batch = next(iter(loader))
        r = mini_corpus.mel.reduction
        assert batch["lin"].shape[1] == r * batch["mel"].shape[1]
        assert (batch["lin"][~batch["lin_mask"]] == 0).all()


class TestDeviceReplayLoader:
    def test_matches_bucketed_loader_content(self, mini_corpus):
        from spoofsv_tpu.data.pipeline import DeviceReplayLoader

        src = TTSDataSource(mini_corpus, "train")
        dev = DeviceReplayLoader(src, batch_size=4, shuffle=False)
        host = BucketedLoader(src, batch_size=4, shuffle=False)

        def collect(loader):
            rows = {}
            for b in loader:
                mel = np.asarray(b["mel"])
                text = np.asarray(b["text"])
                for i in range(mel.shape[0]):
                    # key rows by their text ids (unique per utterance here)
                    rows[tuple(text[i].tolist())] = mel[i]
            return rows

        hrows, drows = collect(host), collect(dev)
        assert set(hrows) == set(drows)
        for k in hrows:
            # bucket shapes may differ between the two loaders only by
            # trailing zero padding
            a, b = hrows[k], drows[k]
            t = min(a.shape[0], b.shape[0])
            np.testing.assert_allclose(a[:t], b[:t], atol=1e-6)
            assert (a[t:] == 0).all() and (b[t:] == 0).all()
        assert len(dev) == len(src)

    def test_shuffles_between_epochs(self, mini_corpus):
        from spoofsv_tpu.data.pipeline import DeviceReplayLoader

        src = TTSDataSource(mini_corpus, "train")
        dev = DeviceReplayLoader(src, batch_size=4, shuffle=True, seed=0)

        def fingerprints(loader):
            return [round(float(np.asarray(b["mel"][i]).sum()), 4)
                    for b in loader for i in range(b["mel"].shape[0])]

        flat1, flat2 = fingerprints(dev), fingerprints(dev)
        assert sorted(flat1) == sorted(flat2)     # same multiset of rows
        assert flat1 != flat2                     # epoch order advanced
