"""Serving subsystem: micro-batching scheduler + HTTP front-end.

Covers the production-serving properties :mod:`spoofsv_tpu.serve` claims:
batch-invariant audio under the deterministic Griffin-Lim init, bucket-ladder
batching (no per-size recompiles beyond the ladder), request aggregation,
error isolation, and the HTTP endpoints end-to-end.
"""

import io
import json
import socket
import threading
import time
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spoofsv_tpu.config import Config
from spoofsv_tpu.infer.synthesize import Synthesizer, finalize_audio
from spoofsv_tpu.models import MelSyn, SSRN
from spoofsv_tpu.serve import (MAX_BODY_BYTES, BatchingSynthesizer,
                               ServerOverloaded, SpeakerTable,
                               make_http_server, wav_bytes)
from spoofsv_tpu.train.steps import shift_right


@pytest.fixture(scope="module")
def serve_setup():
    cfg = Config().replace(hidden_dim=16, text_emb_dim=8, ssrn_dim=16,
                           spk_emb_dim=10, max_text_len=16, max_frame_num=8)
    melsyn = MelSyn(vocab_len=cfg.vocab_len, condition=True,
                    spk_emb_dim=cfg.spk_emb_dim, text_emb_dim=cfg.text_emb_dim,
                    freq_bins=cfg.mel.freq_bins, hidden_dim=cfg.hidden_dim,
                    dtype=jnp.float32)
    ssrn = SSRN(freq_bins=cfg.mel.freq_bins, output_bins=cfg.lin_bins,
                ssrn_dim=cfg.ssrn_dim, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, cfg.vocab_len - 1, (2, cfg.max_text_len)),
                       jnp.int32)
    spk = jnp.asarray(rng.normal(size=(2, cfg.spk_emb_dim)), jnp.float32)
    mel_ex = jnp.asarray(rng.uniform(0.05, 0.95, (2, 4, cfg.mel.freq_bins)),
                         jnp.float32)
    key = jax.random.PRNGKey(0)
    p1 = melsyn.init(key, shift_right(mel_ex), text, spk)
    p2 = ssrn.init(key, mel_ex)
    syn = Synthesizer(cfg, melsyn, ssrn, p1, p2,
                      n_frames=cfg.max_frame_num, gl_iters=3)
    return cfg, syn


def _mk_batcher(cfg, syn, **kw):
    kw.setdefault("max_batch", 4)
    kw.setdefault("batch_wait_ms", 60.0)
    kw.setdefault("trim_db", None)   # random-param audio may trim to nothing
    return BatchingSynthesizer(cfg, syn, **kw)


def test_device_pcm_matches_host_finalize(serve_setup):
    """The on-device int16 path (fetch-bandwidth optimization) equals the
    host finalize path up to one PCM quantization step."""
    cfg, syn = serve_setup
    spk = np.full(cfg.spk_emb_dim, 0.2, np.float32)
    b_host = _mk_batcher(cfg, syn, device_pcm=False)
    b_dev = _mk_batcher(cfg, syn, device_pcm=True)
    try:
        y_host = b_host.synthesize("pcm parity", spk, timeout=120)
        y_dev = b_dev.synthesize("pcm parity", spk, timeout=120)
        assert b_dev.device_pcm and not b_host.device_pcm
        assert len(y_host) == len(y_dev)
        np.testing.assert_allclose(y_dev, y_host, atol=1.01 / 32767.0)
    finally:
        b_host.close()
        b_dev.close()


class TestBatchingSynthesizer:
    def test_solo_request_roundtrip(self, serve_setup):
        cfg, syn = serve_setup
        b = _mk_batcher(cfg, syn)
        try:
            spk = np.zeros(cfg.spk_emb_dim, np.float32)
            audio = b.synthesize("hello world", spk, timeout=120)
            assert audio.ndim == 1 and len(audio) > 0
            assert np.all(np.isfinite(audio))
            st = b.stats_dict()
            assert st["n_requests"] == 1 and st["n_batches"] == 1
        finally:
            b.close()

    def test_batch_invariance(self, serve_setup):
        """A request's audio must not depend on its co-batched neighbors
        (production GL init 'spsi' is deterministic/seed-independent)."""
        cfg, syn = serve_setup
        assert cfg.tpu.griffin_lim_init in ("advance", "spsi")
        spk = np.zeros(cfg.spk_emb_dim, np.float32)
        spk2 = np.ones(cfg.spk_emb_dim, np.float32) * 0.3

        # device_pcm off: compare exact float paths (int16 rounding could
        # flip an LSB on cross-program XLA tiling noise)
        b = _mk_batcher(cfg, syn, batch_wait_ms=0.0, device_pcm=False)
        try:
            solo = b.synthesize("invariance", spk, timeout=120)
        finally:
            b.close()

        b = _mk_batcher(cfg, syn, batch_wait_ms=400.0, device_pcm=False)
        try:
            results = {}

            def fire(name, text, s):
                results[name] = b.synthesize(text, s, timeout=120)

            threads = [
                threading.Thread(target=fire, args=("a", "invariance", spk)),
                threading.Thread(target=fire, args=("b", "another one", spk2)),
                threading.Thread(target=fire, args=("c", "third here", spk2)),
            ]
            for t in threads:
                t.start()
                time.sleep(0.02)   # all inside the 400 ms aggregation window
            for t in threads:
                t.join()
            st = b.stats_dict()
            assert st["max_batch_seen"] >= 2, st   # actually co-batched
            # audio must not depend on co-batched neighbors; B=1 vs B=4 are
            # different compiled programs, so allow XLA tiling-order noise
            np.testing.assert_allclose(solo, results["a"], atol=1e-5, rtol=0)
        finally:
            b.close()

    def test_bucket_ladder(self, serve_setup):
        cfg, syn = serve_setup
        b = _mk_batcher(cfg, syn, max_batch=8)
        try:
            assert b._ladder() == [1, 2, 4, 8]
            assert [b._bucket(n) for n in (1, 2, 3, 5, 8)] == [1, 2, 4, 8, 8]
        finally:
            b.close()

    def test_error_isolation(self, serve_setup):
        """A bad request errors out without killing the worker."""
        cfg, syn = serve_setup
        b = _mk_batcher(cfg, syn)
        try:
            with pytest.raises(ValueError, match="spk_emb"):
                b.synthesize("x", np.zeros(3, np.float32), timeout=30)
            audio = b.synthesize("still alive", np.zeros(cfg.spk_emb_dim,
                                                         np.float32), timeout=120)
            assert len(audio) > 0
        finally:
            b.close()


class TestHTTPServer:
    @pytest.fixture(scope="class")
    def server(self, serve_setup, tmp_path_factory):
        cfg, syn = serve_setup
        spk_dir = tmp_path_factory.mktemp("spk_emb")
        np.save(spk_dir / "p225.npy",
                np.zeros(cfg.spk_emb_dim, np.float32))
        batcher = _mk_batcher(cfg, syn)
        httpd = make_http_server(batcher, SpeakerTable(str(spk_dir)),
                                 host="127.0.0.1", port=0)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        yield url
        httpd.shutdown()
        batcher.close()

    def _post(self, url, payload):
        req = urllib.request.Request(
            url + "/synthesize", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        return urllib.request.urlopen(req, timeout=120)

    def test_speakers_and_health(self, server):
        with urllib.request.urlopen(server + "/speakers", timeout=30) as r:
            assert json.load(r)["speakers"] == ["p225"]
        with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
            body = json.load(r)
            assert body["status"] == "ok" and "stats" in body

    def test_synthesize_wav(self, server):
        with self._post(server, {"text": "hello", "speaker": "p225"}) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            data = r.read()
        from scipy.io import wavfile

        sr, samples = wavfile.read(io.BytesIO(data))
        assert sr == 22050 and len(samples) > 0

    def test_synthesize_json_matches_wav(self, server):
        with self._post(server, {"text": "hello", "speaker": "p225",
                                 "format": "json"}) as r:
            body = json.load(r)
        assert body["sr"] == 22050 and len(body["samples"]) > 0

    def test_spk_emb_vector(self, server):
        with self._post(server, {"text": "vec", "spk_emb": [0.0] * 10}) as r:
            assert r.status == 200

    def test_bad_requests(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            self._post(server, {"speaker": "p225"})
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            self._post(server, {"text": "x", "speaker": "nope"})
        assert e.value.code == 400   # unknown speaker rejected pre-synthesis
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(server + "/nothing", timeout=30)
        assert e.value.code == 404


def _stall_process(b):
    """Wrap ``b._process`` so batches block until the returned event is set
    — a deterministic way to hold the worker busy while the queue fills."""
    orig = b._process
    release = threading.Event()

    def slow(batch, frames):
        release.wait(30)
        orig(batch, frames)

    b._process = slow
    return release


class TestOverload:
    def test_queue_full_sheds_with_503_semantics(self, serve_setup):
        """Sustained oversubscription: admissions beyond max_queue raise
        ServerOverloaded instead of growing the backlog; admitted requests
        still complete."""
        cfg, syn = serve_setup
        b = _mk_batcher(cfg, syn, max_batch=1, batch_wait_ms=0.0, max_queue=2)
        release = _stall_process(b)
        spk = np.zeros(cfg.spk_emb_dim, np.float32)
        outcome = {"ok": 0, "shed": 0}
        lock = threading.Lock()

        def fire():
            try:
                b.synthesize("load", spk, timeout=120)
                with lock:
                    outcome["ok"] += 1
            except ServerOverloaded as e:
                assert e.retry_after_s >= 1.0
                with lock:
                    outcome["shed"] += 1

        try:
            threads = [threading.Thread(target=fire) for _ in range(8)]
            for t in threads:
                t.start()
                time.sleep(0.03)   # let the worker pull the first request
            release.set()
            for t in threads:
                t.join()
            # 1 in-flight + 2 queued admitted (±1 for pull-timing slack)
            assert outcome["shed"] >= 3, outcome
            assert outcome["ok"] >= 3, outcome
            assert outcome["ok"] + outcome["shed"] == 8
            st = b.stats_dict()
            assert st["n_rejected"] == outcome["shed"]
            assert st["n_requests"] == outcome["ok"]
        finally:
            release.set()
            b.close()

    def test_abandoned_requests_are_skipped(self, serve_setup):
        """A request whose client timed out is not spent device time on."""
        cfg, syn = serve_setup
        b = _mk_batcher(cfg, syn, max_batch=1, batch_wait_ms=0.0)
        release = _stall_process(b)
        spk = np.zeros(cfg.spk_emb_dim, np.float32)
        try:
            blocker = threading.Thread(
                target=lambda: b.synthesize("blocker", spk, timeout=120))
            blocker.start()
            time.sleep(0.05)   # worker now stalled inside _process
            with pytest.raises(TimeoutError):
                b.synthesize("impatient", spk, timeout=0.05)
            release.set()
            blocker.join()
            audio = b.synthesize("after", spk, timeout=120)
            assert len(audio) > 0
            st = b.stats_dict()
            assert st["n_abandoned"] == 1
            assert st["n_requests"] == 2   # blocker + after, not impatient
        finally:
            release.set()
            b.close()

    def test_close_drains_stragglers(self, serve_setup):
        """A request that slips into the queue after the shutdown sentinel
        (the racy-_closed window) is failed, not left blocking forever."""
        from spoofsv_tpu.serve import _Pending

        cfg, syn = serve_setup
        b = _mk_batcher(cfg, syn, max_batch=1, batch_wait_ms=0.0)
        straggler = _Pending(
            text_ids=np.zeros(cfg.max_text_len, np.int32),
            spk_emb=np.zeros(cfg.spk_emb_dim, np.float32), frames=0)
        b._q.put(None)        # simulate close()'s sentinel winning the race
        b._q.put(straggler)   # enqueued concurrently with shutdown
        b.close()
        assert straggler.done.is_set()
        assert isinstance(straggler.error, RuntimeError)
        with pytest.raises(RuntimeError, match="shut down"):
            b.synthesize("late", np.zeros(cfg.spk_emb_dim, np.float32),
                         timeout=5)

    def test_http_503_with_retry_after(self, serve_setup):
        cfg, syn = serve_setup
        batcher = _mk_batcher(cfg, syn, max_batch=1, batch_wait_ms=0.0,
                              max_queue=1)
        release = _stall_process(batcher)
        httpd = make_http_server(batcher, SpeakerTable(""), port=0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        payload = json.dumps({"text": "x",
                              "spk_emb": [0.0] * cfg.spk_emb_dim}).encode()

        codes = []
        lock = threading.Lock()

        def post():
            req = urllib.request.Request(
                url + "/synthesize", data=payload,
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    with lock:
                        codes.append(r.status)
            except urllib.error.HTTPError as e:
                with lock:
                    codes.append(e.code)
                    if e.code == 503:
                        assert int(e.headers["Retry-After"]) >= 1

        try:
            threads = [threading.Thread(target=post) for _ in range(6)]
            for t in threads:
                t.start()
                time.sleep(0.03)
            release.set()
            for t in threads:
                t.join()
            assert codes.count(503) >= 2, codes
            assert codes.count(200) >= 2, codes
        finally:
            release.set()
            httpd.shutdown()
            batcher.close()

    def test_http_body_cap_413(self, serve_setup):
        cfg, syn = serve_setup
        batcher = _mk_batcher(cfg, syn)
        httpd = make_http_server(batcher, SpeakerTable(""), port=0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        body = json.dumps({"text": "x", "pad": "a" * (MAX_BODY_BYTES + 10)})
        req = urllib.request.Request(
            url + "/synthesize", data=body.encode(),
            headers={"Content-Type": "application/json"})
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req, timeout=60)
            assert e.value.code == 413
        finally:
            httpd.shutdown()
            batcher.close()

    def test_http_negative_content_length_400(self, serve_setup):
        """A negative Content-Length must be rejected up front — passing it
        to rfile.read() would block until the peer closes, pinning the
        handler thread forever (a trivial thread-exhaustion vector)."""
        cfg, syn = serve_setup
        batcher = _mk_batcher(cfg, syn)
        httpd = make_http_server(batcher, SpeakerTable(""), port=0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        host, port = httpd.server_address[:2]
        try:
            with socket.create_connection((host, port), timeout=30) as s:
                s.sendall(b"POST /synthesize HTTP/1.1\r\n"
                          b"Host: x\r\nContent-Length: -1\r\n\r\n")
                s.settimeout(30)
                status = s.recv(4096).split(b"\r\n", 1)[0]
            assert b"400" in status, status
        finally:
            httpd.shutdown()
            batcher.close()


def test_device_pcm_peak_past_duration_cap(serve_setup):
    """The device PCM epilogue is range protection only (|max| over the full
    rollout — nothing can clip in int16); the reference peak normalization
    runs on host over the final trim/cap window. The composed pipeline must
    match the pure-host path even when trim_db AND max_seconds are both set
    and the true peak lies past the raw cap but inside the trimmed window —
    the case where normalizing on device over any static slice diverges."""
    cfg, syn = serve_setup
    max_s = 0.01                       # cap = 220 samples @ 22050
    cap = int(max_s * cfg.sampling_rate)
    b = _mk_batcher(cfg, syn, device_pcm=True, max_seconds=max_s)
    try:
        rng = np.random.default_rng(7)

        def compose(y, trim_db):
            pcm = np.asarray(b._pcm(jnp.asarray(y[None])))[0]
            return finalize_audio(pcm.astype(np.float32) / 32767.0, cfg,
                                  trim_db=trim_db, max_seconds=max_s)

        # cap only: global peak past the cap
        y = np.full(500, 0.1, np.float32)
        y[10], y[400] = 0.5, 0.9
        host = finalize_audio(y, cfg, trim_db=None, max_seconds=max_s)
        got = compose(y, trim_db=None)
        assert len(host) == len(got) == cap
        np.testing.assert_allclose(got, host, atol=2.1 / 32767.0)
        assert abs(got.max() - 0.75) < 1e-3   # scaled by the window peak

        # trim + cap: leading silence shifts the host window past the raw
        # cap, where a larger peak lives (the pre-fix divergence/clip case)
        y = np.zeros(900, np.float32)
        y[150:800] = 0.1 * rng.standard_normal(650).astype(np.float32)
        y[160], y[390] = 0.2, 0.45     # window peak past the raw cap of 220
        host = finalize_audio(y, cfg, trim_db=30.0, max_seconds=max_s)
        got = compose(y, trim_db=30.0)
        assert len(host) == len(got)
        # int16 quantization error is amplified by the host window renorm
        # (×full-peak/window-peak = 0.45/0.2 here); a window MISMATCH — what
        # this test guards — would show up as O(0.1) errors, 3 orders above
        # NB the final float audio may exceed |0.75| on negatives (reference
        # normalizes by SIGNED max) — that is reference semantics, not
        # clipping; device-side int16 clipping would break the allclose.
        np.testing.assert_allclose(got, host, atol=1.5e-4)

        # negative-dominant audio must survive the device roundtrip unclipped
        y = np.full(500, -0.05, np.float32)
        y[30], y[60] = 0.1, -0.8       # |min| >> signed max
        pcm = np.asarray(b._pcm(jnp.asarray(y[None])))[0]
        deq = pcm.astype(np.float32) / 32767.0
        np.testing.assert_allclose(deq, y / 0.8 * 0.75, atol=1.01 / 32767.0)
    finally:
        b.close()


def test_wav_bytes_roundtrip():
    from scipy.io import wavfile

    y = np.sin(np.linspace(0, 40, 1000)).astype(np.float32) * 0.5
    sr, decoded = wavfile.read(io.BytesIO(wav_bytes(y, 22050)))
    assert sr == 22050
    np.testing.assert_allclose(decoded / 32767.0, y, atol=1e-4)


class TestFramesBuckets:
    def test_bucket_estimator(self, serve_setup):
        cfg, syn = serve_setup
        b = _mk_batcher(cfg, syn, frames_buckets=[4, 8], frames_per_char=0.5,
                        min_frames=2)
        try:
            assert b.frames_buckets == [4, 8]
            assert b._frames_bucket(3) == 4    # est 2
            assert b._frames_bucket(9) == 8    # est 5
            assert b._frames_bucket(100) == 8  # clamps to max
        finally:
            b.close()

    def test_mixed_length_requests(self, serve_setup):
        """Short and long texts co-queued run in separate frames groups and
        produce audio of the matching rollout length."""
        cfg, syn = serve_setup
        hop = cfg.stft.hop_length
        b = _mk_batcher(cfg, syn, frames_buckets=[4, 8], frames_per_char=0.5,
                        min_frames=2, batch_wait_ms=300.0)
        try:
            results = {}

            def fire(name, text):
                results[name] = b.synthesize(
                    text, np.zeros(cfg.spk_emb_dim, np.float32), timeout=180)

            ts = [threading.Thread(target=fire, args=("short", "ab")),
                  threading.Thread(target=fire, args=("long", "a" * 14))]
            for t in ts:
                t.start()
                time.sleep(0.02)
            for t in ts:
                t.join()
            assert len(results["short"]) == hop * (4 * 4 - 1)
            assert len(results["long"]) == hop * (4 * 8 - 1)
            st = b.stats_dict()
            assert st["n_batches"] == 2 and st["n_requests"] == 2
        finally:
            b.close()


class TestRequestValidation:
    def test_bad_inputs_are_bad_requests(self, serve_setup):
        from spoofsv_tpu.serve import BadRequest

        cfg, syn = serve_setup
        b = _mk_batcher(cfg, syn)
        try:
            with pytest.raises(BadRequest, match="string"):
                b.synthesize(42, np.zeros(cfg.spk_emb_dim, np.float32),
                             timeout=30)
            with pytest.raises(BadRequest, match="MAX_TEXT_LEN"):
                b.synthesize("x" * (cfg.max_text_len + 5),
                             np.zeros(cfg.spk_emb_dim, np.float32), timeout=30)
            with pytest.raises(BadRequest, match="float vector"):
                b.synthesize("ok", {"not": "a vector"}, timeout=30)
        finally:
            b.close()

    def test_http_client_errors_are_400(self, serve_setup, tmp_path_factory):
        cfg, syn = serve_setup
        batcher = _mk_batcher(cfg, syn)
        httpd = make_http_server(batcher, SpeakerTable(""), port=0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            for payload, frag in (
                    ({"text": "x", "spk_emb": [0.1, 0.2]}, "dim"),
                    ({"text": "y" * (cfg.max_text_len + 5),
                      "spk_emb": [0.0] * cfg.spk_emb_dim}, "MAX_TEXT_LEN")):
                req = urllib.request.Request(
                    url + "/synthesize", data=json.dumps(payload).encode(),
                    headers={"Content-Type": "application/json"})
                with pytest.raises(urllib.error.HTTPError) as e:
                    urllib.request.urlopen(req, timeout=60)
                assert e.value.code == 400
                assert frag in json.loads(e.value.read())["error"]
        finally:
            httpd.shutdown()
            batcher.close()


class TestMeshServing:
    def test_ladder_and_requests_under_mesh(self, serve_setup):
        """Every compiled batch size must divide the mesh data axis; solo
        requests pad up to the shard count."""
        from spoofsv_tpu.parallel.mesh import make_mesh

        cfg, _ = serve_setup
        melsyn = MelSyn(vocab_len=cfg.vocab_len, condition=True,
                        spk_emb_dim=cfg.spk_emb_dim,
                        text_emb_dim=cfg.text_emb_dim,
                        freq_bins=cfg.mel.freq_bins, hidden_dim=cfg.hidden_dim,
                        dtype=jnp.float32)
        ssrn = SSRN(freq_bins=cfg.mel.freq_bins, output_bins=cfg.lin_bins,
                    ssrn_dim=cfg.ssrn_dim, dtype=jnp.float32)
        rng = np.random.default_rng(1)
        text = jnp.asarray(rng.integers(1, cfg.vocab_len - 1,
                                        (2, cfg.max_text_len)), jnp.int32)
        spk = jnp.asarray(rng.normal(size=(2, cfg.spk_emb_dim)), jnp.float32)
        mel_ex = jnp.asarray(rng.uniform(0.05, 0.95, (2, 4, cfg.mel.freq_bins)),
                             jnp.float32)
        key = jax.random.PRNGKey(0)
        p1 = melsyn.init(key, shift_right(mel_ex), text, spk)
        p2 = ssrn.init(key, mel_ex)
        syn = Synthesizer(cfg, melsyn, ssrn, p1, p2,
                          n_frames=cfg.max_frame_num, gl_iters=3,
                          mesh=make_mesh(4))
        b = _mk_batcher(cfg, syn, max_batch=6)
        try:
            assert b._ladder() == [4, 8]
            assert all(r % 4 == 0 for r in b._ladder())
            audio = b.synthesize("mesh solo", np.zeros(cfg.spk_emb_dim,
                                                       np.float32), timeout=180)
            assert len(audio) > 0 and np.isfinite(audio).all()
        finally:
            b.close()

    def test_frames_buckets_under_mesh(self, serve_setup):
        """Lazy per-frames Synthesizers re-wrap already-replicated params —
        must be a no-op, and short/long requests both succeed sharded."""
        from spoofsv_tpu.parallel.mesh import make_mesh

        cfg, _ = serve_setup
        melsyn = MelSyn(vocab_len=cfg.vocab_len, condition=True,
                        spk_emb_dim=cfg.spk_emb_dim,
                        text_emb_dim=cfg.text_emb_dim,
                        freq_bins=cfg.mel.freq_bins, hidden_dim=cfg.hidden_dim,
                        dtype=jnp.float32)
        ssrn = SSRN(freq_bins=cfg.mel.freq_bins, output_bins=cfg.lin_bins,
                    ssrn_dim=cfg.ssrn_dim, dtype=jnp.float32)
        rng = np.random.default_rng(2)
        text = jnp.asarray(rng.integers(1, cfg.vocab_len - 1,
                                        (2, cfg.max_text_len)), jnp.int32)
        spk = jnp.asarray(rng.normal(size=(2, cfg.spk_emb_dim)), jnp.float32)
        mel_ex = jnp.asarray(rng.uniform(0.05, 0.95, (2, 4, cfg.mel.freq_bins)),
                             jnp.float32)
        key = jax.random.PRNGKey(0)
        p1 = melsyn.init(key, shift_right(mel_ex), text, spk)
        p2 = ssrn.init(key, mel_ex)
        syn = Synthesizer(cfg, melsyn, ssrn, p1, p2,
                          n_frames=cfg.max_frame_num, gl_iters=3,
                          mesh=make_mesh(4))
        b = _mk_batcher(cfg, syn, frames_buckets=[4, 8], frames_per_char=0.5,
                        min_frames=2)
        try:
            hop = cfg.stft.hop_length
            short = b.synthesize("ab", np.zeros(cfg.spk_emb_dim, np.float32),
                                 timeout=180)
            long = b.synthesize("a" * 14, np.zeros(cfg.spk_emb_dim,
                                                   np.float32), timeout=180)
            assert len(short) == hop * (4 * 4 - 1)
            assert len(long) == hop * (4 * 8 - 1)
        finally:
            b.close()


class TestDeadlines:
    def test_expired_at_door(self, serve_setup):
        """Non-positive deadline fails immediately, no queue side effects."""
        from spoofsv_tpu.serve import DeadlineExceeded

        cfg, syn = serve_setup
        b = _mk_batcher(cfg, syn)
        try:
            with pytest.raises(DeadlineExceeded):
                b.synthesize("too late", np.zeros(cfg.spk_emb_dim, np.float32),
                             deadline_s=0)
            assert b.stats_dict()["n_expired"] == 1
            assert b._q.qsize() == 0
        finally:
            b.close()

    def test_expires_while_queued(self, serve_setup):
        """A request whose deadline passes in the queue gets 504 semantics at
        batch-assembly time (no device work); one admitted alongside with a
        generous deadline completes normally."""
        from spoofsv_tpu.serve import DeadlineExceeded

        cfg, syn = serve_setup
        b = _mk_batcher(cfg, syn, max_batch=1, batch_wait_ms=0.0)
        release = _stall_process(b)
        spk = np.zeros(cfg.spk_emb_dim, np.float32)
        results = {}

        def call(name, **kw):
            try:
                results[name] = b.synthesize(f"req {name}", spk,
                                             timeout=120, **kw)
            except BaseException as e:  # noqa: BLE001
                results[name] = e

        try:
            # A occupies the (stalled) worker; B expires in the queue while
            # C's deadline is generous enough to survive the stall.
            ta = threading.Thread(target=call, args=("a",))
            ta.start()
            time.sleep(0.1)          # let the worker collect A and stall
            tb = threading.Thread(target=call, args=("b",),
                                  kwargs={"deadline_s": 0.2})
            tc = threading.Thread(target=call, args=("c",),
                                  kwargs={"deadline_s": 120.0})
            tb.start()
            tc.start()
            time.sleep(0.5)          # B's deadline passes while queued
            release.set()
            for t in (ta, tb, tc):
                t.join()
            assert isinstance(results["b"], DeadlineExceeded), results["b"]
            assert isinstance(results["a"], np.ndarray)
            assert isinstance(results["c"], np.ndarray)
            assert b.stats_dict()["n_expired"] == 1
        finally:
            release.set()
            b.close()

    def test_deadline_orders_frames_groups(self, serve_setup):
        """When one collection spans several frames groups, the group holding
        the tightest surviving deadline runs first (EDF) instead of the
        shortest rollout — and deadlineless collections keep the
        shortest-first order."""
        cfg, syn = serve_setup
        b = _mk_batcher(cfg, syn, max_batch=4, batch_wait_ms=250.0,
                        frames_buckets=[4, 8], frames_per_char=0.5,
                        min_frames=2)
        order = []
        orig = b._process
        release = threading.Event()
        stalled = threading.Event()

        def wrapped(batch, frames):
            if not stalled.is_set():
                stalled.set()
                release.wait(30)
            else:
                order.append(frames)
            orig(batch, frames)

        b._process = wrapped
        spk = np.zeros(cfg.spk_emb_dim, np.float32)
        results = {}

        def call(name, text, **kw):
            try:
                results[name] = b.synthesize(text, spk, timeout=120, **kw)
            except BaseException as e:  # noqa: BLE001
                results[name] = e

        try:
            # occupy the worker, then queue a deadlineless short text
            # (bucket 4) and a deadline'd long text (bucket 8) — EDF must
            # run the 8-frames group first despite the longer rollout
            t0 = threading.Thread(target=call, args=("stall", "xx"))
            t0.start()
            stalled.wait(30)
            ts = [threading.Thread(target=call, args=("short", "ab")),
                  threading.Thread(target=call, args=("long", "a" * 14),
                                   kwargs={"deadline_s": 60.0})]
            for t in ts:
                t.start()
                time.sleep(0.02)
            time.sleep(0.2)
            release.set()
            t0.join()
            for t in ts:
                t.join()
            assert order == [8, 4], order
            assert all(isinstance(v, np.ndarray) for v in results.values()), \
                results
        finally:
            release.set()
            b.close()

    def test_http_deadline_504(self, serve_setup):
        cfg, syn = serve_setup
        batcher = _mk_batcher(cfg, syn)
        httpd = make_http_server(batcher, SpeakerTable(""), port=0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        payload = json.dumps({"text": "x", "deadline_ms": 0,
                              "spk_emb": [0.0] * cfg.spk_emb_dim}).encode()
        try:
            req = urllib.request.Request(
                url + "/synthesize", data=payload,
                headers={"Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=60)
            assert ei.value.code == 504
            assert "expired" in json.loads(ei.value.read())["error"]
        finally:
            httpd.shutdown()
            batcher.close()


class TestSpeculative:
    """Speculative short-rollout escalation: sub-maximal-bucket requests
    whose decode didn't consume the text (monotonic-attention completion
    check) retry one bucket up instead of returning truncated speech."""

    def _fake_syn_for(self, cfg, calls, short_reaches_end):
        N = cfg.max_text_len
        hop = cfg.stft.hop_length

        def syn_for(frames):
            def run(text, spk, key):
                bsz = text.shape[0]
                calls.append((frames, bsz))
                audio = np.full((bsz, frames * hop), 0.1, np.float32)
                attn = np.zeros((bsz, N, frames), np.float32)
                pos = N - 1 if (short_reaches_end or frames >= 8) else 1
                attn[:, pos, -1] = 1.0
                return audio, None, attn

            return run

        return syn_for

    def test_incomplete_decode_escalates(self, serve_setup):
        cfg, syn = serve_setup
        b = _mk_batcher(cfg, syn, max_batch=4, batch_wait_ms=0.0,
                        frames_buckets=[4, 8], frames_per_char=0.5,
                        min_frames=2, speculative=True, device_pcm=False)
        calls = []
        b._syn_for = self._fake_syn_for(cfg, calls, short_reaches_end=False)
        hop = cfg.stft.hop_length
        try:
            y = b.synthesize("abcd", np.zeros(cfg.spk_emb_dim, np.float32),
                             timeout=60)
            # first pass at bucket 4 found the text unconsumed; the audio
            # the caller gets comes from the full-rollout retry
            assert [f for f, _ in calls] == [4, 8], calls
            assert len(y) == 8 * hop
            st = b.stats_dict()
            assert st["n_escalated"] == 1
            assert st["n_requests"] == 1      # counted once, at completion
            assert st["n_batches"] == 2
        finally:
            b.close()

    def test_complete_decode_stays_in_short_bucket(self, serve_setup):
        cfg, syn = serve_setup
        b = _mk_batcher(cfg, syn, max_batch=4, batch_wait_ms=0.0,
                        frames_buckets=[4, 8], frames_per_char=0.5,
                        min_frames=2, speculative=True, device_pcm=False)
        calls = []
        b._syn_for = self._fake_syn_for(cfg, calls, short_reaches_end=True)
        hop = cfg.stft.hop_length
        try:
            y = b.synthesize("abcd", np.zeros(cfg.spk_emb_dim, np.float32),
                             timeout=60)
            assert [f for f, _ in calls] == [4], calls
            assert len(y) == 4 * hop
            assert b.stats_dict()["n_escalated"] == 0
        finally:
            b.close()

    def test_max_bucket_never_escalates(self, serve_setup):
        """A request already in the largest bucket keeps today's truncation
        semantics (no completion check, no infinite retry)."""
        cfg, syn = serve_setup
        b = _mk_batcher(cfg, syn, max_batch=4, batch_wait_ms=0.0,
                        frames_buckets=[4, 8], frames_per_char=0.5,
                        min_frames=2, speculative=True, device_pcm=False)
        calls = []
        # even the long rollout "never reaches the end" here: attn pos 1
        N = cfg.max_text_len
        hop = cfg.stft.hop_length

        def syn_for(frames):
            def run(text, spk, key):
                calls.append(frames)
                bsz = text.shape[0]
                audio = np.full((bsz, frames * hop), 0.1, np.float32)
                attn = np.zeros((bsz, N, frames), np.float32)
                attn[:, 1, -1] = 1.0
                return audio, None, attn

            return run

        b._syn_for = syn_for
        try:
            y = b.synthesize("a" * 14, np.zeros(cfg.spk_emb_dim, np.float32),
                             timeout=60)
            assert calls == [8], calls     # est 7 -> bucket 8 (max) directly
            assert len(y) == 8 * hop
            assert b.stats_dict()["n_escalated"] == 0
        finally:
            b.close()


class TestAttnTrim:
    """Attention-gated end trim: the waveform is cut attn_trim decoder
    frames after the completion frame (first frame whose furthest attended
    position reaches the text end), removing post-text babble the amplitude
    trim cannot catch (docs/SPECULATIVE.json diagnosis)."""

    def _syn_completing_at(self, cfg, complete_frame):
        N = cfg.max_text_len
        hop = cfg.stft.hop_length

        def syn_for(frames):
            def run(text, spk, key):
                bsz = text.shape[0]
                audio = np.full((bsz, frames * hop), 0.1, np.float32)
                attn = np.zeros((bsz, N, frames), np.float32)
                if complete_frame is not None and complete_frame < frames:
                    attn[:, N - 1, complete_frame:] = 1.0
                return audio, None, attn

            return run

        return syn_for

    @pytest.mark.parametrize("device_pcm", [False, True])
    def test_cut_at_completion_frame(self, serve_setup, device_pcm):
        cfg, syn = serve_setup
        hop = cfg.stft.hop_length
        b = _mk_batcher(cfg, syn, max_batch=4, batch_wait_ms=0.0,
                        attn_trim=1, device_pcm=device_pcm)
        if device_pcm and not b.device_pcm:
            pytest.skip("log-feature config: no device PCM path")
        b._syn_for = self._syn_completing_at(cfg, complete_frame=5)
        try:
            y = b.synthesize("abcd", np.zeros(cfg.spk_emb_dim, np.float32),
                             timeout=60)
            # completion at frame 5 -> keep (5+1) + pad 1 = 7 frames of 8
            assert len(y) == 7 * hop, (len(y), hop)
        finally:
            b.close()

    def test_never_completed_keeps_full_rollout(self, serve_setup):
        cfg, syn = serve_setup
        hop = cfg.stft.hop_length
        b = _mk_batcher(cfg, syn, max_batch=4, batch_wait_ms=0.0,
                        attn_trim=0, device_pcm=False)
        b._syn_for = self._syn_completing_at(cfg, complete_frame=None)
        try:
            y = b.synthesize("abcd", np.zeros(cfg.spk_emb_dim, np.float32),
                             timeout=60)
            assert len(y) == b.frames_buckets[-1] * hop
        finally:
            b.close()

    def test_composes_with_speculative_escalation(self, serve_setup):
        """An incomplete short-bucket decode escalates (speculative), and
        the retry at the bigger bucket gets the attention cut."""
        cfg, syn = serve_setup
        N = cfg.max_text_len
        hop = cfg.stft.hop_length
        b = _mk_batcher(cfg, syn, max_batch=4, batch_wait_ms=0.0,
                        frames_buckets=[4, 8], frames_per_char=0.5,
                        min_frames=2, speculative=True, attn_trim=0,
                        device_pcm=False)
        calls = []

        def syn_for(frames):
            def run(text, spk, key):
                bsz = text.shape[0]
                calls.append(frames)
                audio = np.full((bsz, frames * hop), 0.1, np.float32)
                attn = np.zeros((bsz, N, frames), np.float32)
                if frames >= 8:          # completes at frame 5 of 8 only
                    attn[:, N - 1, 5:] = 1.0
                return audio, None, attn

            return run

        b._syn_for = syn_for
        try:
            y = b.synthesize("abcd", np.zeros(cfg.spk_emb_dim, np.float32),
                             timeout=60)
            assert calls == [4, 8], calls
            assert b.stats_dict()["n_escalated"] == 1
            assert len(y) == 6 * hop     # (5+1) + pad 0 of the retry's 8
        finally:
            b.close()
