"""Production synthesis serving: micro-batching TTS server on TPU.

The reference has no serving story — synthesis is an offline batch script
(``synthesize.py``, ``generate_test_utterances.py``). This module adds the
production path: an HTTP front-end over a micro-batching scheduler that
aggregates concurrent requests into fixed-shape device batches for the fused
decode→SSRN→Griffin-Lim pipeline (:class:`spoofsv_tpu.infer.synthesize.Synthesizer`).

TPU-native design decisions:

* **Fixed compiled shapes** — text is always padded to ``cfg.max_text_len``
  and the batch is padded up to the next size in a power-of-two bucket
  ladder (1, 2, 4, …, ``max_batch``), so at most ``log2(max_batch)+1``
  programs are ever compiled; all of them can be warmed at startup. No
  dynamic shapes reach XLA.
* **Micro-batching** — requests are aggregated until ``max_batch`` or
  ``batch_wait_ms`` elapses after the first queued request. Batch padding
  rows repeat a real row, so padding never introduces a fresh compile or a
  degenerate input.
* **Batch-invariant outputs** — with the production Griffin-Lim init
  (``griffin_lim_init="advance"``) the whole pipeline is deterministic and
  seed-independent, so a request's audio does not depend on which batch it
  rode in (covered by ``tests/test_serve.py``). Under ``"random"`` init the
  per-batch PRNG key makes audio batch-dependent; the server still works
  but loses this property.
* **Zero extra dependencies** — the HTTP layer is stdlib
  ``http.server.ThreadingHTTPServer``; audio is returned as RIFF/WAV bytes
  (16-bit PCM) or JSON float samples.
"""

from __future__ import annotations

import io
import json
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np

from spoofsv_tpu.config import Config
from spoofsv_tpu.data.text import encode_texts
from spoofsv_tpu.infer.synthesize import Synthesizer, finalize_audio


class BadRequest(ValueError):
    """Client-input error (wrong types/dims/lengths) — HTTP 400, never 500."""


class ServerOverloaded(RuntimeError):
    """Request queue is full — HTTP 503 + ``Retry-After``, never an OOM.

    Raised by :meth:`BatchingSynthesizer.synthesize` when admission would
    push the queue past ``max_queue``: shedding load at the door keeps
    latency bounded for admitted requests instead of letting the backlog
    (and every client's wait) grow without bound."""

    def __init__(self, msg: str, retry_after_s: float = 1.0):
        super().__init__(msg)
        self.retry_after_s = retry_after_s


class DeadlineExceeded(RuntimeError):
    """A request's propagated deadline passed before it reached the device —
    HTTP 504. The worker fails expired requests at batch-assembly time
    instead of synthesizing audio the caller has already given up on (the
    server-side twin of the client-side ``abandoned`` flag: abandoned marks
    requests whose *in-process waiter* timed out, deadlines let *remote*
    callers bound their wait without holding the HTTP thread hostage)."""


def wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    """Encode a float waveform as 16-bit PCM RIFF/WAV bytes (in memory)."""
    from scipy.io import wavfile

    y = np.clip(np.asarray(audio, np.float32), -1.0, 1.0)
    buf = io.BytesIO()
    wavfile.write(buf, sr, (y * 32767.0).astype(np.int16))
    return buf.getvalue()


class SpeakerTable:
    """Named speaker-embedding lookup over the reference's ``spk_emb/``
    layout (one 200-dim ``<name>.npy`` per speaker — SURVEY.md §2 asset)."""

    def __init__(self, spk_emb_dir: str):
        self.dir = spk_emb_dir
        self._cache: Dict[str, np.ndarray] = {}

    def names(self) -> List[str]:
        if not self.dir or not os.path.isdir(self.dir):
            return []
        return sorted(f[:-4] for f in os.listdir(self.dir) if f.endswith(".npy"))

    def __call__(self, name: str) -> np.ndarray:
        if name not in self._cache:
            path = os.path.join(self.dir, name + ".npy")
            if not os.path.isfile(path):
                raise KeyError(f"unknown speaker {name!r}")
            self._cache[name] = np.load(path).astype(np.float32).reshape(-1)
        return self._cache[name]


@dataclass
class _Pending:
    text_ids: np.ndarray           # (N,) int32, already padded to max_text_len
    spk_emb: np.ndarray            # (spk_emb_dim,) f32
    frames: int = 0                # assigned frames bucket (0 = max)
    t_enq: float = field(default_factory=time.perf_counter)
    done: threading.Event = field(default_factory=threading.Event)
    audio: Optional[np.ndarray] = None
    error: Optional[BaseException] = None
    # set by the enqueuing thread when its wait times out: the worker then
    # skips the request instead of spending device time on audio nobody
    # will read (under sustained overload abandoned work compounds the
    # backlog — see ServeStats.n_abandoned)
    abandoned: bool = False
    # absolute perf_counter() deadline propagated by the caller; the worker
    # completes requests already past it with DeadlineExceeded at
    # batch-assembly time (ServeStats.n_expired) instead of running them
    deadline: Optional[float] = None
    # number of non-pad text ids — the speculative path compares the
    # decode's final attended position against this to detect truncation
    n_valid: int = 0


@dataclass
class ServeStats:
    n_requests: int = 0
    n_batches: int = 0
    n_errors: int = 0
    n_rejected: int = 0            # shed at admission (queue full → 503)
    n_abandoned: int = 0           # client timed out before the batch ran
    n_expired: int = 0             # deadline passed while queued → 504
    n_escalated: int = 0           # speculative rollout too short, retried
    max_batch_seen: int = 0
    audio_seconds: float = 0.0
    device_seconds: float = 0.0    # wall time inside device calls
    latencies_ms: List[float] = field(default_factory=list)  # bounded

    def as_dict(self) -> dict:
        lat = sorted(self.latencies_ms)

        def pct(p):
            return round(lat[min(len(lat) - 1, int(p * len(lat)))], 1) if lat else None

        return {
            "n_requests": self.n_requests,
            "n_batches": self.n_batches,
            "n_errors": self.n_errors,
            "n_rejected": self.n_rejected,
            "n_abandoned": self.n_abandoned,
            "n_expired": self.n_expired,
            "n_escalated": self.n_escalated,
            "mean_batch": round(self.n_requests / self.n_batches, 2)
            if self.n_batches else None,
            "max_batch_seen": self.max_batch_seen,
            "audio_seconds": round(self.audio_seconds, 1),
            "device_seconds": round(self.device_seconds, 2),
            "realtime_factor": round(self.audio_seconds / self.device_seconds, 1)
            if self.device_seconds > 0 else None,
            "latency_ms_p50": pct(0.50),
            "latency_ms_p95": pct(0.95),
        }


class BatchingSynthesizer:
    """Thread-safe micro-batching front of a :class:`Synthesizer`.

    ``synthesize()`` may be called from any number of threads; a single
    worker thread drains the queue, aggregates up to ``max_batch`` requests
    (waiting at most ``batch_wait_ms`` after the first), pads the batch up
    the power-of-two bucket ladder, runs the fused pipeline once, and
    completes each request with its trimmed, peak-normalized waveform.
    """

    def __init__(self, cfg: Config, synthesizer: Synthesizer,
                 max_batch: int = 8, batch_wait_ms: float = 10.0,
                 trim_db: Optional[float] = 30.0,
                 max_seconds: Optional[float] = None,
                 device_pcm: Optional[bool] = None,
                 frames_buckets: Optional[List[int]] = None,
                 frames_per_char: float = 3.0,
                 min_frames: int = 96,
                 max_queue: Optional[int] = None,
                 speculative: bool = False,
                 spec_margin: int = 1,
                 attn_trim: Optional[int] = None):
        """``frames_buckets``: optional ascending rollout-length ladder (each
        entry ≤ ``cfg.max_frame_num``) — short requests then decode a shorter
        fixed rollout instead of the full ``max_frame_num``, cutting their
        latency roughly proportionally (decode, SSRN and Griffin-Lim all
        scale with frames). A request's bucket is the smallest holding
        ``frames_per_char · len(text) + min_frames-floor`` — generous by
        ~2.5× over measured speech rate, so the trimmed tail, not truncated
        speech, absorbs the estimate (the reference always decodes the full
        MAX_FRAME_NUM, generate_test_utterances.py:114). None (default) = one
        full-length bucket, reference behavior.

        ``max_queue``: admission bound — at most this many requests may be
        queued awaiting a batch; further ``synthesize()`` calls raise
        :class:`ServerOverloaded` (HTTP 503) instead of growing the backlog.
        Default ``16 * max_batch`` (≈16 full batches of headroom, a few
        seconds of work at production batch latency). Pass ``0`` for
        unbounded (pre-round-4 behavior).

        ``speculative``: make short rollout buckets SAFE instead of merely
        generous — after each sub-maximal-bucket batch the worker reads the
        decode's final attended text position (monotonic attention ⇒ the
        furthest position reached) and re-enqueues any request whose decode
        did not consume its text (within ``spec_margin`` ids of the end)
        into the next bucket up, instead of returning truncated speech.
        This lets ``frames_per_char`` be set near the TRUE speech rate
        (2.0 frames/char exactly on the synthetic campaign corpus, measured
        over 600 utts; real speech varies more — which is when escalation
        earns its keep) rather than well over it: typical requests ride a
        correspondingly shorter rollout, and the rare
        under-estimate costs one extra (longer) pass rather than quality.
        The reference has no analog (it always decodes MAX_FRAME_NUM).
        Escalations surface as ``n_escalated`` in stats.

        ``attn_trim``: attention-gated END trim (opt-in; the int is a pad in
        decoder frames, e.g. 4). The amplitude trim (``trim_db``, the
        reference's librosa-style cut) cannot remove post-text BABBLE — the
        AR decoder keeps emitting sound past the end of the text, and on
        rollouts longer than the speech that babble stays above any
        amplitude threshold (measured in docs/SPECULATIVE.json: trimmed
        duration tracked rollout length, not speech length). With
        ``attn_trim`` set, the worker computes each request's completion
        frame — the first decoder frame whose furthest attended text
        position reaches the text's end (same monotonic-attention criterion
        as ``speculative``) — on device, rides it on the audio fetch, and
        cuts the waveform ``attn_trim`` frames after completion before the
        host trim/cap/normalize. Requests whose decode never completes keep
        their full rollout (and, with ``speculative``, escalate instead)."""
        assert max_batch >= 1
        self.cfg = cfg
        self.syn = synthesizer
        self.max_batch = max_batch
        mf = synthesizer.n_frames
        if frames_buckets:
            fb = sorted(set(min(int(b), mf) for b in frames_buckets))
            if fb[-1] != mf:
                fb.append(mf)
        else:
            fb = [mf]
        self.frames_buckets = fb
        self.frames_per_char = frames_per_char
        self.min_frames = min_frames
        self.speculative = speculative and len(fb) > 1
        self.spec_margin = spec_margin
        assert attn_trim is None or attn_trim >= 0
        self.attn_trim = attn_trim
        self._syn_by_frames = {mf: synthesizer}
        self.batch_wait_s = batch_wait_ms / 1e3
        self.trim_db = trim_db
        self.max_seconds = max_seconds
        # device_pcm: peak-normalize (×0.75, reference synthesize.py:147) and
        # quantize to 16-bit PCM ON DEVICE, fetching 2-byte samples instead of
        # f32 — the fetch is the serving bottleneck on remote-TPU transports
        # (B=64 × 15 s × 4 B ≈ 85 MB/batch). Only the non-log feature mode
        # normalizes this way; log mode falls back to the host path.
        import jax.numpy as jnp
        import jax as _jax

        self.device_pcm = (not cfg.norm.log_feature) if device_pcm is None \
            else (device_pcm and not cfg.norm.log_feature)

        # The device scale is RANGE PROTECTION only: |max| over the full
        # rollout keeps every sample in [-0.75, 0.75], so the int16
        # quantization can never clip regardless of where the waveform's
        # peak lies. The reference's signed-max ×0.75 peak normalization
        # (synthesize.py:147 `wav / max(wav)`) is applied on HOST over the
        # final trim/cap window by finalize_audio — the same code path the
        # non-device mode uses — so host/device parity holds in every
        # trim_db/max_seconds combination (previously the device peaked
        # over the raw [0, cap) slice, which diverges from the host's
        # normalize-after-trim window when both knobs are set and the true
        # peak lies past the cap but inside the trimmed window).

        @_jax.jit
        def _pcm(audio):
            peak = jnp.max(jnp.abs(audio), axis=1, keepdims=True)
            y = audio / jnp.maximum(peak, 1e-8) * 0.75
            return jnp.round(jnp.clip(y, -1.0, 1.0) * 32767.0).astype(jnp.int16)

        self._pcm = _pcm
        self.stats = ServeStats()
        self._stats_lock = threading.Lock()
        self.max_queue = 16 * max_batch if max_queue is None else max_queue
        self._q: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._batch_counter = 0
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="spoofsv-serve-batcher")
        self._worker.start()

    # ----------------------------------------------------------- public API
    def synthesize(self, text: str, spk_emb: np.ndarray,
                   timeout: Optional[float] = None,
                   deadline_s: Optional[float] = None) -> np.ndarray:
        """Encode + enqueue one utterance; block until its audio is ready.

        ``timeout`` bounds THIS caller's wait (on expiry the request is
        marked abandoned and the worker skips it). ``deadline_s`` is the
        server-side request deadline: if it passes while the request is
        still queued, the worker completes it with :class:`DeadlineExceeded`
        (HTTP 504) at batch-assembly time instead of synthesizing — a batch
        already on the device always finishes (admitted work is never
        cancelled mid-flight). An already-expired or non-positive deadline
        fails at the door without queue side effects."""
        if self._closed:
            raise RuntimeError("server is shut down")
        if deadline_s is not None and deadline_s <= 0:
            with self._stats_lock:
                self.stats.n_expired += 1
            raise DeadlineExceeded(f"deadline_s={deadline_s} already expired")
        if not isinstance(text, str):
            raise BadRequest(f"text must be a string, got {type(text).__name__}")
        # encode unbounded first: silently truncating (and dropping the EOS
        # the decoder's attention terminates on) would return 200 with audio
        # of only a prefix — reject over-long requests explicitly instead
        raw = encode_texts([text], self.cfg.vocabulary)[0]
        if len(raw) > self.cfg.max_text_len:
            raise BadRequest(
                f"text encodes to {len(raw)} ids; the compiled limit is "
                f"MAX_TEXT_LEN={self.cfg.max_text_len} (reference "
                f"config.json MAX_TEXT_LEN)")
        ids = encode_texts([text], self.cfg.vocabulary,
                           max_len=self.cfg.max_text_len)[0]
        try:
            spk = np.asarray(spk_emb, np.float32).reshape(-1)
        except (TypeError, ValueError) as e:
            raise BadRequest(f"spk_emb is not a float vector: {e}") from e
        if spk.shape[0] != self.cfg.spk_emb_dim:
            raise BadRequest(f"spk_emb must have dim {self.cfg.spk_emb_dim}, "
                             f"got {spk.shape[0]}")
        n_valid = int((ids > 0).sum())
        req = _Pending(text_ids=ids, spk_emb=spk,
                       frames=self._frames_bucket(n_valid), n_valid=n_valid,
                       deadline=(None if deadline_s is None
                                 else time.perf_counter() + deadline_s))
        # admission control: shed load at the door rather than queue beyond
        # max_queue (qsize is approximate under concurrency — that slack is
        # fine, the bound exists to keep the backlog O(max_queue), not exact)
        if self.max_queue and self._q.qsize() >= self.max_queue:
            with self._stats_lock:
                self.stats.n_rejected += 1
            raise ServerOverloaded(
                f"request queue full ({self.max_queue} pending)",
                retry_after_s=self._retry_after_s())
        self._q.put(req)
        if not req.done.wait(timeout):
            req.abandoned = True   # worker will skip it if not yet batched
            raise TimeoutError("synthesis timed out")
        if req.error is not None:
            raise req.error
        return req.audio

    def warmup(self, buckets: Optional[List[int]] = None) -> None:
        """Pre-compile every (batch-bucket × frames-bucket) program
        (first-compile on a remote TPU takes tens of seconds; do it before
        traffic arrives)."""
        import jax

        for frames in self.frames_buckets:
            syn = self._syn_for(frames)
            for b in buckets or self._ladder():
                text = np.zeros((b, self.cfg.max_text_len), np.int32)
                text[:, 0] = 1
                spk = np.zeros((b, self.cfg.spk_emb_dim), np.float32)
                audio, _, _ = syn(text, spk, jax.random.PRNGKey(0))
                if self.device_pcm:   # warm the PCM epilogue jit too
                    np.asarray(self._pcm(audio)[:1, :8])
                else:
                    np.asarray(audio[:1, :8])   # force

    def close(self) -> None:
        """Stop the worker and fail every still-queued request.

        The ``_closed`` check in ``synthesize`` is advisory (a request can
        be enqueued concurrently with the sentinel), so after the worker
        exits we drain the queue and complete the stragglers with an error
        — otherwise their callers would block until their timeout."""
        self._closed = True
        self._q.put(None)
        self._worker.join(timeout=30)
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            if req is not None and not req.done.is_set():
                req.error = RuntimeError("server is shut down")
                req.done.set()

    # ------------------------------------------------------------ internals
    def _retry_after_s(self) -> float:
        """Backlog-proportional retry hint: queued batches × mean batch
        latency (1 s floor, before any batch has completed)."""
        s = self.stats
        if s.n_batches == 0 or s.device_seconds <= 0:
            return 1.0
        per_batch = s.device_seconds / s.n_batches
        return max(1.0, round(self._q.qsize() / self.max_batch * per_batch, 1))

    def _frames_bucket(self, n_chars: int) -> int:
        est = max(self.min_frames, int(np.ceil(self.frames_per_char * n_chars)))
        for b in self.frames_buckets:
            if est <= b:
                return b
        return self.frames_buckets[-1]

    def _syn_for(self, frames: int) -> Synthesizer:
        if frames not in self._syn_by_frames:
            base = self.syn
            self._syn_by_frames[frames] = Synthesizer(
                self.cfg, base.melsyn, base.ssrn, base.melsyn_params,
                base.ssrn_params, n_frames=frames, mesh=base.mesh)
        return self._syn_by_frames[frames]

    def _ladder(self) -> List[int]:
        # under a mesh, every compiled batch must divide the data axis
        # (Synthesizer shards the batch with NamedSharding/shard_map), so the
        # ladder's base rung is the shard count and every rung is a multiple
        base = 1
        if self.syn.mesh is not None:
            base = int(np.prod(self.syn.mesh.devices.shape))
        out, b = [], base
        top = max(self.max_batch, base)
        while b < top:
            out.append(b)
            b *= 2
        out.append(-(-top // base) * base)
        return out

    def _bucket(self, n: int) -> int:
        for b in self._ladder():
            if n <= b:
                return b
        return self.max_batch

    def _collect(self) -> Optional[List[_Pending]]:
        """Block for the first request, then aggregate for batch_wait_s."""
        first = self._q.get()
        if first is None:
            return None
        batch = [first]
        deadline = time.perf_counter() + self.batch_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)   # re-post the shutdown sentinel
                break
            batch.append(nxt)
        return batch

    def _run(self) -> None:
        while True:
            collected = self._collect()
            if collected is None:
                return
            # skip requests whose client already gave up — device time spent
            # on them is pure backlog growth under overload
            live = [r for r in collected if not r.abandoned]
            if len(live) < len(collected):
                with self._stats_lock:
                    self.stats.n_abandoned += len(collected) - len(live)
            # deadline propagation: requests whose deadline passed while
            # queued fail fast (504) instead of consuming device time;
            # anything admitted into a batch below runs to completion
            now = time.perf_counter()
            expired = [r for r in live if r.deadline and r.deadline < now]
            if expired:
                for r in expired:
                    r.error = DeadlineExceeded(
                        f"deadline passed {now - r.deadline:.2f}s before "
                        "the request reached the device")
                    r.done.set()
                with self._stats_lock:
                    self.stats.n_expired += len(expired)
                dead = set(map(id, expired))   # one predicate, one verdict
                live = [r for r in live if id(r) not in dead]
            # split by frames bucket (one compiled rollout length per group;
            # single-bucket configs pass straight through)
            groups: Dict[int, List[_Pending]] = {}
            for r in live:
                groups.setdefault(r.frames or self.frames_buckets[-1],
                                  []).append(r)
            # deadline-aware assembly: when one collection spans several
            # frames groups they run sequentially, so order groups by their
            # tightest surviving deadline (earliest-deadline-first) — a
            # tight-deadline request admitted alongside a deadlineless long
            # batch shouldn't burn its remaining budget waiting behind it.
            # Deadlineless groups keep the shortest-rollout-first order.
            def _urgency(frames: int):
                return (min((r.deadline for r in groups[frames] if r.deadline),
                            default=float("inf")), frames)

            for frames in sorted(groups, key=_urgency):
                self._process(groups[frames], frames)

    def _process(self, batch: List[_Pending], frames: int) -> None:
        import jax

        n = len(batch)
        bsz = self._bucket(n)
        text = np.stack([r.text_ids for r in batch]
                        + [batch[0].text_ids] * (bsz - n))
        spk = np.stack([r.spk_emb for r in batch]
                       + [batch[0].spk_emb] * (bsz - n))
        self._batch_counter += 1
        key = jax.random.PRNGKey(self._batch_counter)
        t0 = time.perf_counter()
        escalate: set = set()
        keep = None
        try:
            import jax.numpy as jnp

            audio, _, attn = self._syn_for(frames)(text, spk, key)
            audio = self._pcm(audio)[:n] if self.device_pcm else audio[:n]
            want_check = self.speculative and frames < self.frames_buckets[-1]
            if want_check or self.attn_trim is not None:
                # monotonic attention: a frame's attended text position is
                # the furthest reached. `done[i, f]` = request i's decode
                # had consumed its text (within spec_margin ids of the end)
                # by frame f. Everything below runs on device and rides the
                # SAME device_get as the audio — a separate fetch costs a
                # full transport roundtrip (~35 ms through a remote-TPU
                # tunnel), which at solo scale cancels the short-rollout win.
                targets = np.asarray([r.n_valid - 1 - self.spec_margin
                                      for r in batch], np.int32)
                done = jnp.argmax(attn[:n], axis=1) >= targets[:, None]
                fetch = [audio]
                if want_check:
                    # not consumed by the FINAL frame → this rollout cut the
                    # decode off; retry one bucket up instead of completing
                    # with truncated speech
                    fetch.append(done[:, -1])
                if self.attn_trim is not None:
                    # completion frame + pad; never-completed decodes keep
                    # the full rollout (escalation handles them if enabled)
                    first = jnp.argmax(done, axis=1) + 1 + self.attn_trim
                    fetch.append(jnp.where(jnp.any(done, axis=1), first,
                                           done.shape[1]))
                out = jax.device_get(tuple(fetch))
                audio = out[0]
                if want_check:
                    escalate.update(i for i in range(n) if not out[1][i])
                if self.attn_trim is not None:
                    keep = out[-1]
            else:
                audio = np.asarray(audio)
        except BaseException as e:  # noqa: BLE001 - forwarded per-request
            for r in batch:
                r.error = e
                r.done.set()
            with self._stats_lock:
                self.stats.n_errors += n
            return
        dt = time.perf_counter() - t0
        if escalate:
            nxt = next(b for b in self.frames_buckets if b > frames)
            for i in sorted(escalate):
                batch[i].frames = nxt
                self._q.put(batch[i])   # already admitted: bypasses max_queue
            with self._stats_lock:
                self.stats.n_escalated += len(escalate)
        now = time.perf_counter()
        for i, r in enumerate(batch):
            if i in escalate:
                continue
            try:
                raw = audio[i]
                if keep is not None:
                    # attention-gated end trim: cut at the completion frame
                    # (+pad) BEFORE the host trim/cap/normalize, so the
                    # post-text babble never reaches the amplitude trim
                    raw = raw[: int(keep[i]) * (raw.shape[-1] // frames)]
                if self.device_pcm:
                    # device applied range protection only; the reference's
                    # peak normalization happens here, over the final
                    # trim/cap window, exactly like the non-device branch
                    y = finalize_audio(raw.astype(np.float32) / 32767.0,
                                       self.cfg, trim_db=self.trim_db,
                                       max_seconds=self.max_seconds)
                else:
                    y = finalize_audio(raw, self.cfg,
                                       trim_db=self.trim_db,
                                       max_seconds=self.max_seconds)
                if not np.all(np.isfinite(y)):
                    raise ValueError("synthesis produced non-finite audio")
                r.audio = y
            except BaseException as e:  # noqa: BLE001
                r.error = e
            r.done.set()
        with self._stats_lock:
            s = self.stats
            # escalated requests are counted when their retry completes
            s.n_requests += n - len(escalate)
            s.n_batches += 1
            s.max_batch_seen = max(s.max_batch_seen, n)
            s.audio_seconds += sum(
                len(r.audio) for r in batch if r.audio is not None
            ) / self.cfg.sampling_rate
            s.device_seconds += dt
            s.latencies_ms.extend(
                (now - r.t_enq) * 1e3 for i, r in enumerate(batch)
                if i not in escalate)
            del s.latencies_ms[:-1000]   # bound the window

    def stats_dict(self) -> dict:
        with self._stats_lock:
            return self.stats.as_dict()


#: POST body admission cap — a /synthesize request is a short text plus at
#: most a spk_emb vector (~200 floats ≈ 4 kB as JSON); 1 MB is generous.
#: Bounding it before the read stops a client from exhausting server memory
#: with a huge declared Content-Length (the host flag is not loopback-only).
MAX_BODY_BYTES = 1 << 20


def make_http_server(batcher: BatchingSynthesizer, speakers: SpeakerTable,
                     host: str = "127.0.0.1", port: int = 0,
                     request_timeout: float = 600.0) -> ThreadingHTTPServer:
    """HTTP front-end. Endpoints:

    * ``POST /synthesize`` — JSON body ``{"text": "...", "speaker": "p225"}``
      or ``{"text": "...", "spk_emb": [200 floats]}``; optional
      ``"format": "wav" | "json"`` (default wav) and ``"deadline_ms": N``
      (server-side deadline — expired-while-queued requests return 504
      without consuming device time). Returns ``audio/wav`` bytes, or
      ``{"sr": ..., "samples": [...]}``.
    * ``GET /speakers`` — available speaker names.
    * ``GET /healthz`` — liveness + serving stats.
    """
    cfg = batcher.cfg

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):   # quiet access log
            pass

        def _json(self, code: int, obj: dict,
                  headers: Optional[dict] = None) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "stats": batcher.stats_dict()})
            elif self.path == "/speakers":
                self._json(200, {"speakers": speakers.names()})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/synthesize":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if length < 0:   # rfile.read(-1) would block until EOF,
                    raise ValueError  # pinning this handler thread forever
            except ValueError:
                self._json(400, {"error": "bad Content-Length"})
                return
            if length > MAX_BODY_BYTES:
                # discard the body in constant memory (chunked, bounded) so
                # the client can read the 413 instead of hitting a reset
                # mid-write; beyond the drain bound just close.
                remaining = min(length, 8 * MAX_BODY_BYTES)
                while remaining > 0:
                    chunk = self.rfile.read(min(remaining, 65536))
                    if not chunk:
                        break
                    remaining -= len(chunk)
                self.close_connection = True
                self._json(413, {"error": f"request body {length} B exceeds "
                                          f"the {MAX_BODY_BYTES} B limit"})
                return
            try:
                req = json.loads(self.rfile.read(length) or b"{}")
                text = req["text"]
                if "spk_emb" in req:
                    spk = np.asarray(req["spk_emb"], np.float32)
                else:
                    spk = speakers(req["speaker"])
                deadline_s = (float(req["deadline_ms"]) / 1e3
                              if "deadline_ms" in req else None)
            except Exception as e:  # noqa: BLE001 - malformed request body
                self._json(400, {"error": f"bad request: {e}"})
                return
            try:
                audio = batcher.synthesize(text, spk, timeout=request_timeout,
                                           deadline_s=deadline_s)
            except BadRequest as e:
                self._json(400, {"error": str(e)})
                return
            except DeadlineExceeded as e:
                self._json(504, {"error": str(e)})
                return
            except ServerOverloaded as e:
                self._json(503, {"error": str(e)}, headers={
                    "Retry-After": str(int(np.ceil(e.retry_after_s)))})
                return
            except BaseException as e:  # noqa: BLE001 - report, don't crash
                self._json(500, {"error": str(e)})
                return
            if req.get("format", "wav") == "json":
                self._json(200, {"sr": cfg.sampling_rate,
                                 "samples": np.asarray(audio, np.float64)
                                 .round(6).tolist()})
            else:
                body = wav_bytes(audio, cfg.sampling_rate)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)
