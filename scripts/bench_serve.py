#!/usr/bin/env python
"""Serving load benchmark: concurrent requests through the micro-batching
scheduler (and optionally the HTTP layer) on the live TPU.

Reports achieved throughput (requests/s, audio realtime factor) and latency
percentiles at a given concurrency — the serving-facing complement of
bench.py's offline batch number. Random params at reference dims by default
(perf only; quality is the campaign's job); pass --config to load trained
checkpoints, which a --speculative A/B needs for meaningful attention.

Usage: python scripts/bench_serve.py [--concurrency 32] [--requests 128]
       [--max_batch 16] [--http] [--speculative --config <cfg.json>]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts._benchlib import setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from spoofsv_tpu.config import Config  # noqa: E402
from spoofsv_tpu.infer.synthesize import Synthesizer  # noqa: E402
from spoofsv_tpu.models import MelSyn, SSRN  # noqa: E402
from spoofsv_tpu.serve import BatchingSynthesizer  # noqa: E402
from spoofsv_tpu.train.steps import shift_right  # noqa: E402

SENTENCES = [
    "the birch canoe slid on the smooth planks",
    "glue the sheet to the dark blue background",
    "it is easy to tell the depth of a well",
    "these days a chicken leg is a rare dish",
    "rice is often served in round bowls",
    "the juice of lemons makes fine punch",
    "the box was thrown beside the parked truck",
    "the hogs were fed chopped corn and garbage",
]


def main():
    ps = argparse.ArgumentParser()
    ps.add_argument("--concurrency", type=int, default=32)
    ps.add_argument("--requests", type=int, default=128)
    ps.add_argument("--max_batch", type=int, default=16)
    ps.add_argument("--batch_wait_ms", type=float, default=20.0)
    ps.add_argument("--http", action="store_true",
                    help="drive through the HTTP layer instead of in-process")
    ps.add_argument("--frames_buckets", type=str, default=None,
                    help="comma-separated rollout ladder (e.g. '128,200,325')")
    ps.add_argument("--speculative", action="store_true",
                    help="attention-completion escalation: pair with an "
                         "aggressive --frames_per_char to measure the "
                         "speculative-rollout latency win")
    ps.add_argument("--frames_per_char", type=float, default=3.0)
    ps.add_argument("--min_frames", type=int, default=96)
    ps.add_argument("--overload", action="store_true",
                    help="oversubscribe the bounded queue ~4x and report the "
                         "shed rate (503s) plus latency percentiles of the "
                         "ADMITTED requests — the load-shedding guarantee, "
                         "not peak throughput")
    ps.add_argument("--max_queue", type=int, default=None,
                    help="admission bound (default 16*max_batch; the "
                         "--overload run sizes itself 4x over this)")
    ps.add_argument("--config", type=str, default=None,
                    help="load TRAINED checkpoints from this config's "
                         "INFERENCE_* entries instead of random params — "
                         "required for a meaningful --speculative run "
                         "(random attention escalates arbitrarily)")
    ps.add_argument("--texts", type=str, default=None,
                    help="request-text corpus, one per line (default with "
                         "--config: <config dir>/texts.txt — the model's own "
                         "training corpus; Harvard sentences are "
                         "out-of-distribution for a campaign model and "
                         "escalate spuriously)")
    args = ps.parse_args()

    rng = np.random.default_rng(0)
    if args.config:
        from spoofsv_tpu.cli.main import (apply_runtime_knobs, build_models,
                                          inference_dtype)
        from spoofsv_tpu.config import load_config
        from spoofsv_tpu.utils.checkpoints import load_generator_params

        cfg = load_config(args.config)
        apply_runtime_knobs(cfg, infer=True)
        melsyn, ssrn, _, _ = build_models(cfg, "conditional",
                                          dtype=inference_dtype(cfg))
        p1 = load_generator_params(cfg.inference_text2mel_model, melsyn, cfg)
        p2 = load_generator_params(cfg.inference_ssrn_model, ssrn, cfg,
                                   kind="ssrn")
    else:
        cfg = Config()
        dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                 else jnp.float32)
        melsyn = MelSyn(vocab_len=cfg.vocab_len, condition=True,
                        spk_emb_dim=cfg.spk_emb_dim,
                        text_emb_dim=cfg.text_emb_dim,
                        freq_bins=cfg.mel.freq_bins, hidden_dim=cfg.hidden_dim,
                        dtype=dtype)
        ssrn = SSRN(freq_bins=cfg.mel.freq_bins, output_bins=cfg.lin_bins,
                    ssrn_dim=cfg.ssrn_dim, dtype=dtype)
        text_ex = jnp.asarray(rng.integers(1, cfg.vocab_len - 1,
                                           (2, cfg.max_text_len)), jnp.int32)
        spk_ex = jnp.asarray(rng.normal(size=(2, cfg.spk_emb_dim)),
                             jnp.float32)
        mel_ex = jnp.asarray(rng.uniform(0.05, 0.95,
                                         (2, 8, cfg.mel.freq_bins)),
                             jnp.float32)
        key = jax.random.PRNGKey(0)
        p1 = jax.jit(melsyn.init)(key, shift_right(mel_ex), text_ex, spk_ex)
        p2 = jax.jit(ssrn.init)(key, mel_ex)
    syn = Synthesizer(cfg, melsyn, ssrn, p1, p2)

    if args.overload:
        # size the offered load ~4x over the admission bound
        if args.max_queue is None:
            args.max_queue = 2 * args.max_batch
        args.concurrency = max(args.concurrency, 4 * args.max_queue)
        args.requests = max(args.requests, 4 * args.concurrency)

    batcher = BatchingSynthesizer(
        cfg, syn, max_batch=args.max_batch,
        batch_wait_ms=args.batch_wait_ms, trim_db=None,
        max_queue=args.max_queue,
        frames_buckets=[int(x) for x in args.frames_buckets.split(",")]
        if args.frames_buckets else None,
        speculative=args.speculative, frames_per_char=args.frames_per_char,
        min_frames=args.min_frames)
    print(f"[bench_serve] warming ladder {batcher._ladder()} "
          f"(first compiles are slow)...", flush=True)
    t0 = time.perf_counter()
    batcher.warmup()
    print(f"[bench_serve] warmup {time.perf_counter() - t0:.1f}s", flush=True)

    texts = SENTENCES
    texts_path = args.texts or (
        os.path.join(os.path.dirname(args.config), "texts.txt")
        if args.config else None)
    if texts_path and os.path.exists(texts_path):
        texts = [ln.strip() for ln in open(texts_path) if ln.strip()]

    if args.config and os.path.isdir(cfg.spk_emb_dir):
        # trained checkpoints get the speakers they were trained on —
        # speculation's attention-completion check is only meaningful with
        # in-distribution conditioning
        embs = sorted(os.listdir(cfg.spk_emb_dir))
        spk = np.stack(
            [np.load(os.path.join(cfg.spk_emb_dir, embs[i % len(embs)]))
             for i in range(args.concurrency)]).astype(np.float32)
    else:
        spk = rng.normal(size=(args.concurrency,
                               cfg.spk_emb_dim)).astype(np.float32)

    target = None
    if args.http:
        import urllib.request

        from spoofsv_tpu.serve import SpeakerTable, make_http_server

        httpd = make_http_server(batcher, SpeakerTable(""), port=0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        port = httpd.server_address[1]

        def call(i, s):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/synthesize",
                data=json.dumps({"text": texts[i % len(texts)],
                                 "spk_emb": s.tolist()}).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=600) as r:
                    return (len(r.read()) - 44) // 2   # 16-bit PCM samples
            except urllib.error.HTTPError as e:
                if e.code == 503:
                    return None   # shed
                raise
        target = call
    else:
        from spoofsv_tpu.serve import ServerOverloaded

        def call(i, s):
            try:
                return len(batcher.synthesize(texts[i % len(texts)],
                                              s, timeout=600))
            except ServerOverloaded:
                return None   # shed
        target = call

    lat = []
    shed = [0]
    lock = threading.Lock()
    idx = iter(range(args.requests))

    def worker(wid):
        while True:
            with lock:
                i = next(idx, None)
            if i is None:
                return
            t = time.perf_counter()
            n = target(i, spk[wid])
            dt = time.perf_counter() - t
            with lock:
                if n is None:
                    shed[0] += 1
                else:
                    lat.append((dt, n))

    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(args.concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    times = sorted(d for d, _ in lat)
    audio_s = sum(n for _, n in lat) / cfg.sampling_rate
    st = batcher.stats_dict()
    detail = {
        "mode": "http" if args.http else "inproc",
        "requests": args.requests, "concurrency": args.concurrency,
        "wall_s": round(wall, 2),
        "req_per_s": round(len(lat) / wall, 2),
        "latency_s_p50": round(times[len(times) // 2], 2),
        "latency_s_p95": round(times[int(0.95 * len(times)) - 1], 2),
        "mean_batch": st["mean_batch"], "n_batches": st["n_batches"],
        "n_escalated": st["n_escalated"],
        "backend": jax.default_backend(),
    }
    if args.overload:
        detail.update(max_queue=args.max_queue, n_shed=shed[0],
                      n_admitted=len(lat),
                      shed_rate=round(shed[0] / args.requests, 3),
                      n_rejected_stat=st["n_rejected"])
        print(json.dumps({
            "metric": "serve_overload_admitted_p95_s",
            "value": detail["latency_s_p95"],
            "unit": "s",
            "detail": detail,
        }))
    else:
        print(json.dumps({
            "metric": "serve_realtime_factor",
            "value": round(audio_s / wall, 1),
            "unit": "audio_s/s",
            "detail": detail,
        }))
    batcher.close()


if __name__ == "__main__":
    main()
