"""``spoofsv-serve``: production micro-batching synthesis server.

No reference counterpart — the reference synthesizes offline
(``synthesize.py``); this serves the same trained checkpoints
(``config.json`` ``INFERENCE_TEXT2MEL_MODEL`` / ``INFERENCE_SSRN_MODEL``)
behind an HTTP endpoint with TPU micro-batching (see
:mod:`spoofsv_tpu.serve`).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ps = argparse.ArgumentParser(description="spoofsv synthesis server")
    ps.add_argument("-C", "--configuration", type=str, default=None)
    ps.add_argument("--host", type=str, default="127.0.0.1")
    ps.add_argument("--port", type=int, default=8571)
    ps.add_argument("--max_batch", type=int, default=8,
                    help="micro-batch aggregation limit (power-of-two bucket "
                         "ladder below it; each bucket is one compiled program)")
    ps.add_argument("--batch_wait_ms", type=float, default=10.0,
                    help="max time to wait for co-batched requests after the "
                         "first arrives")
    ps.add_argument("--trim_db", type=float, default=30.0,
                    help="output silence trim threshold (reference "
                         "generate_test_utterances.py:136); negative disables")
    ps.add_argument("--max_seconds", type=float, default=None,
                    help="cap output duration (reference caps spoof utts at 9 s)")
    ps.add_argument("--no_warmup", action="store_true",
                    help="skip pre-compiling the bucket-ladder programs")
    ps.add_argument("--frames_buckets", type=str, default=None,
                    help="comma-separated rollout-length ladder (e.g. "
                         "'120,200,325'): short texts decode a shorter fixed "
                         "rollout, cutting their latency ~proportionally. "
                         "Default: one full-length bucket (reference "
                         "behavior, MAX_FRAME_NUM)")
    ps.add_argument("--frames_per_char", type=float, default=3.0,
                    help="frames-bucket estimator: bucket holding "
                         "frames_per_char*len(text) (generous ~2.5x over "
                         "measured speech rate)")
    ps.add_argument("--speculative", action="store_true",
                    help="retry sub-maximal-bucket requests whose decode "
                         "didn't consume the text (monotonic-attention "
                         "completion check) one bucket up instead of "
                         "truncating — lets --frames_per_char sit near the "
                         "true speech rate (2.0 on the campaign corpus; "
                         "real speech varies more) for shorter typical "
                         "rollouts")
    ps.add_argument("--attn_trim", type=int, default=None, metavar="PAD",
                    help="attention-gated END trim: cut each waveform PAD "
                         "decoder frames after its decode consumed the text "
                         "(monotonic-attention completion frame), removing "
                         "the post-text babble an amplitude trim cannot "
                         "catch; off by default")
    ps.add_argument("--mesh", type=str, default=None, metavar="N|all",
                    help="data-parallel serving over an N-device mesh")
    ps.add_argument("--max_queue", type=int, default=None,
                    help="admission bound: pending requests beyond this get "
                         "503 + Retry-After instead of queueing (default "
                         "16*max_batch; 0 = unbounded)")
    ps.add_argument("--request_timeout", type=float, default=600.0,
                    help="per-request deadline (s); timed-out requests are "
                         "skipped by the batcher if still queued")
    args = ps.parse_args(argv)

    import jax

    from spoofsv_tpu.cli.main import (apply_runtime_knobs, build_models,
                                      inference_dtype, resolve_mesh)
    from spoofsv_tpu.config import load_config
    from spoofsv_tpu.infer.synthesize import Synthesizer
    from spoofsv_tpu.serve import (BatchingSynthesizer, SpeakerTable,
                                   make_http_server)
    from spoofsv_tpu.utils.checkpoints import load_generator_params

    jax.config.update("jax_compilation_cache_dir",
                      __import__("os").path.expanduser("~/.cache/spoofsv_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = load_config(args.configuration)
    apply_runtime_knobs(cfg, infer=True)
    melsyn, ssrn, _, _ = build_models(cfg, "conditional",
                                      dtype=inference_dtype(cfg))
    m1 = load_generator_params(cfg.inference_text2mel_model, melsyn, cfg)
    m2 = load_generator_params(cfg.inference_ssrn_model, ssrn, cfg, kind="ssrn")
    syn = Synthesizer(cfg, melsyn, ssrn, m1, m2, mesh=resolve_mesh(args, cfg))

    batcher = BatchingSynthesizer(
        cfg, syn, max_batch=args.max_batch, batch_wait_ms=args.batch_wait_ms,
        trim_db=args.trim_db if args.trim_db >= 0 else None,
        max_seconds=args.max_seconds,
        frames_buckets=[int(x) for x in args.frames_buckets.split(",")]
        if args.frames_buckets else None,
        frames_per_char=args.frames_per_char,
        max_queue=args.max_queue, speculative=args.speculative,
        attn_trim=args.attn_trim)
    if not args.no_warmup:
        print("[serve] warming bucket-ladder compiles "
              f"{batcher._ladder()} ...", flush=True)
        batcher.warmup()
    speakers = SpeakerTable(cfg.spk_emb_dir)
    httpd = make_http_server(batcher, speakers, host=args.host,
                             port=args.port,
                             request_timeout=args.request_timeout)
    print(f"[serve] listening on http://{args.host}:{httpd.server_address[1]} "
          f"(max_batch={args.max_batch}, wait={args.batch_wait_ms}ms, "
          f"backend={jax.default_backend()})", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        batcher.close()


if __name__ == "__main__":
    main()
