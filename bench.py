#!/usr/bin/env python
"""Headline benchmark: synthesized audio seconds per wall second per chip.

Full pipeline at reference dims — batched autoregressive Text2Mel decode
(325 frames, scan with causal caches), SSRN ×4 super-resolution, Griffin-Lim
(DFT-matmul on TPU) and de-emphasis — everything jitted on device.

The headline runs the production vocoder config (SPSI instantaneous-
frequency-init Griffin-Lim, 12 iterations since r5 — analysis-by-synthesis
MCD on trained checkpoints TIES the reference's random-64 on both the
copy-synthesis and end-to-end legs, campaign tri-system metrics within
noise, spectral convergence still better than the r3 advance-24 default —
docs/GL_SPSI_CHECK.json); the like-for-like
reference mode (random init, 64 iterations, matching the reference's
librosa call at synthesize.py:147) is ALSO measured and reported in
``detail.gl64_random_ref`` so the headline is never mistaken for a pure
kernel speedup over r1/r2 numbers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.json north-star target of
50× realtime per chip (the reference repo publishes no numbers of its own —
it vocodes per-utterance on CPU via librosa).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def measure_with_fallback(candidates, measure, log=None):
    """Try (name, make_syn) candidates in order; return
    ``(result, chosen_name, degraded_reason)``.

    A transient tunnel error (``UNAVAILABLE``) re-raises so the outer retry
    loop can handle it; any other failure falls through to the next
    candidate, and the first success after a failure carries a loud
    ``degraded`` reason naming EVERY failed config with its own error (r4
    lost its round number to a kernel VMEM OOM in the production config —
    the scoreboard must degrade, not vanish, and the artifact must preserve
    the production failure, not just the last candidate's)."""
    assert candidates, "no vocoder candidates"
    log = log or (lambda msg: print(msg, file=sys.stderr))
    errors = []                     # (name, exception) per failed candidate
    for name, make in candidates:
        try:
            result = measure(make())
        except Exception as e:  # noqa: BLE001 - report, then fall back
            if "UNAVAILABLE" in str(e):
                raise
            log(f"[bench] vocoder config '{name}' failed: {e}")
            errors.append((name, e))
            continue
        degraded = None
        if errors:
            failed = "; ".join(f"{n} failed ({type(e).__name__}: "
                               f"{str(e)[:200]})" for n, e in errors)
            degraded = f"{failed}; measured {name}"
        return result, name, degraded
    raise errors[-1][1]


def bench_ge2e(batch: int = 960) -> None:
    """Secondary metric: GE2E embedder throughput (utts/sec) — the reference's
    other hot loop (``GE2E/train_speech_embedder.py:77``, 120-frame crops)."""
    import jax
    import jax.numpy as jnp

    from spoofsv_tpu.models import SpeechEmbedder

    emb = SpeechEmbedder(hidden=768, num_layers=3, proj=256, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 120, 40)), jnp.float32)
    params = jax.jit(emb.init)(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda p, v: emb.apply(p, v))
    e = fwd(params, x)
    _ = float(jnp.sum(jnp.abs(e)))        # force
    iters = 5
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(iters):
        e = fwd(params, x * (1.0 + 1e-6 * i))
        acc += float(jnp.sum(jnp.abs(e)))
    dt = (time.perf_counter() - t0) / iters
    assert acc > 0
    print(json.dumps({
        "metric": "ge2e_embedder_utts_per_sec",
        "value": round(batch / dt, 1),
        "unit": "utts/s",
        "vs_baseline": None,
        "detail": {"batch": batch, "frames": 120,
                   "backend": jax.default_backend()},
    }))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from spoofsv_tpu.config import Config
    from spoofsv_tpu.infer.synthesize import Synthesizer
    from spoofsv_tpu.models import MelSyn, SSRN
    from spoofsv_tpu.train.steps import shift_right

    if "--ge2e" in sys.argv:
        bench_ge2e()
        return

    cfg = Config()
    from spoofsv_tpu.models.layers import set_default_gate_impl

    set_default_gate_impl(cfg.tpu.highway_infer_impl)
    dtype = jnp.bfloat16
    melsyn = MelSyn(vocab_len=cfg.vocab_len, condition=True,
                    spk_emb_dim=cfg.spk_emb_dim, text_emb_dim=cfg.text_emb_dim,
                    freq_bins=cfg.mel.freq_bins, hidden_dim=cfg.hidden_dim,
                    dtype=dtype)
    ssrn = SSRN(freq_bins=cfg.mel.freq_bins, output_bins=cfg.lin_bins,
                ssrn_dim=cfg.ssrn_dim, dtype=dtype)

    rng = np.random.default_rng(0)
    # throughput rises with batch then flattens: 7656x @256, 7920x @512,
    # 8000x @768 (r3 kernels, v5e) — 768 is the measured knee
    B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 768
    N = 100                      # text length (Harvard sentences are < 100 chars)
    T = cfg.max_frame_num        # 325-frame rollout (generate_test_utterances.py:114)

    text = jnp.asarray(rng.integers(1, cfg.vocab_len - 1, (B, N)), jnp.int32)
    spk = jnp.asarray(rng.normal(size=(B, cfg.spk_emb_dim)), jnp.float32)
    mel_example = jnp.asarray(rng.uniform(0.05, 0.95, (B, 8, cfg.mel.freq_bins)),
                              jnp.float32)

    key = jax.random.PRNGKey(0)
    melsyn_params = jax.jit(melsyn.init)(key, shift_right(mel_example), text, spk)
    ssrn_params = jax.jit(ssrn.init)(key, mel_example)

    # --mesh N: data-parallel synthesis over an N-device mesh (batch sharded
    # over ICI; params replicated). Per-chip realtime divides by N.
    mesh = None
    n_chips = 1
    if "--mesh" in sys.argv:
        from spoofsv_tpu.parallel.mesh import make_mesh

        n_chips = int(sys.argv[sys.argv.index("--mesh") + 1])
        mesh = make_mesh(n_chips)

    def measure(syn):
        def run(k):
            audio, mel, attn = syn(text, spk, k)
            # force full materialization: a scalar reduction fetched to host.
            # (block_until_ready through the remote-TPU tunnel can return
            # before the computation actually retires; fetching a value
            # cannot.)
            return audio, float(jnp.sum(jnp.abs(audio[:, ::997])))

        audio, chk = run(jax.random.PRNGKey(1))   # warmup/compile
        iters = 3
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(iters):
            audio, chk = run(jax.random.PRNGKey(2 + i))
            acc += chk
        dt = (time.perf_counter() - t0) / iters
        assert acc > 0
        audio_seconds = audio.shape[0] * audio.shape[1] / cfg.sampling_rate
        return audio_seconds / dt / n_chips, audio_seconds, dt

    # headline: production vocoder config (GL12 spsi by default). If the
    # production config fails non-transiently (e.g. a kernel compile error —
    # r4 lost its round number to a VMEM OOM here), fall back through
    # known-good vocoder configs and report the number with a loud
    # "degraded" flag instead of losing the round entirely.
    import dataclasses

    cfgs = {"production": cfg}
    if (cfg.tpu.griffin_lim_init, cfg.tpu.griffin_lim_iters) != ("advance", 24):
        cfgs["advance24_fused"] = cfg.replace(tpu=dataclasses.replace(
            cfg.tpu, griffin_lim_init="advance", griffin_lim_iters=24))
    cfgs["random64_xla"] = cfg.replace(tpu=dataclasses.replace(
        cfg.tpu, griffin_lim_init="random", griffin_lim_iters=64,
        griffin_lim_impl="xla"))

    def _mk(c):
        return lambda: Synthesizer(c, melsyn, ssrn, melsyn_params,
                                   ssrn_params, n_frames=T,
                                   gl_iters=c.tpu.griffin_lim_iters,
                                   mesh=mesh)

    (rtf_per_chip, audio_seconds, dt), chosen, degraded = \
        measure_with_fallback([(n, _mk(c)) for n, c in cfgs.items()], measure)
    cfg = cfgs[chosen]

    # like-for-like reference mode: random-init 64-iteration Griffin-Lim
    # (what the reference's librosa vocoder computes, and what r1/r2
    # headlines measured). Skipped only if it's already the production
    # config.
    gl64_rtf = None
    if (cfg.tpu.griffin_lim_iters, cfg.tpu.griffin_lim_init) != (64, "random"):
        cfg64 = cfg.replace(
            tpu=dataclasses.replace(cfg.tpu, griffin_lim_init="random"))
        syn64 = Synthesizer(cfg64, melsyn, ssrn, melsyn_params, ssrn_params,
                            n_frames=T, gl_iters=64, mesh=mesh)
        try:
            gl64_rtf, _, _ = measure(syn64)
        except Exception as e:  # noqa: BLE001 - secondary metric only
            print(f"[bench] gl64 reference leg failed: {e}", file=sys.stderr)

    target = 50.0
    print(json.dumps({
        "metric": "synthesized_audio_sec_per_sec_per_chip",
        "value": round(rtf_per_chip, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf_per_chip / target, 3),
        "detail": {
            "batch": B, "frames": T,
            "gl_iters": cfg.tpu.griffin_lim_iters,
            "gl_init": cfg.tpu.griffin_lim_init,
            "gl_production": round(rtf_per_chip, 2),
            "gl64_random_ref": round(gl64_rtf, 2) if gl64_rtf else None,
            "audio_seconds_per_batch": round(audio_seconds, 1),
            "wall_s_per_batch": round(dt, 3),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "n_chips": n_chips,
            "degraded": degraded,
        },
    }))


if __name__ == "__main__":
    # The remote-TPU tunnel occasionally drops with a transient
    # `UNAVAILABLE: TPU backend setup/compile error`; retry a few times so a
    # blip at bench time doesn't lose the round's recorded headline.
    for attempt in range(4):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001 - jax wraps tunnel errors variously
            if attempt == 3 or "UNAVAILABLE" not in str(e):
                raise
            print(f"[bench] transient backend error, retrying: {e}",
                  file=sys.stderr)
            time.sleep(60)
