#!/usr/bin/env python
"""GL init/iteration decision on TRAINED-TTS magnitudes (the production
input distribution): does the SPSI instantaneous-frequency init
(jaxdsp.gl_spsi_angles) reach the current default's (advance-24) spectral
convergence in fewer iterations on real trained-checkpoint spectra?

Needs the campaign TTS stages done (scripts/campaign.py through
`synthesize`; root via SPOOFSV_CAMPAIGN_ROOT, default `_campaign`).
Decodes short/median/long corpus sentences with the trained Text2Mel+SSRN,
applies the production magnitude transform (max-norm, power 1.3/0.6), and
measures spectral convergence of the f32 XLA GL at each (init, iters)
combo, plus the fused Pallas kernel (bf16 + int8) at the candidate config.

Writes docs/GL_SPSI_CHECK.json. Run on the live chip:
  PYTHONPATH=/root/repo SPOOFSV_CAMPAIGN_ROOT=$PWD/_campaign_r4 \
      python scripts/gl_init_check.py [B]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from spoofsv_tpu.dsp import jaxdsp

import parity_tpu as PT

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "GL_SPSI_CHECK.json")

COMBOS = [("random", 64),       # the reference's librosa call
          ("advance", 32), ("advance", 24), ("advance", 16),
          ("spsi", 24), ("spsi", 16), ("spsi", 12), ("spsi", 8)]


def trained_mags(B):
    """(name -> (B, 4*T, 513) GL input magnitudes) from the trained
    checkpoint: fused decode -> SSRN -> max-norm -> power 1.3/0.6
    (make_vocoder's non-log branch, infer/synthesize.py)."""
    from spoofsv_tpu.models import SSRN
    from spoofsv_tpu.ops.pallas_decode import make_fused_decoder
    from spoofsv_tpu.utils.checkpoints import load_generator_params

    cfg, text_dists, spk, params = PT._campaign_setup(B)
    ssrn = SSRN(freq_bins=cfg.mel.freq_bins, output_bins=cfg.lin_bins,
                ssrn_dim=cfg.ssrn_dim, dtype=jnp.bfloat16)
    ssrn_params = load_generator_params(cfg.inference_ssrn_model, None, cfg)
    melsyn = PT._mk_melsyn(cfg, jnp.bfloat16)
    dec = make_fused_decoder(melsyn, cfg.max_frame_num)
    power = cfg.norm.reconstruction_power / cfg.norm.analysis_power

    @jax.jit
    def to_mag(text):
        mel, _, _ = dec(params, text, spk)
        lin = ssrn.apply(ssrn_params, mel).astype(jnp.float32)
        peak = jnp.max(lin, axis=(1, 2), keepdims=True)
        return jnp.power(lin / jnp.maximum(peak, 1e-8), power)

    out = {}
    for name, text_np in text_dists.items():
        out[name] = np.asarray(to_mag(jnp.asarray(text_np)), np.float32)
        print(f"[mags:{name}] shape={out[name].shape} "
              f"max={out[name].max():.3f}", flush=True)
    return cfg, out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg, mags = trained_mags(B)
    n_fft, hop = cfg.stft.fft_length, cfg.stft.hop_length

    def xla_gl(mag, init, iters):
        ia = None
        if init == "advance":
            a_re, a_im = jaxdsp.gl_advance_angles(mag.shape[1], mag.shape[2],
                                                  n_fft, hop)
            ia = (jnp.broadcast_to(a_re, mag.shape),
                  jnp.broadcast_to(a_im, mag.shape))
        elif init == "spsi":
            ia = jaxdsp.gl_spsi_angles(mag, n_fft, hop)
        return jaxdsp.griffin_lim(mag, jax.random.PRNGKey(0), n_fft, hop,
                                  n_fft, n_iter=iters,
                                  precision=jax.lax.Precision.HIGHEST,
                                  init_angles=ia)

    art = {"backend": jax.default_backend(), "device": str(jax.devices()[0]),
           "batch": B, "combos": {}, "fused_candidate": {}}
    for dname, mag_np in mags.items():
        mag = jnp.asarray(mag_np)
        for init, iters in COMBOS:
            key = f"{init}@{iters}"
            t0 = time.perf_counter()
            y = xla_gl(mag, init, iters)
            sc = PT.spectral_convergence(y, mag, n_fft, hop)
            art["combos"].setdefault(key, {})[dname] = round(sc, 5)
            print(f"[{dname}] {key}: sc={sc:.5f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)

    # fused Pallas kernel (production path) at the candidate configs
    from spoofsv_tpu.ops.pallas_gl import griffin_lim_fused
    for dname, mag_np in mags.items():
        mag = jnp.asarray(mag_np)
        for iters in (16, 12):
            for tag, kw in (("bf16", {}), ("int8", {"int8_fwd": True})):
                y = griffin_lim_fused(mag, jax.random.PRNGKey(0), n_fft, hop,
                                      n_fft, n_iter=iters, init_mode="spsi",
                                      **kw)
                sc = PT.spectral_convergence(y, mag, n_fft, hop)
                art["fused_candidate"].setdefault(
                    f"spsi{iters}_{tag}", {})[dname] = round(sc, 5)
                print(f"[{dname}] fused spsi{iters} {tag}: sc={sc:.5f}",
                      flush=True)

    # merge (not overwrite): the artifact also carries mcd_ab /
    # campaign-rescore sections written by other scripts
    merged = json.load(open(OUT)) if os.path.isfile(OUT) else {}
    merged.update(art)
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"[gl_init_check] wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
