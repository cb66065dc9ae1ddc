#!/usr/bin/env python
"""Fused highway-conv kernel vs XLA on the live chip (chained timing).

Measures the SSRN's hot conv shapes (hc3/hc4: C=512 T=1300; hc1/hc2-style:
C=256) with K invocations chained inside one jitted fori_loop and ONE fetch
(the tunnel has a ~30 ms per-call floor — see docs/NEXT.md "Measurement
correction"). Decides ``cfg.tpu.highway_conv_impl``; results recorded in
docs/SSRN_PROFILE.json.

Run alone (tunnel serializes clients): ``python scripts/bench_ssrn_conv.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts._benchlib import setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spoofsv_tpu.ops.pallas_conv import (  # noqa: E402
    fused_highway_conv, fused_highway_conv_pair, highway_conv_reference)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "SSRN_PROFILE.json")


def chained_ms(fn, x, iters=20):
    """Average per-invocation ms over `iters` chained calls, one fetch."""

    @jax.jit
    def loop(x):
        def body(i, acc):
            y = fn(x * (1.0 + 1e-6 * i.astype(x.dtype)))
            return acc + jnp.sum(y[0, ::37, ::29].astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    # two warmups: first compile specializes to host inputs; the second
    # catches the one re-specialization (verify SKILL.md)
    float(loop(x))
    float(loop(x))
    t0 = time.perf_counter()
    acc = float(loop(x))
    dt = time.perf_counter() - t0
    assert np.isfinite(acc)
    return dt / iters * 1e3


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    results = {"backend": jax.default_backend(),
               "device": str(jax.devices()[0]), "shapes": {}}
    shapes = [
        # (label, B, T, C, dil)   — hc3/hc4 are the hot pair (docs/NEXT.md)
        ("hc3_B256", 256, 1300, 512, 1),
        ("hc3_B768", 768, 1300, 512, 1),
        ("hc2_dil3_B256", 256, 325, 256, 3),
        ("ups_hc_B768", 768, 650, 256, 1),
    ]
    for label, B, T, C, dil in shapes:
        x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, C, 2 * C)) * 0.05, jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(2 * C,)) * 0.1, jnp.float32)
        s1, b1, s2, b2 = (jnp.asarray(rng.normal(size=(C,)) * 0.2 + 1.0,
                                      jnp.float32) for _ in range(4))

        def xla_fn(v):
            return highway_conv_reference(v, w, b, s1, b1, s2, b2,
                                          dilation=dil)

        ms_xla = chained_ms(xla_fn, x)
        row = {"B": B, "T": T, "C": C, "dil": dil,
               "xla_ms": round(ms_xla, 2)}
        for bt in (256, 512):
            def fused_fn(v, bt=bt):
                return fused_highway_conv(v, w, b, s1, b1, s2, b2,
                                          dilation=dil, block_t=bt,
                                          interpret=False)

            try:
                row[f"fused_bt{bt}_ms"] = round(chained_ms(fused_fn, x), 2)
            except Exception as e:  # VMEM overflow etc. — record and move on
                row[f"fused_bt{bt}_ms"] = f"error: {type(e).__name__}"
        # roofline context: matmul FLOPs at v5e bf16 peak 197 TFLOP/s and
        # min HBM traffic (read x + write y) at 819 GB/s
        flops = 2 * B * T * C * 2 * C * 3
        row["mxu_roofline_ms"] = round(flops / 197e12 * 1e3, 2)
        row["hbm_min_ms"] = round(2 * B * T * C * 2 / 819e9 * 1e3, 2)
        results["shapes"][label] = row
        print(label, row, flush=True)

    # ---- two-layer PAIR fusion (ops/pallas_conv.fused_highway_conv_pair):
    # the SSRN's actual back-to-back pairs, timed as xla two-layer chain vs
    # 2× single-fused vs ONE pair dispatch (inter-layer y1 stays in VMEM)
    results["pairs"] = {}
    pair_shapes = [
        ("pair_hc34_B768", 768, 1300, 512, 1, 1),
        ("pair_hc34_B256", 256, 1300, 512, 1, 1),
        ("pair_hc12_B256", 256, 325, 256, 1, 3),
        ("pair_ups_B768", 768, 650, 256, 1, 3),
    ]
    for label, B, T, C, da, db in pair_shapes:
        x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.bfloat16)
        pa = [jnp.asarray(rng.normal(size=(3, C, 2 * C)) * 0.05, jnp.bfloat16),
              jnp.asarray(rng.normal(size=(2 * C,)) * 0.1, jnp.float32)] + \
             [jnp.asarray(rng.normal(size=(C,)) * 0.2 + 1.0, jnp.float32)
              for _ in range(4)]
        pb = [jnp.asarray(rng.normal(size=(3, C, 2 * C)) * 0.05, jnp.bfloat16),
              jnp.asarray(rng.normal(size=(2 * C,)) * 0.1, jnp.float32)] + \
             [jnp.asarray(rng.normal(size=(C,)) * 0.2 + 1.0, jnp.float32)
              for _ in range(4)]

        def xla2(v):
            return highway_conv_reference(
                highway_conv_reference(v, *pa, dilation=da), *pb, dilation=db)

        def fused2(v):
            return fused_highway_conv(
                fused_highway_conv(v, *pa, dilation=da, interpret=False),
                *pb, dilation=db, interpret=False)

        row = {"B": B, "T": T, "C": C, "dil": (da, db),
               "xla_ms": round(chained_ms(xla2, x), 2),
               "fused2x_ms": round(chained_ms(fused2, x), 2)}
        for bt in (256, 512):
            def pairfn(v, bt=bt):
                return fused_highway_conv_pair(
                    v, *pa, *pb, dilation_a=da, dilation_b=db, block_t=bt,
                    interpret=False)

            try:
                row[f"pair_bt{bt}_ms"] = round(chained_ms(pairfn, x), 2)
            except Exception as e:
                row[f"pair_bt{bt}_ms"] = f"error: {type(e).__name__}"
        flops = 2 * 2 * B * T * C * 2 * C * 3
        row["mxu_roofline_ms"] = round(flops / 197e12 * 1e3, 2)
        results["pairs"][label] = row
        print(label, row, flush=True)

    # ---- Winograd algorithmic arm (ops/winograd.py): same highway block,
    # k=3 dil-1 conv via F(2,3)/F(4,3) — 1.5x/2x fewer MXU MACs in plain
    # XLA. Decides whether the hc3/hc4 2x-roofline gap is FLOP-bound.
    from spoofsv_tpu.ops.winograd import winograd_highway_conv

    results["winograd"] = {}
    for label, B, T, C in [("hc3_B768", 768, 1300, 512),
                           ("hc3_B256", 256, 1300, 512)]:
        x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, C, 2 * C)) * 0.05, jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(2 * C,)) * 0.1, jnp.float32)
        s1, b1, s2, b2 = (jnp.asarray(rng.normal(size=(C,)) * 0.2 + 1.0,
                                      jnp.float32) for _ in range(4))
        row = {"B": B, "T": T, "C": C,
               "xla_ms": round(chained_ms(
                   lambda v: highway_conv_reference(v, w, b, s1, b1, s2, b2),
                   x), 2)}
        for m in (2, 4):
            def wino(v, m=m):
                return winograd_highway_conv(v, w, b, s1, b1, s2, b2, m=m)

            try:
                row[f"wino_f{m}_ms"] = round(chained_ms(wino, x), 2)
            except Exception as e:
                row[f"wino_f{m}_ms"] = f"error: {type(e).__name__}"
        flops = 2 * B * T * C * 2 * C * 3
        row["mxu_roofline_ms"] = round(flops / 197e12 * 1e3, 2)
        results["winograd"][label] = row
        print("winograd", label, row, flush=True)

    # ---- module-level A/B: FULL SSRN forward under each process switch
    # (the decisive number — docs/SSRN_PROFILE.json's r4 inversion showed
    # isolated wins don't survive the dispatch boundaries; fused_pair halves
    # them and keeps y1 in VMEM)
    from spoofsv_tpu.models.layers import set_default_gate_impl
    from spoofsv_tpu.models.ssrn import SSRN

    B, T = 768, 325
    mel = jnp.asarray(rng.uniform(0.05, 0.95, (B, T, 80)), jnp.bfloat16)
    model = SSRN(freq_bins=80, output_bins=513, ssrn_dim=256,
                 dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), mel[:1])
    mod = {"what": "FULL SSRN forward (B=768, T=325->1300, bf16) "
                   "chained-timed, per process switch (ABAB order)"}
    try:
        for rep in range(2):
            for impl in ("xla", "fused_conv", "fused_pair"):
                set_default_gate_impl(impl)
                try:
                    ms = chained_ms(lambda v: model.apply(params, v), mel,
                                    iters=10)
                except Exception as e:  # keep the artifact on compile failure
                    mod.setdefault(f"{impl}_ms", []).append(
                        f"error: {type(e).__name__}")
                    print(f"module {impl} rep{rep}: ERROR {e}", flush=True)
                    continue
                mod.setdefault(f"{impl}_ms", []).append(round(ms, 2))
                print(f"module {impl} rep{rep}: {ms:.2f} ms", flush=True)
    finally:
        set_default_gate_impl("xla")
    results["module_ab"] = mod

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("[bench_ssrn_conv] wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
