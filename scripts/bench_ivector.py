#!/usr/bin/env python
"""i-vector EM backend benchmark: scalar C++ (native) vs batched XLA (jax).

Synthetic corpus at configurable scale; reports per-stage wall seconds for
diag-UBM EM (binary split), full-UBM EM, Baum-Welch stats, T-matrix EM, and
batched extraction. The reference's Kaldi configuration is
``--num_gauss 1024 --ivec_dim 400`` (kaldi_ivectors/run.sh:105-129).

Run on CPU:  PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/bench_ivector.py
Run on TPU:  python scripts/bench_ivector.py  (jax backend rides the MXU;
             the native path is identical either way — it is host C++)
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ps = argparse.ArgumentParser()
    ps.add_argument("--num_gauss", type=int, default=512)
    ps.add_argument("--ivec_dim", type=int, default=400)
    ps.add_argument("--dim", type=int, default=20)
    ps.add_argument("--frames", type=int, default=100_000)
    ps.add_argument("--utts", type=int, default=100)
    ps.add_argument("--backends", type=str, default="jax,native")
    args = ps.parse_args()

    from spoofsv_tpu.spoofkit import ivector as ivec

    rng = np.random.default_rng(0)
    frames = rng.normal(size=(args.frames, args.dim)) * 2
    feats = [rng.normal(size=(rng.integers(300, 800), args.dim)) * 2
             for _ in range(args.utts)]

    for backend in args.backends.split(","):
        t0 = time.perf_counter()
        diag = ivec.UBM.train(frames, args.num_gauss, iters=4, seed=1,
                              backend=backend)
        t1 = time.perf_counter()
        full = ivec.FullUBM.train(diag, frames, iters=3, backend=backend)
        t2 = time.perf_counter()
        stats = full.acc_stats_batch(feats, backend=backend)
        t3 = time.perf_counter()
        ext = ivec.IvectorExtractorFull.train(full, stats,
                                              ivec_dim=args.ivec_dim,
                                              iters=5, seed=2, backend=backend)
        t4 = time.perf_counter()
        ivs = ext.extract_batch(stats, backend=backend)
        t5 = time.perf_counter()
        assert np.isfinite(ivs).all()
        print(json.dumps({
            "backend": backend, "num_gauss": args.num_gauss,
            "ivec_dim": args.ivec_dim, "frames": args.frames,
            "utts": args.utts,
            "diag_ubm_s": round(t1 - t0, 1), "full_ubm_s": round(t2 - t1, 1),
            "stats_s": round(t3 - t2, 1), "t_matrix_s": round(t4 - t3, 1),
            "extract_s": round(t5 - t4, 1), "total_s": round(t5 - t0, 1),
        }))


if __name__ == "__main__":
    main()
