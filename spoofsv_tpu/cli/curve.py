"""``curve.py`` CLI equivalent: SR-vs-FRR curves for GE2E + i-vectors.

Same flags (``curve.py:7-10``): ``--simmat``, ``--ivector_score``; takes the
GE2E test-speaker count explicitly instead of importing the global yaml
singleton the reference silently depends on (``curve.py:5``).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ps = argparse.ArgumentParser()
    ps.add_argument("--simmat", type=str, default=None)
    ps.add_argument("--ivector_score", type=str, default=None)
    ps.add_argument("--n_speakers", type=int, default=20)
    ps.add_argument("--eval_num", type=int, default=20)
    ps.add_argument("--out", type=str, default="curve.png")
    args = ps.parse_args(argv)

    from spoofsv_tpu.spoofkit import curve as curve_mod

    ge2e = None
    ivec = None
    if args.simmat:
        ge2e = curve_mod.ge2e_curve(args.simmat, args.n_speakers, args.eval_num)
    if args.ivector_score:
        ivec = curve_mod.ivector_curve(args.ivector_score)
    out = curve_mod.plot_curves(ge2e, ivec, args.out)
    print("wrote", out)


if __name__ == "__main__":
    main()
