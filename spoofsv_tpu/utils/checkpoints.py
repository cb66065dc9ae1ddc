"""Checkpoint loading utilities: orbax dirs and reference ``.tar.pth`` files."""

from __future__ import annotations

import os
from typing import Any, Optional


def load_generator_params(path: str, model, cfg, kind: str = "text2mel") -> Any:
    """Load generator params from either an orbax checkpoint directory (saved
    by :class:`spoofsv_tpu.train.loop.CheckpointManager`) or a reference
    PyTorch ``.tar.pth`` checkpoint (``config.json:51-52``)."""
    if path.endswith((".pth", ".pt", ".tar")) or path.endswith(".tar.pth"):
        from spoofsv_tpu.utils import torch_import

        if kind == "ssrn":
            return torch_import.import_ssrn(path)
        return torch_import.import_melsyn(path)

    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path))
    # Trainer saves TrainState/AdvTrainState pytrees; accept raw params too.
    if isinstance(restored, dict):
        if "gen_params" in restored:
            return restored["gen_params"]
        if "params" in restored and "opt_state" in restored:
            return restored["params"]
        if "params" in restored:
            return restored
    return restored
