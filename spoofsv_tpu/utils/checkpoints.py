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
        try:
            restored = ckptr.restore(os.path.abspath(path))
        except ValueError:
            # Cross-device restore (e.g. TPU-written campaign checkpoint
            # loaded in a CPU process): the saved sharding file names devices
            # this process doesn't have. Restore as host numpy instead —
            # shape/dtype from the checkpoint's own metadata, no sharding.
            import jax.tree_util as jtu
            import numpy as np

            meta = ckptr.metadata(os.path.abspath(path)).item_metadata
            leaves, treedef = jtu.tree_flatten(meta.tree)
            args = jtu.tree_unflatten(
                treedef,
                [ocp.RestoreArgs(restore_type=np.ndarray)] * len(leaves))
            restored = ckptr.restore(os.path.abspath(path),
                                     restore_args=args)
    # Trainer saves TrainState/AdvTrainState pytrees; accept raw params too.
    if isinstance(restored, dict):
        if "gen_params" in restored:
            return restored["gen_params"]
        if "params" in restored and "opt_state" in restored:
            return restored["params"]
        if "params" in restored:
            return restored
    return restored
