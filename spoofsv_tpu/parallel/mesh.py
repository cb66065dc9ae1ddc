"""Device mesh + sharding helpers.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(``train/ordinary.py:165-173``, SURVEY §2.5). TPU-native equivalent: one jitted
program data-parallel over an ICI mesh — the batch axis is sharded with
``NamedSharding(P('data'))``, params stay replicated, and XLA inserts the
gradient all-reduce over ICI. A second, currently-unit-sized ``model`` axis is
reserved for tensor parallelism should the models ever outgrow one chip
(≤15 M params today, so it stays 1).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def force_cpu_backend(min_devices: int = 1) -> None:
    """Pin jax to the CPU backend with >= min_devices virtual devices.

    Needed because this environment's TPU site hook force-sets
    ``jax_platforms="axon,cpu"``, overriding ``JAX_PLATFORMS=cpu``; and the
    host-platform device count flag must be present before the CPU client
    exists.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={min_devices}").strip()
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        _xb._clear_backends()


def make_mesh(n_devices: Optional[int] = None, data_axis: str = "data",
              model_axis: str = "model", model_parallel: int = 1) -> Mesh:
    """1-D (or 2-D with a model axis) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % model_parallel == 0
    dev = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(dev, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                data_axis: str = "data") -> Dict[str, Any]:
    """device_put each array with its batch dim sharded over ``data_axis``."""
    sh = batch_sharding(mesh, data_axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
