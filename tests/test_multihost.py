"""Multi-host helpers degrade correctly to single-process (8-dev CPU mesh)."""

import jax
import numpy as np

from spoofsv_tpu.parallel import mesh as mesh_lib
from spoofsv_tpu.parallel import multihost


class TestMultihost:
    def test_initialize_noop_single_process(self):
        assert multihost.initialize_distributed() is False
        assert multihost.is_primary()
        assert multihost.per_process_batch_size(16) == 16

    def test_global_batch_from_local_shards_data_axis(self):
        mesh = mesh_lib.make_mesh()
        assert mesh.devices.size == 8
        local = {"mel": np.random.default_rng(0).normal(
            size=(16, 12, 80)).astype(np.float32),
            "text": np.zeros((16, 10), np.int32)}
        g = multihost.global_batch_from_local(local, mesh)
        assert g["mel"].shape == (16, 12, 80)
        # batch dim sharded over the 8-device data axis → 2 rows per shard
        shard_shapes = {s.data.shape for s in g["mel"].addressable_shards}
        assert shard_shapes == {(2, 12, 80)}
        np.testing.assert_allclose(np.asarray(g["mel"]), local["mel"])

    def test_sharded_step_consumes_global_batch(self):
        """A pjit-style jitted mean over the sharded batch runs and reduces."""
        mesh = mesh_lib.make_mesh()
        local = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
        g = multihost.global_batch_from_local(local, mesh)
        got = jax.jit(lambda b: b["x"].mean())(g)
        assert float(got) == local["x"].mean()
