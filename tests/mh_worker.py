"""Multi-process data-parallel training worker (driven by test_multihost.py).

Each process owns ``8 // num_processes`` virtual CPU devices; together they
form the global 8-device ``data`` mesh. The worker runs a few WGAN-GP
iterations through the REAL ``Trainer.fit`` path — each process feeding only
its local share of every global batch (``multihost.global_batch_from_local``
inside ``Trainer._place_batch``) — then dumps the final replicated train state
to an ``.npz`` for cross-process / vs-single-process comparison.

This validates the actual multi-host story of ``parallel/multihost.py``
(the reference has no distributed training at all — SURVEY §2.5): same jitted
step, global mesh spanning processes, gradient all-reduce crossing the
process boundary (gloo on CPU; ICI/DCN on a real pod).

Usage: mh_worker.py <process_id> <num_processes> <port> <out_npz> <workdir>
"""

import os
import sys


def main() -> None:
    process_id, num_processes = int(sys.argv[1]), int(sys.argv[2])
    port, out_npz, workdir = int(sys.argv[3]), sys.argv[4], sys.argv[5]
    n_local = 8 // num_processes

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}")
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Compilation cache: PER-ATTEMPT dir (keyed by the coordinator port,
    # which _reserve_port picks fresh each retry), never a machine-global
    # one. The r3 flake's root cause (diagnosed r4): cache keys are
    # per-rank (the device assignment embeds rank-local device ids), so
    # after any killed attempt rank 0 is cache-warm while rank 1 compiles
    # cold — a >30 s compile skew that blows gloo's hardcoded 30 s
    # GetKeyValue timeout at context init, self-perpetuating across
    # retries. Keying the dir by port keeps both ranks of ONE attempt
    # symmetric (shared dir, both cold) while the retry attempt starts
    # from a clean cache instead of inheriting the killed run's skew.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(workdir, f"jax_cache_{port}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np

    from spoofsv_tpu.config import Config
    from spoofsv_tpu.models import MelDisc, MelSyn
    from spoofsv_tpu.parallel import multihost
    from spoofsv_tpu.parallel.mesh import make_mesh
    from spoofsv_tpu.train.loop import Trainer

    if num_processes > 1:
        assert multihost.initialize_distributed(
            coordinator_address=f"localhost:{port}",
            num_processes=num_processes, process_id=process_id)
        assert jax.process_count() == num_processes
    assert len(jax.devices()) == 8, jax.devices()

    cfg = Config().replace(hidden_dim=32, text_emb_dim=16, disc_dim=16,
                           spk_emb_dim=20, max_text_len=30, max_frame_num=16,
                           src_root_dir=workdir, val_every_iter=10**9)
    model = MelSyn(vocab_len=cfg.vocab_len, condition=True, spk_emb_dim=20,
                   text_emb_dim=16, freq_bins=cfg.mel.freq_bins, hidden_dim=32)
    disc = MelDisc(disc_dim=16)

    mesh = make_mesh(8)
    B, T, N = 8, 16, 24          # global batch
    local = slice(process_id * (B // num_processes),
                  (process_id + 1) * (B // num_processes))

    def epoch_batches():
        """3 deterministic global batches; this process yields its local rows."""
        rng = np.random.default_rng(7)
        for _ in range(3):
            mel = rng.uniform(0.05, 0.95, (B, T, cfg.mel.freq_bins)).astype(
                np.float32)
            text = rng.integers(1, cfg.vocab_len - 1, (B, N)).astype(np.int32)
            spk = rng.normal(size=(B, 20)).astype(np.float32)
            yield {"mel": mel[local], "text": text[local], "spk": spk[local]}

    trainer = Trainer(cfg, model, "train_text2mel", adversarial=True,
                      gan_type="wgan-gp", disc_model=disc,
                      validate_with_decode=False, mesh=mesh,
                      ctime=f"mh{num_processes}")
    # Init from a host-local batch (identical shapes/rng on every process →
    # identical params); fit() then sees state set and streams batches.
    init_batch = next(iter(epoch_batches()))
    trainer.init(jax.random.PRNGKey(0), init_batch)
    trainer.fit(epoch_batches, max_epochs=10**9, max_iterations=7, rng_seed=0)

    leaves = jax.tree_util.tree_leaves(trainer.state)
    out = {}
    for i, leaf in enumerate(leaves):
        assert getattr(leaf, "is_fully_replicated", True), leaf
        out[f"leaf_{i:04d}"] = np.asarray(jax.device_get(leaf))
    np.savez(out_npz, **out)
    print(f"[p{process_id}] wrote {len(out)} leaves, "
          f"iter={trainer.iteration}", flush=True)


if __name__ == "__main__":
    main()
