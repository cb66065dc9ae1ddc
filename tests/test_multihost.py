"""Multi-host support: single-process degrade + a REAL 2-process run.

The 2-process test launches two ``jax.distributed`` worker processes (4
virtual CPU devices each) that train WGAN-GP through ``Trainer.fit`` over the
global 8-device mesh — per-process local batches, cross-process gradient
all-reduce (gloo on CPU; ICI/DCN on a pod) — and checks the resulting params
are identical across ranks and match a single-process 8-device run.
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np

from spoofsv_tpu.parallel import mesh as mesh_lib
from spoofsv_tpu.parallel import multihost

_WORKER = os.path.join(os.path.dirname(__file__), "mh_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_worker(process_id, num_processes, port, out_npz, workdir, wait=True):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    env["PYTHONPATH"] = _REPO  # keep the TPU-tunnel site hook out
    # Log to a FILE, never a pipe: an unread stdout pipe fills with XLA
    # cache-load warnings, the writer blocks mid-collective, and the OTHER
    # rank then hangs in gloo — a deadlock that only appears once the
    # compilation cache has enough entries to overflow the 64 KB buffer.
    log_path = os.path.join(workdir, f"worker_{process_id}.log")
    log = open(log_path, "w")
    p = subprocess.Popen(
        [sys.executable, _WORKER, str(process_id), str(num_processes),
         str(port), out_npz, workdir],
        env=env, cwd=_REPO, stdout=log, stderr=subprocess.STDOUT)
    p._spoofsv_log = log_path  # type: ignore[attr-defined]
    if not wait:
        return p
    rc = p.wait(timeout=900)
    log.close()
    assert rc == 0, (f"worker {process_id}/{num_processes}:\n"
                     f"{_log_tail(log_path)}")
    return log_path


def _log_tail(path: str, n: int = 3000) -> str:
    with open(path) as f:
        return f.read()[-n:]


def _ephemeral_floor() -> int:
    """Lower bound of the kernel's auto-assign (ephemeral) port range."""
    try:
        with open("/proc/sys/net/ipv4/ip_local_port_range") as f:
            return int(f.read().split()[0])
    except (OSError, ValueError):
        return 32768


def _reserve_port():
    """Root-cause fix for the rendezvous port race (r3 flake): the old
    bind-probe-close of an EPHEMERAL-range port could be stolen by ANY
    process's outgoing connection between probe and the coordinator's bind
    (classic TOCTOU). Instead pick a port BELOW the ephemeral floor — the
    kernel never auto-assigns there, so only another explicit binder could
    collide — and exclude concurrent suite runs with a per-port flock held
    until the rendezvous completes. Returns (port, lock_file)."""
    import fcntl
    import random

    rng = random.Random(os.getpid() * 7919 + int.from_bytes(os.urandom(2),
                                                            "little"))
    floor = min(_ephemeral_floor(), 32768)
    for _ in range(200):
        port = rng.randrange(10000, floor)
        lockf = open(f"/tmp/spoofsv_mh_port_{port}.lock", "w")
        try:
            fcntl.flock(lockf, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            lockf.close()
            continue
        try:
            with socket.socket() as s:
                s.bind(("localhost", port))
        except OSError:
            lockf.close()
            continue
        return port, lockf
    raise RuntimeError("no reservable coordinator port found")


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


class TestTwoProcessTraining:
    def test_two_process_wgan_gp_matches_single_process(self, tmp_path):
        """7 WGAN-GP Trainer.fit iterations: 2 coordinated processes (4 CPU
        devices each, gloo collectives) vs 1 process (8 devices), same global
        batches. Ranks must agree exactly; multi- vs single-process only up to
        all-reduce summation order."""
        # r3 flake root-caused (r4) as TWO independent hazards, both fixed:
        # (1) the bind-probe-close port pick could be stolen by any ephemeral
        #     allocation — _reserve_port uses a non-ephemeral port + flock;
        # (2) per-rank compilation-cache keys let one rank run cache-warm
        #     while the other compiled cold, blowing gloo's hardcoded 30 s
        #     context-init timeout (mh_worker now uses a per-run cache dir so
        #     ranks always compile symmetrically).
        # The single retry remains only as insurance against a loaded machine
        # blowing the join timeout — it LOUDLY reports when it fires so a
        # recurrence is visible, not silently absorbed.
        for attempt in range(2):
            port, port_lock = _reserve_port()
            p0 = _run_worker(0, 2, port, str(tmp_path / "p0.npz"),
                             str(tmp_path), wait=False)
            try:
                _run_worker(1, 2, port, str(tmp_path / "p1.npz"),
                            str(tmp_path))
                rc0 = p0.wait(timeout=300)
                assert rc0 == 0, f"rank 0:\n{_log_tail(p0._spoofsv_log)}"
                break
            except Exception as e:  # noqa: BLE001 - load flake, retried once
                print(f"\n[multihost] RETRY FIRED (attempt {attempt}): {e!r}",
                      file=sys.stderr, flush=True)
                if attempt == 1:
                    raise
            finally:
                if p0.poll() is None:
                    p0.kill()
                port_lock.close()
        _run_worker(0, 1, 0, str(tmp_path / "single.npz"), str(tmp_path))

        s = np.load(tmp_path / "single.npz")
        r0 = np.load(tmp_path / "p0.npz")
        r1 = np.load(tmp_path / "p1.npz")
        assert set(s.files) == set(r0.files) == set(r1.files)
        assert len(s.files) > 100  # full adversarial state (G+D+opts)
        worst = 0.0
        for k in s.files:
            a, b, c = s[k], r0[k], r1[k]
            # every rank computes the identical replicated result
            np.testing.assert_array_equal(b, c, err_msg=k)
            if a.dtype.kind == "f":
                worst = max(worst, float(np.max(np.abs(
                    a.astype(np.float64) - b.astype(np.float64)))))
            else:
                np.testing.assert_array_equal(a, b, err_msg=k)
        # measured 1.1e-5 after 7 steps (grad-of-grad amplifies reduction
        # order); 1e-3 keeps the gate meaningful without being flaky
        assert worst < 1e-3, worst
