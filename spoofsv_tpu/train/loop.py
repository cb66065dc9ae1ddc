"""Training orchestration: epochs, validation, checkpoint/resume, artifacts.

Mirrors the reference trainers' observable behavior (``train/ordinary.py:130-293``,
``train/adversarial_wasserstein_gp.py:148-451``):

  * G/D alternation by global iteration (D on ``step % (RATIO+1) != 0``);
  * validation every ``VAL_EVERY_ITER`` iterations runs the REAL autoregressive
    decode path on the validate split plus one train batch;
  * checkpoints carry generator+discriminator params, both optimizer states,
    step, and loss logs; a tracked best model by min validation loss; directory
    contract ``checkpoints/<pattern>/<adversarial|not_adversarial>/<ctime>/``;
  * attention heatmap + loss-curve PNGs, plus structured JSONL metrics
    (replacing stdout-print observability — SURVEY §5).

Checkpointing is orbax; resume restores everything.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spoofsv_tpu.config import Config
from spoofsv_tpu.train import steps as steps_mod
from spoofsv_tpu.train.losses import guided_attention_matrix
from spoofsv_tpu.train.state import AdvTrainState, TrainState


# ----------------------------------------------------------------------
# Artifacts
# ----------------------------------------------------------------------

class MetricsLogger:
    """JSONL metrics + stdout echo."""

    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path), exist_ok=True)
        self._f = open(path, "a") if path else None

    def log(self, record: Dict[str, Any]) -> None:
        record = {k: (float(v) if hasattr(v, "item") or isinstance(v, (np.floating, np.integer)) else v)
                  for k, v in record.items()}
        if self._f:
            self._f.write(json.dumps(record) + "\n")
            self._f.flush()

    def close(self):
        if self._f:
            self._f.close()


def plot_attention(att: np.ndarray, iters: int, fig_dir: str) -> None:
    """Attention heatmap PNG (``train/ordinary.py:30-44``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(fig_dir, exist_ok=True)
    fig, ax = plt.subplots()
    img = ax.imshow(np.asarray(att))
    fig.colorbar(img)
    plt.title(f"{iters} iterations")
    plt.savefig(os.path.join(fig_dir, f"att_iteration_{iters}.png"), format="png")
    plt.close(fig)


def plot_losses(losses: Dict[str, List[float]], iters: int, fig_dir: str) -> None:
    """GAN loss curves (``train/adversarial_wasserstein_gp.py:45-63``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(fig_dir, exist_ok=True)
    fig1, ax1 = plt.subplots(2, 1)
    fig1.tight_layout()
    ax1[0].set_title("Discriminator Train Loss")
    ax1[1].set_title("Wasserstein Distance")
    ax1[0].plot(losses.get("t_d", []), color="green")
    ax1[1].plot(losses.get("wd", []), color="purple")
    plt.savefig(os.path.join(fig_dir, f"DiscriminatorTrainLoss_iteration_{iters}.png"))
    plt.close(fig1)
    fig2, ax2 = plt.subplots(2, 1)
    fig2.tight_layout()
    ax2[0].set_title("Generator Train Loss")
    ax2[1].set_title("Generator Train Loss (From Discriminator)")
    ax2[0].plot(losses.get("t_s", []), color="blue")
    ax2[1].plot(losses.get("t_s_o", []), color="orange")
    plt.savefig(os.path.join(fig_dir, f"GeneratorTrainLoss_iteration_{iters}.png"))
    plt.close(fig2)


# ----------------------------------------------------------------------
# Checkpointing (orbax)
# ----------------------------------------------------------------------

class CheckpointManager:
    """Orbax-backed checkpoints following the reference's directory contract.

    ``<root>/<pattern>/<adversarial|not_adversarial>/<ctime>/<tag>`` where tag
    is ``{text2mel|ssrn}_iteration_N`` or ``*_best_model``
    (``train/ordinary.py:271-284``)."""

    def __init__(self, cfg: Config, pattern: str, adversarial: bool, ctime: str,
                 train_kind: str):
        self.base = os.path.join(
            cfg.src_root_dir, "checkpoints", pattern,
            "adversarial" if adversarial else "not_adversarial", ctime)
        os.makedirs(self.base, exist_ok=True)
        self.prefix = train_kind[6:]  # 'text2mel' | 'ssrn' (train_step[6:])
        import orbax.checkpoint as ocp
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.abspath(os.path.join(self.base, tag))

    def save(self, state, host_meta: Dict[str, Any], iteration: int,
             best: bool = False) -> str:
        tag = (f"{self.prefix}_best_model" if best
               else f"{self.prefix}_iteration_{iteration}")
        path = self._path(tag)
        self._ckpt.save(path, state, force=True)
        # StandardCheckpointer saves asynchronously — block until the final
        # directory is committed so the path is immediately loadable.
        if hasattr(self._ckpt, "wait_until_finished"):
            self._ckpt.wait_until_finished()
        # Multi-process: orbax coordinates the array save across processes
        # (every process participates above); the side-car meta file is host
        # state and belongs to process 0 alone.
        if jax.process_index() == 0:
            with open(path + ".meta.json", "w") as f:
                json.dump(host_meta, f)
        return path

    def latest(self) -> Optional[str]:
        """Most recent ``*_iteration_N`` checkpoint in this run directory —
        enables ``--resume latest`` (the reference requires an explicit path,
        ``main.py:12``)."""
        best = None
        best_n = -1
        for e in os.listdir(self.base):
            if e.startswith(f"{self.prefix}_iteration_") and not e.endswith(".json"):
                try:
                    n = int(e.rsplit("_", 1)[1])
                except ValueError:
                    continue
                if n > best_n and os.path.isdir(os.path.join(self.base, e)):
                    best, best_n = e, n
        return self._path(best) if best else None

    def restore(self, path: str, target):
        state = self._ckpt.restore(os.path.abspath(path), target)
        meta_path = path + ".meta.json"
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return state, meta


# ----------------------------------------------------------------------
# Validation with the real AR decode path
# ----------------------------------------------------------------------

def make_ar_validator(melsyn, cfg: Config):
    """AR-decode a batch to GT length and score L1+BD+attention vs GT —
    the reference validation procedure (``train/ordinary.py:46-127``)."""
    from spoofsv_tpu.infer.decode import make_decoder
    from spoofsv_tpu.train.losses import (
        binary_divergence, guided_attention_loss, l1_loss)

    gaw = jnp.asarray(guided_attention_matrix(cfg.max_text_len, cfg.max_frame_num))
    decoders: Dict[int, Any] = {}

    def validate_batch(params, batch) -> Dict[str, float]:
        t = batch["mel"].shape[1]
        if t not in decoders:
            decoders[t] = make_decoder(melsyn, t)
        y, a, _ = decoders[t](params, batch["text"], batch["spk"])
        l1 = l1_loss(batch["mel"], y)
        bd = binary_divergence(batch["mel"], y)
        att = guided_attention_loss(a, gaw)
        loss = l1 + bd + att
        return {"l1": float(l1), "bd": float(bd), "att": float(att),
                "loss": float(loss)}

    return validate_batch


def make_ssrn_validator(ssrn, cfg: Config):
    from spoofsv_tpu.train.losses import binary_divergence, l1_loss

    @jax.jit
    def _fwd(params, mel):
        return ssrn.apply(params, mel)

    def validate_batch(params, batch) -> Dict[str, float]:
        y = _fwd(params, batch["mel"])
        l1 = l1_loss(batch["lin"], y)
        bd = binary_divergence(batch["lin"], y)
        return {"l1": float(l1), "bd": float(bd), "loss": float(l1 + bd)}

    return validate_batch


# ----------------------------------------------------------------------
# Trainer
# ----------------------------------------------------------------------

class Trainer:
    """Drives ordinary or adversarial training with the reference's cadence."""

    def __init__(self, cfg: Config, gen_model, train_kind: str,
                 pattern: str = "conditional", adversarial: bool = False,
                 gan_type: str = "wgan-gp", disc_model=None,
                 ctime: str = "dev", use_masks: bool = False,
                 validate_with_decode: bool = True, metrics_every: int = 1,
                 mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` for data-parallel training —
        params/opt state replicated, batches sharded over the ``data`` axis,
        XLA inserts the gradient all-reduce over ICI. The TPU-native
        equivalent of the reference's ``DataParallel`` wrap gated by
        ``MULTI_GPU`` (``train/ordinary.py:165-173``, ``config.json:34``)."""
        self.mesh = mesh
        self._n_shards = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
        self._warned_uneven = False
        self.metrics_every = max(1, metrics_every)
        self.cfg = cfg
        self.gen_model = gen_model
        self.train_kind = train_kind
        self.adversarial = adversarial
        self.ckpt = CheckpointManager(cfg, pattern, adversarial, ctime, train_kind)
        self.fig_dir = os.path.join(self.ckpt.base, "fig")
        # Multi-process runs (jax.distributed over a pod): host-side artifacts
        # are owned by process 0 only (parallel/multihost.py design rules).
        self.metrics = MetricsLogger(
            os.path.join(self.ckpt.base, "metrics.jsonl")
            if jax.process_index() == 0 else None)
        self.loss_val_log: List[float] = []
        self.loss_logs: Dict[str, List[float]] = {
            "wd": [], "t_s": [], "t_s_o": [], "t_d": []}

        if adversarial:
            assert disc_model is not None
            self.init_fn, self.g_step, self.d_step = steps_mod.make_adversarial_steps(
                gen_model, disc_model, cfg, train_kind, gan_type, use_masks)
        else:
            self.init_fn, self.step_fn = steps_mod.make_ordinary_step(
                gen_model, cfg, train_kind, use_masks)

        if train_kind == "train_text2mel" and validate_with_decode:
            self.validator = make_ar_validator(gen_model, cfg)
        elif train_kind == "train_ssrn":
            self.validator = make_ssrn_validator(gen_model, cfg)
        else:
            self.validator = None

        self.state = None
        self.iteration = 0
        self.epoch = 0

    # -- lifecycle ----------------------------------------------------------
    def init(self, rng, batch):
        self.state = self.init_fn(rng, batch)
        if self.mesh is not None:
            from spoofsv_tpu.parallel.mesh import replicate_tree
            self.state = replicate_tree(self.state, self.mesh)
        return self.state

    def resume(self, path: str, example_batch):
        target = self.init_fn(jax.random.PRNGKey(0), example_batch)
        self.state, meta = self.ckpt.restore(path, target)
        if self.mesh is not None:
            from spoofsv_tpu.parallel.mesh import replicate_tree
            self.state = replicate_tree(self.state, self.mesh)
        self.iteration = int(meta.get("iteration", 0))
        self.epoch = int(meta.get("epoch", 0))
        self.loss_val_log = meta.get("loss_val_log", [])
        self.loss_logs = meta.get("loss_logs", self.loss_logs)

    def _flush_loss_logs(self) -> None:
        """Materialize any device-held loss scalars as host floats, one
        stacked transfer per log (a per-scalar fetch would cost a full
        device roundtrip each on remote-TPU transports)."""
        out: Dict[str, List[float]] = {}
        for k, vs in self.loss_logs.items():
            if vs and any(isinstance(v, jax.Array) for v in vs):
                stacked = np.asarray(jnp.stack([jnp.asarray(v, jnp.float32)
                                                for v in vs]))
                out[k] = [float(x) for x in stacked]
            else:
                out[k] = [float(v) for v in vs]
        self.loss_logs = out

    def _host_meta(self) -> Dict[str, Any]:
        self._flush_loss_logs()
        return {"iteration": self.iteration, "epoch": self.epoch,
                "loss_val_log": self.loss_val_log, "loss_logs": self.loss_logs}

    # -- one iteration ------------------------------------------------------
    def train_iteration(self, batch, rng) -> Dict[str, float]:
        """One optimizer step. Metric fetch cadence is controlled by
        ``metrics_every`` (default 1 = reference behavior of printing every
        iteration): device→host scalar fetches synchronize the stream, which
        on remote-TPU transports costs ~10-40 ms per step — far more than the
        13-30 ms step itself. With ``metrics_every=k`` the device values stay
        un-fetched on off iterations and steps pipeline back-to-back.
        """
        if self.adversarial:
            is_g = self.iteration % (self.cfg.ratio + 1) == 0
            if is_g:
                self.state, m = self.g_step(self.state, batch, rng)
            else:
                self.state, m = self.d_step(self.state, batch, rng)
        else:
            is_g = True
            self.state, m = self.step_fn(self.state, batch, rng)
        self.iteration += 1
        # Keep the checkpoint loss-history contract at any metrics_every: on
        # off iterations the *device* scalars are appended (no sync); they are
        # batch-fetched by _flush_loss_logs at checkpoint/plot time.
        if self.adversarial:
            if is_g:
                self.loss_logs["t_s"].append(m["loss"])
                self.loss_logs["t_s_o"].append(m["loss_disc"])
            else:
                self.loss_logs["t_d"].append(m["loss_d"])
                self.loss_logs["wd"].append(m["wd"])
        if self.iteration % self.metrics_every:
            return {}
        return {k: float(v) for k, v in m.items()}

    def _gen_params(self):
        return (self.state.gen_params if self.adversarial else self.state.params)

    def _place_batch(self, batch):
        """Place one batch for training. Without a mesh: plain device arrays.
        With a mesh: shard the batch dim over the ``data`` axis (a no-op for
        batches a mesh-aware loader already placed). Batches whose leading dim
        does not divide the data-axis size are trimmed to the largest multiple
        (the reference's ``DataParallel`` scatters uneven chunks; XLA sharding
        requires even ones — with per-epoch shuffling no example is
        systematically dropped)."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from spoofsv_tpu.parallel.mesh import shard_batch
        # Multi-process (jax.distributed): each process's loader feeds only its
        # LOCAL share of the global batch — assemble the global jax.Array from
        # the per-process shards (no host gathers, no cross-host transfers).
        n_proc = jax.process_count()
        per_proc_shards = self._n_shards // max(1, n_proc)
        n = next(iter(batch.values())).shape[0]
        keep = (n // per_proc_shards) * per_proc_shards
        if keep == 0:
            return None
        if keep != n:
            if not self._warned_uneven:
                print(f"[mesh] trimming uneven batch {n} -> {keep} "
                      f"({self._n_shards} data shards / {n_proc} processes)")
                self._warned_uneven = True
            batch = {k: v[:keep] for k, v in batch.items()}
        if n_proc > 1:
            from spoofsv_tpu.parallel import multihost
            return multihost.global_batch_from_local(batch, self.mesh)
        return shard_batch(batch, self.mesh)

    # -- validation + checkpoint cadence -------------------------------------
    def maybe_validate_and_checkpoint(self, val_batches: Iterable,
                                     train_batch=None) -> Optional[float]:
        if self.iteration % self.cfg.val_every_iter != 0 or self.iteration == 0:
            return None
        params = self._gen_params()
        losses = []
        for vb in val_batches:
            r = self.validator(params, vb)
            self.metrics.log(dict(r, split="validate", iteration=self.iteration))
            losses.append(r["loss"])
        if train_batch is not None and self.validator is not None:
            r = self.validator(params, train_batch)
            self.metrics.log(dict(r, split="train_probe", iteration=self.iteration))
        loss_val = float(np.mean(losses)) if losses else float("nan")
        self.loss_val_log.append(loss_val)
        meta = self._host_meta()
        if losses and self.loss_val_log.index(min(self.loss_val_log)) == len(self.loss_val_log) - 1:
            self.ckpt.save(self.state, meta, self.iteration, best=True)
        self.ckpt.save(self.state, meta, self.iteration)
        return loss_val

    # -- full loop ----------------------------------------------------------
    def fit(self, train_loader_factory, val_loader_factory=None,
            max_epochs: Optional[int] = None, rng_seed: int = 0,
            max_iterations: Optional[int] = None, plot: bool = False):
        """train_loader_factory() → iterable of batches (one epoch)."""
        key = jax.random.PRNGKey(rng_seed)
        max_epochs = max_epochs or self.cfg.max_epochs
        last_batch = None
        window_t0 = time.time()
        while self.epoch < max_epochs:
            for batch in train_loader_factory():
                batch = self._place_batch(batch)
                if batch is None:  # smaller than the mesh's data axis
                    continue
                if self.state is None:
                    self.init(jax.random.PRNGKey(rng_seed), batch)
                    window_t0 = time.time()  # exclude init from the window
                key, sub = jax.random.split(key)
                m = self.train_iteration(batch, sub)
                if m:  # fetched on this iteration (see metrics_every)
                    # the fetch syncs every queued async step since the last
                    # fetch — amortize the whole window, or the metric reads
                    # metrics_every× too slow on pipelined transports
                    now = time.time()
                    m["sec_per_iter"] = (now - window_t0) / self.metrics_every
                    window_t0 = now
                    self.metrics.log(dict(m, split="train",
                                          iteration=self.iteration,
                                          epoch=self.epoch))
                last_batch = batch
                # Only touch the validation loader on validation iterations —
                # constructing it every step would cost O(val-set) host
                # feature extraction per training step.
                if (self.validator is not None and val_loader_factory is not None
                        and self.iteration > 0
                        and self.iteration % self.cfg.val_every_iter == 0):
                    # Mesh runs place validation batches like train batches
                    # (multi-process requires global arrays in jitted calls).
                    if self.mesh is not None:
                        vb = (b for b in (self._place_batch(x)
                                          for x in val_loader_factory())
                              if b is not None)
                    else:
                        vb = ({k: jnp.asarray(v) for k, v in b.items()}
                              for b in val_loader_factory())
                    lv = self.maybe_validate_and_checkpoint(vb, last_batch)
                    if lv is not None and plot and jax.process_index() == 0:
                        self._flush_loss_logs()
                        plot_losses(self.loss_logs, self.iteration, self.fig_dir)
                    # validation/checkpoint time must not pollute the
                    # sec_per_iter window — it only measures train steps
                    window_t0 = time.time()
                if max_iterations and self.iteration >= max_iterations:
                    return self.state
            self.epoch += 1
        return self.state
