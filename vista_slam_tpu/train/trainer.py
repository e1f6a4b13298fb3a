"""Training driver: epoch loop, metrics, checkpoint/resume.

Capability-matched to the reference trainer (reference:
vista_slam/sta_model/train.py:331-478 and utils/croco_misc.py):
  * per-iteration warmup+cosine LR, AdamW(0.9, 0.95), grad clip 1.0
  * per-epoch test evaluation with best-checkpoint tracking
  * coarse-to-fine confidence alpha schedule fed into the loss as a traced
    scalar (train.py:466-468)
  * checkpoint-last / checkpoint-best with optimizer + epoch state (orbax)
  * JSON-lines log.txt metrics, windowed MetricLogger smoothing, and
    TensorBoard scalars behind cfg.tensorboard (train.py:316-323,428-431)
TPU redesign: DDP/AMP/GradScaler are replaced by one jitted step over a
(dp, tp) mesh (train/step.py); data sharding replaces the rank sampler.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sta import STA, STAConfig
from ..parallel.mesh import make_mesh
from ..utils.logging import Channel, log
from .data import TrainLoader, build_dataset
from .metrics import MetricLogger, ScalarWriter
from .step import TrainState, make_loss_fn, make_optimizer, make_train_step


@dataclasses.dataclass
class TrainConfig:
    train_dataset: str = ""
    test_dataset: str = ""
    output_dir: str = "output/train"
    batch_size: int = 4
    epochs: int = 200
    steps_per_epoch: int | None = None  # derived from the dataset if None
    lr: float = 1.5e-5
    min_lr: float = 1e-6
    weight_decay: float = 0.05
    warmup_epochs: int = 10
    clip: float = 1.0
    neighbor_num: int = 1
    loop_num: int = 1
    alpha_c2f: bool = True  # coarse-to-fine conf alpha
    opt_state_dtype: str = "bf16"
    #   Adam moment storage: fp32 | bf16 | int8 | bf16_fused | int8_fused.
    #   bf16/int8 are compressed XLA carriers, *_fused the single-pass
    #   Pallas applier (train/quantized_opt.py; update math identical).
    #   Defaults settled by the round-5 paired ABBA (BASELINE.md "Optimizer
    #   state"): bf16 = 118 ms/step vs fp32's 123 at batch 8, −1.75 GB
    #   state, ≤0.9% loss drift over 50 full-size steps; int8_fused is the
    #   memory floor (2.65 GB args at ~fp32 speed). The fused modes need a
    #   dp-only mesh and do not compose with accum_iter/freeze
    #   (make_optimizer/make_train_step raise with the same wording).
    alpha_init: float = 0.4
    seed: int = 0
    save_freq: int = 1
    tensorboard: bool = False  # scalar event files under output_dir/tb
    log_every: int = 20        # windowed-metric console cadence (iterations)
    num_workers: int = 0       # loader threads (0 = synchronous)
    model: dict = dataclasses.field(default_factory=dict)

    @property
    def n_support(self) -> int:
        return 2 * self.neighbor_num + self.loop_num


def _alpha_schedule(cfg: TrainConfig, epoch: int) -> float:
    if not cfg.alpha_c2f:
        return cfg.alpha_init
    half = 0.5 * cfg.epochs
    return cfg.alpha_init - 0.2 * max((epoch - half) / max(half, 1), 0.0)


class Trainer:
    def __init__(self, cfg: TrainConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        overrides = dict(cfg.model)
        if "img_size" in overrides:
            overrides["img_size"] = tuple(overrides["img_size"])
        self.model_cfg = STAConfig(**overrides)
        self.model = STA(self.model_cfg)
        os.makedirs(cfg.output_dir, exist_ok=True)

        self.train_ds = build_dataset(cfg.train_dataset)
        self.test_ds = build_dataset(cfg.test_dataset) if cfg.test_dataset else None
        self.loader = TrainLoader(self.train_ds, cfg.batch_size, cfg.n_support,
                                  num_workers=cfg.num_workers)
        steps = cfg.steps_per_epoch or max(len(self.loader), 1)
        total_steps = steps * cfg.epochs
        self.optimizer = make_optimizer(
            lr=cfg.lr, warmup_steps=cfg.warmup_epochs * steps,
            total_steps=total_steps, min_lr=cfg.min_lr,
            weight_decay=cfg.weight_decay, clip=cfg.clip,
            state_dtype=cfg.opt_state_dtype)
        self.init_fn, self.jit_step, self.shard_batch = make_train_step(
            self.model, self.optimizer, self.mesh, cfg.n_support)
        self.eval_loss_fn = jax.jit(make_loss_fn(self.model, cfg.n_support))
        self.state: TrainState | None = None
        self.start_epoch = 0
        self.best_so_far = float("inf")
        self.best_epoch = -1
        self.writer = ScalarWriter(os.path.join(cfg.output_dir, "tb"),
                                   enabled=cfg.tensorboard)
        self._global_step = 0

    # -- checkpointing (orbax) --------------------------------------------
    def _ckpt_mgr(self, name: str = "checkpoints"):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.cfg.output_dir, name))
        return ocp.CheckpointManager(path, options=ocp.CheckpointManagerOptions(
            max_to_keep=3, create=True))

    def save_checkpoint(self, epoch: int, best: float, name: str = "checkpoints"):
        import orbax.checkpoint as ocp

        mgr = self._ckpt_mgr(name)
        payload = {"params": jax.device_get(self.state.params),
                   "opt_state": jax.device_get(self.state.opt_state),
                   "step": int(self.state.step),
                   "meta": np.asarray([epoch, best], np.float64)}
        mgr.save(epoch, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()

    def restore_checkpoint(self):
        import orbax.checkpoint as ocp

        mgr = self._ckpt_mgr()
        step = mgr.latest_step()
        if step is None:
            return False
        template = {"params": jax.device_get(self.state.params),
                    "opt_state": jax.device_get(self.state.opt_state),
                    "step": int(self.state.step),
                    "meta": np.zeros(2)}
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
        self.state = TrainState(
            jax.device_put(restored["params"]),
            jax.device_put(restored["opt_state"]),
            jnp.asarray(restored["step"], jnp.int32))
        self.start_epoch = int(restored["meta"][0]) + 1
        self.best_so_far = float(restored["meta"][1])
        log(f"resumed from epoch {self.start_epoch}", Channel.INFO)
        return True

    # -- loops ---------------------------------------------------------------
    def init_state(self, params=None, resume: bool = True):
        if params is None:
            h, w = self.model_cfg.img_size
            dummy = jnp.zeros((1, h, w, 3))
            params = self.model.init(jax.random.PRNGKey(self.cfg.seed), dummy, dummy)
        with self.mesh:
            self.state = self.init_fn(params)
        if resume:
            self.restore_checkpoint()

    def train_one_epoch(self, epoch: int) -> dict:
        self.loader.set_epoch(epoch)
        alpha = _alpha_schedule(self.cfg, epoch)
        meters = MetricLogger(window_size=self.cfg.log_every)
        losses = []
        t0 = time.time()
        with self.mesh:
            for i, batch in enumerate(self.loader):
                batch = self.shard_batch(batch)
                it0 = time.time()
                self.state, loss, details = self.jit_step(self.state, batch, alpha)
                loss = float(loss)
                if not np.isfinite(loss):
                    # abort with diagnostics (reference: train.py:287-290)
                    raise FloatingPointError(
                        f"non-finite loss at epoch {epoch} step {i}: "
                        f"{jax.tree_util.tree_map(float, details)}")
                losses.append(loss)
                meters.update(loss=loss, iter_s=time.time() - it0)
                self._global_step += 1
                if self.cfg.tensorboard:
                    self.writer.add_scalar("train/loss_iter", loss,
                                           self._global_step)
                if (i + 1) % self.cfg.log_every == 0:
                    log(f"epoch {epoch} it {i + 1}: {meters.summary()}",
                        Channel.INFO)
        return {"loss": float(np.mean(losses)) if losses else float("nan"),
                "loss_median": meters.loss.median if losses else float("nan"),
                "steps": len(losses), "time_s": time.time() - t0}

    def test_one_epoch(self, epoch: int) -> dict:
        if self.test_ds is None:
            return {}
        loader = TrainLoader(self.test_ds, self.cfg.batch_size,
                             self.cfg.n_support,
                             num_workers=self.cfg.num_workers)
        loader.set_epoch(epoch)
        losses = []
        with self.mesh:
            for batch in loader:
                batch = self.shard_batch(batch)
                loss, _ = self.eval_loss_fn(self.state.params, batch)
                losses.append(float(loss))
        return {"test_loss": float(np.mean(losses)) if losses else float("nan")}

    def _write_log(self, epoch: int, stats: dict):
        with open(os.path.join(self.cfg.output_dir, "log.txt"), "a") as f:
            f.write(json.dumps({"epoch": epoch, **stats}) + "\n")

    def fit(self):
        if self.state is None:
            self.init_state()
        for epoch in range(self.start_epoch, self.cfg.epochs):
            alpha = _alpha_schedule(self.cfg, epoch)
            train_stats = self.train_one_epoch(epoch)
            test_stats = self.test_one_epoch(epoch)
            stats = {**train_stats, **test_stats, "alpha": alpha}
            log(f"epoch {epoch}: {stats}", Channel.INFO)
            self._write_log(epoch, stats)
            if self.cfg.tensorboard:
                for k, v in stats.items():
                    if np.isscalar(v) and np.isfinite(v):
                        self.writer.add_scalar(f"epoch/{k}", float(v), epoch)
                self.writer.flush()
            metric = test_stats.get("test_loss", train_stats["loss"])
            if np.isfinite(metric) and metric < self.best_so_far:
                self.best_so_far = metric
                self.best_epoch = epoch
                # separate best checkpoint (reference: croco_misc.py:297-310
                # checkpoint-best)
                self.save_checkpoint(epoch, self.best_so_far,
                                     name="checkpoints_best")
            if epoch % self.cfg.save_freq == 0:
                self.save_checkpoint(epoch, self.best_so_far)
        self.writer.close()
        return self.state
