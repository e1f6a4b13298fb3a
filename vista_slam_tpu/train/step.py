"""pjit training step for the STA frontend over a (dp, tp) device mesh.

Replaces the reference's DDP/AMP/GradScaler loop (reference:
vista_slam/sta_model/train.py:233-328, utils/croco_misc.py:251-277) with a
single jit-compiled step: forward (bf16 compute) -> loss -> grad -> global
clip -> AdamW, with gradient reduction and tensor-parallel collectives
inserted by XLA from the sharding annotations.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.sta import STA
from ..parallel.mesh import batch_sharding, param_shardings, replicated
from .losses import sta_criterion


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, warmup_steps: int = 1000,
                   total_steps: int = 100_000, min_lr: float = 1e-6,
                   weight_decay: float = 0.05, clip: float = 1.0,
                   accum_iter: int = 1, freeze=None,
                   state_dtype: str = "fp32"):
    """AdamW(betas=0.9/0.95) + per-iteration cosine schedule with warmup +
    global-norm clip (reference: train.py:403-404, croco_misc.py:454-469,
    clip at train.py:293). ``accum_iter`` enables gradient accumulation
    (reference: train.py:142-143,292-297); ``freeze`` is an optional
    predicate(path_names) -> bool marking frozen parameters (reference
    set_freeze, sta_model.py:148-161). ``state_dtype`` selects the Adam
    moment storage: fp32 (the reference's), or the compressed bf16 /
    blockwise-int8 carriers (train/quantized_opt.py) — update math and
    schedule identical."""
    warmup_steps = min(warmup_steps, max(total_steps // 10, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
        decay_steps=total_steps, end_value=min_lr)
    if state_dtype.endswith("_fused"):
        if accum_iter > 1 or freeze is not None:
            raise ValueError("the fused optimizer kernel does not compose "
                             "with accum_iter/freeze; use state_dtype="
                             "'int8'/'bf16' (XLA carriers) for those")
        from .quantized_opt import make_fused_adamw

        return make_fused_adamw(schedule, b1=0.9, b2=0.95,
                                weight_decay=weight_decay, clip=clip,
                                state_dtype=state_dtype)
    decay_mask = lambda p: jax.tree_util.tree_map(lambda x: x.ndim > 1, p)
    if state_dtype == "fp32":
        adam = optax.adamw(schedule, b1=0.9, b2=0.95,
                           weight_decay=weight_decay, mask=decay_mask)
    else:
        from .quantized_opt import adamw_q

        adam = adamw_q(schedule, b1=0.9, b2=0.95,
                       weight_decay=weight_decay, mask=decay_mask,
                       state_dtype=state_dtype)
    tx = optax.chain(optax.clip_by_global_norm(clip), adam)
    if freeze is not None:
        def label(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "frozen" if freeze(
                    tuple(getattr(p, "key", str(p)) for p in path)) else "train",
                params)

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label)
    if accum_iter > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_iter)
    return tx


def freeze_encoder(path: tuple[str, ...]) -> bool:
    """Freeze predicate matching the reference's freeze='encoder'
    (patch embed + encoder blocks, sta_model.py:150-152)."""
    return any(n.startswith(("enc_block", "patch_embed")) for n in path)


def split_train_outputs(out: dict, n_support: int, batch: int):
    """Slice the train_forward output (leading 2*S*B) into per-support
    main/support prediction dicts."""
    SB = n_support * batch
    mains, supports = [], []
    for i in range(n_support):
        sl_main = slice(i * batch, (i + 1) * batch)
        sl_supp = slice(SB + i * batch, SB + (i + 1) * batch)
        mains.append({"pts3d": out["pts3d"][sl_main], "conf": out["conf"][sl_main],
                      "pose": out["pose"][sl_main], "pose_conf": out["pose_conf"][sl_main]})
        supports.append({"pts3d": out["pts3d"][sl_supp], "conf": out["conf"][sl_supp],
                         "pose": out["pose"][sl_supp], "pose_conf": out["pose_conf"][sl_supp]})
    return mains, supports


def make_loss_fn(model: STA, n_support: int, reproj_grad="bf16_scatter"):
    def loss_fn(params, batch, conf_alpha=0.4):
        out = model.apply(params, batch["main"]["img"], batch["support_imgs"],
                          method=STA.train_forward)
        B = batch["main"]["img"].shape[0]
        mains, supports = split_train_outputs(out, n_support, B)
        gt_supports = [
            jax.tree_util.tree_map(lambda x, i=i: x[i], batch["supports"])
            for i in range(n_support)
        ]
        loss, details = sta_criterion(batch["main"], gt_supports, mains,
                                      supports, conf_alpha=conf_alpha,
                                      reproj_grad=reproj_grad)
        return loss, details

    return loss_fn


def make_train_step(model: STA, optimizer, mesh, n_support: int,
                    reproj_grad="bf16_scatter"):
    """Build (init_fn, step_fn) with sharding constraints over the mesh.
    ``step_fn(state, batch, conf_alpha)`` takes the coarse-to-fine confidence
    alpha as a traced scalar (reference schedule: train.py:466-468), so the
    per-epoch schedule changes values without recompiling. ``reproj_grad``
    selects the reprojection sampler's VJP (losses._grid_sample_nearest)."""
    loss_fn = make_loss_fn(model, n_support, reproj_grad=reproj_grad)
    if hasattr(optimizer, "step") and mesh.shape.get("tp", 1) > 1:
        raise ValueError(
            "fused optimizer kernels need replicated params (the per-leaf "
            "Pallas call cannot be partitioned over tp-sharded leaves); use "
            "a dp-only mesh — the reference's own DDP layout — or "
            "state_dtype='int8'/'bf16'")

    def init_fn(params):
        shardings = param_shardings(params, mesh)
        params = jax.device_put(params, shardings)
        return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

    fused = hasattr(optimizer, "step")  # FusedAdamW (quantized_opt.py)

    def step_fn(state: TrainState, batch, conf_alpha=0.4):
        (loss, details), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, conf_alpha)
        if fused:
            params, opt_state = optimizer.step(state.params, grads,
                                               state.opt_state)
        else:
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss, details

    data_shard = batch_sharding(mesh)
    rep = replicated(mesh)

    def shard_batch(batch):
        """dp-shard every leaf on its batch axis (supports have axis 1)."""
        def put(path, x):
            names = [getattr(p, "key", str(p)) for p in path]
            if "supports" in names or "support_imgs" in names:
                from jax.sharding import NamedSharding, PartitionSpec as P

                return jax.device_put(x, NamedSharding(mesh, P(None, "dp")))
            return jax.device_put(x, data_shard)

        return jax.tree_util.tree_map_with_path(put, batch)

    jit_step = jax.jit(step_fn, donate_argnums=(0,))
    return init_fn, jit_step, shard_batch
