"""Device mesh + sharding rules for STA training.

The reference trains with DDP-over-NCCL data parallelism only (reference:
vista_slam/utils/croco_misc.py:227-248, sta_model/train.py:398-400). The TPU
build shards with jax.sharding over a (dp, tp) mesh instead:
  * dp — batch (gradients reduced by XLA-inserted psum over ICI, the
    data-parallel axis replacing the DDP allreduce),
  * tp — tensor parallelism over attention/MLP hidden dimensions (megatron
    layout: column-parallel qkv/fc1, row-parallel proj/fc2), which the
    reference has no equivalent of.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"make_mesh({n_devices}) but only {len(devices)} device(s) "
                f"available on backend {jax.default_backend()!r}; refusing to "
                "silently truncate — force a virtual CPU mesh via "
                "XLA_FLAGS=--xla_force_host_platform_device_count or run on "
                "real hardware")
        devices = devices[:n_devices]
    n = len(devices)
    if tp is None:
        # largest power-of-two tp <= 4 that divides the device count
        tp = 1
        for cand in (4, 2):
            if n % cand == 0:
                tp = cand
                break
    dp = n // tp
    return Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))


# megatron-style tensor-parallel layout for the transformer kernels:
# column-parallel producers (qkv, fc1, projq/k/v) shard the output dim;
# row-parallel consumers (proj, fc2) shard the input dim and psum outputs.
_COL_PARALLEL = {"qkv", "fc1", "projq", "projk", "projv"}
_ROW_PARALLEL = {"proj", "fc2"}


def param_spec(path: tuple[str, ...], leaf) -> P:
    names = [getattr(p, "key", str(p)) for p in path]
    owner = names[-2] if len(names) >= 2 else ""
    kind = names[-1]
    if kind == "kernel" and leaf.ndim == 2:
        if owner in _COL_PARALLEL:
            return P(None, "tp")
        if owner in _ROW_PARALLEL:
            return P("tp", None)
    if kind == "bias" and owner in _COL_PARALLEL:
        return P("tp")
    return P()  # replicated


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)), params)


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
