"""Multi-host (multi-process) training initialization.

TPU-native replacement for the reference's NCCL process-group setup
(reference: vista_slam/utils/croco_misc.py:227-248): on a pod slice,
`jax.distributed.initialize()` wires all hosts into one runtime; the (dp, tp)
mesh then spans every chip, gradient psums ride ICI within a slice and DCN
across slices. Data loading shards per process (process_index plays the role
of the DDP rank).
"""

from __future__ import annotations

import os

import jax

from ..utils.logging import Channel, log


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> dict:
    """Initialize the multi-host runtime if requested via args or env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or
    auto-detection on TPU pods). Single-process fallback mirrors the
    reference's 'Not using distributed mode' path (croco_misc.py:229-236).
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    explicit = coordinator_address is not None
    on_tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") >= 1
    if explicit or on_tpu_pod:
        kwargs = {}
        if explicit:
            kwargs = dict(
                coordinator_address=coordinator_address,
                num_processes=int(num_processes or os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(process_id if process_id is not None
                               else os.environ["JAX_PROCESS_ID"]))
        jax.distributed.initialize(**kwargs)
        log(f"distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices")
    else:
        log("single-process mode (no coordinator configured)", Channel.INFO)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }
