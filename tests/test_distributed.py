"""Multi-host init smoke test: drive parallel/distributed.py's
jax.distributed.initialize path with TWO real processes on CPU (coordinator
on localhost), proving the DCN code path executes — the analog of the
reference's NCCL process-group init (reference:
vista_slam/utils/croco_misc.py:227-248)."""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
import jax
import jax.numpy as jnp
from jax.experimental import multihost_utils

from vista_slam_tpu.parallel.distributed import init_distributed
from vista_slam_tpu.parallel.mesh import make_mesh

info = init_distributed()
assert info["process_count"] == 2, info
assert info["global_devices"] == 4, info

# a real cross-process collective over DCN: allgather a per-process value
x = jnp.full((2,), float(jax.process_index() + 1))
gathered = multihost_utils.process_allgather(x)
assert gathered.shape == (2, 2), gathered.shape
assert float(gathered.sum()) == 2.0 * (1 + 2), gathered

# global (dp, tp) mesh spanning both processes compiles a psum
mesh = make_mesh(4, tp=2)
from jax.sharding import NamedSharding, PartitionSpec as P
arr = jax.device_put(
    jnp.arange(8.0).reshape(4, 2),
    NamedSharding(mesh, P("dp", "tp")))
total = jax.jit(lambda a: a.sum())(arr)
assert float(total) == 28.0, float(total)

# meter sync: global_avg must reflect BOTH hosts after the collective
# (reference: croco_misc.py:44-54)
from vista_slam_tpu.train.metrics import SmoothedValue
sv = SmoothedValue()
sv.update(float(jax.process_index() + 1), n=jax.process_index() + 1)
sv.synchronize_between_processes()
assert sv.count == 3, sv.count
assert abs(sv.global_avg - (1.0 * 1 + 2.0 * 2) / 3) < 1e-12, sv.global_avg
print(f"DISTRIBUTED_OK process={jax.process_index()}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_init(tmp_path):
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    procs = []
    for pid in range(2):
        env = {k: v for k, v in os.environ.items() if "axon" not in v.lower()}
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "PYTHONPATH": REPO,
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"DISTRIBUTED_OK process={pid}" in out, out[-2000:]


TRAIN_CHILD = r"""
import sys
import jax

from vista_slam_tpu.parallel.distributed import init_distributed
from vista_slam_tpu.parallel.mesh import make_mesh
from dist_train_common import run_one_step

expected = float(sys.argv[1])
state_dtype = sys.argv[2]
tp = int(sys.argv[3])
n_steps = int(sys.argv[4])
info = init_distributed()
assert info["process_count"] == 2, info
assert info["global_devices"] == 8, info
mesh = make_mesh(8, tp=tp)  # global mesh spanning both processes
loss = run_one_step(mesh, state_dtype=state_dtype, n_steps=n_steps)
rel = abs(loss - expected) / max(abs(expected), 1e-12)
assert rel < 1e-5, (loss, expected, rel)
print(f"TRAIN_STEP_OK process={jax.process_index()} loss={loss}")
"""


def _run_train_children(tmp_path, expected, state_dtype, tp, n_steps):
    port = _free_port()
    script = tmp_path / "train_child.py"
    script.write_text(TRAIN_CHILD)
    procs = []
    for pid in range(2):
        env = {k: v for k, v in os.environ.items() if "axon" not in v.lower()}
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "PYTHONPATH": f"{REPO}:{os.path.join(REPO, 'tests')}",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script), repr(expected), state_dtype,
             str(tp), str(n_steps)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"TRAIN_STEP_OK process={pid}" in out, out[-2000:]


def test_two_process_sharded_train_step(tmp_path):
    """One REAL gradient-synchronized training step across two processes
    (4 virtual CPU devices each, global (dp=4, tp=2) mesh) must produce the
    same loss as the single-process 8-device run — the DCN path executing
    the actual training program, not just init (the reference's DDP
    contract: croco_misc.py:227-248 + allreduce train.py:398-400)."""
    from vista_slam_tpu.parallel.mesh import make_mesh

    from dist_train_common import run_one_step

    expected = run_one_step(make_mesh(8, tp=2))
    assert np.isfinite(expected)
    _run_train_children(tmp_path, expected, "fp32", tp=2, n_steps=1)


def test_two_process_train_step_fused_int8(tmp_path):
    """TWO gradient-synchronized steps with the fused int8 optimizer state
    across two processes (dp-only global mesh — the reference's DDP layout,
    the only one the fused kernel accepts) must match the single-process
    8-device loss: compressed moments survive the DCN round and the
    second step consumes quantized state produced by the first."""
    from vista_slam_tpu.parallel.mesh import make_mesh

    from dist_train_common import run_one_step

    expected = run_one_step(make_mesh(8, tp=1), state_dtype="int8_fused",
                            n_steps=2)
    assert np.isfinite(expected)
    _run_train_children(tmp_path, expected, "int8_fused", tp=1, n_steps=2)
