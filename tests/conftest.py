"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/pjit paths are
validated on a host-platform mesh instead (the XLA programs are identical up
to backend lowering).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# A site hook (e.g. a TPU-tunnel plugin) may have imported jax before this
# conftest ran, freezing jax.config.jax_platforms to a hardware backend.
# Tests must run on the virtual 8-device CPU mesh: force the config and drop
# any already-initialized backends.
import jax  # noqa: E402

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge

        xla_bridge.backends.cache_clear()
    except Exception:
        pass
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()
