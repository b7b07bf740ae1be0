"""Test configuration: run on a virtual 8-device CPU mesh.

The environment's sitecustomize imports jax at interpreter startup (to
register the TPU plugin), so setting JAX_PLATFORMS via os.environ here is
too late.  jax.config.update works after import as long as no backend has
been initialized yet — which is the case at conftest load time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in _flags:
    # 8 virtual devices on 4 cores under parallel pytest workers: an
    # in-process collective rendezvous can stall past XLA:CPU's default
    # terminate timeout, which ABORTS the process (observed: xdist
    # worker crash in the meshed flagship test's sharded-tree gathers).
    # Oversubscription should be slow, not fatal.
    _flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    )
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
