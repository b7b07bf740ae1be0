"""Device mesh construction + the active commit mesh.

``use_commit_mesh`` is how the single-proof prover goes multi-chip on the
intra-op axis: inside the context, ``engine.prover._commit`` computes any
sufficiently large LDE with the four-step all-to-all NTT sharded over the
mesh (``ntt_sharded.coset_lde_sharded``) instead of the single-device
kernel.  Results are bit-identical (exact modular arithmetic)."""

from __future__ import annotations

from contextlib import contextmanager

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis_name: str = "d") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (axis_name,))


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> Mesh:
    """Multi-host entry point: initialize ``jax.distributed`` and return a
    1-axis mesh over every chip in the pod slice.

    The reference has no distributed story at all (SURVEY §2.3: its only
    parallelism is in-process rayon); this is the TPU-native equivalent for
    scaling past one host.  On Cloud TPU pods the coordinator/process
    arguments resolve automatically from the TPU metadata environment, so
    ``init_distributed()`` with no arguments is the common call — run the
    SAME program on every host (SPMD), then hand the returned mesh to
    ``prove_batch(..., mesh=...)`` (proof-level axis) or
    ``use_commit_mesh`` (intra-op NTT axis).  Collectives ride ICI within
    the slice; only host-side proof aggregation crosses DCN.

    No-op when jax.distributed is already initialized (safe to call from
    library code); single-process runs simply get the local-device mesh.
    NOTE: like ``jax.distributed.initialize`` itself, this must run before
    any JAX computation touches a backend — call it first thing in the
    program (the 2-process pytest, tests/distributed_worker.py, is the
    executable example).
    """
    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        if explicit:
            # the caller named a coordinator: silently proving on a local
            # mesh instead of the global one would be wrong — surface it
            raise
        # already initialized (or single-process without coordinator info):
        # fall through to the device mesh over whatever is visible
        pass
    return make_mesh()


_COMMIT_MESH: Mesh | None = None
_COMMIT_AXIS: str = "d"


def commit_mesh():
    """The (mesh, axis_name) the prover's ``_commit`` should shard LDEs
    over, or (None, "d") outside any ``use_commit_mesh`` context."""
    return _COMMIT_MESH, _COMMIT_AXIS


@contextmanager
def use_commit_mesh(mesh: Mesh, axis_name: str = "d"):
    global _COMMIT_MESH, _COMMIT_AXIS
    prev = (_COMMIT_MESH, _COMMIT_AXIS)
    _COMMIT_MESH, _COMMIT_AXIS = mesh, axis_name
    try:
        yield
    finally:
        _COMMIT_MESH, _COMMIT_AXIS = prev
