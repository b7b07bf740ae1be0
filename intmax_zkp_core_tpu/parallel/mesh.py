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
