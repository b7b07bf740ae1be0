"""AOT executable cache (engine/aot_cache.py): disk round-trip, key
separation, and the call-time fallback when an on-disk executable is stale
or corrupt."""

import numpy as np
import jax.numpy as jnp
import pytest

from intmax_zkp_core_tpu.engine import aot_cache
from intmax_zkp_core_tpu.engine.aot_cache import AotJit
from intmax_zkp_core_tpu.ops import goldilocks as gl


@pytest.fixture
def aot_env(tmp_path, monkeypatch):
    monkeypatch.setenv("INTMAX_TPU_AOT_CPU", "1")
    monkeypatch.setenv("INTMAX_TPU_AOT_CACHE", str(tmp_path))
    return tmp_path


def _fn(x, y):
    return gl.mul(gl.add(x, y), x)


def test_aot_roundtrip_and_disk_reuse(aot_env):
    x = np.arange(64, dtype=np.uint64)
    y = np.ones(64, dtype=np.uint64)
    a = AotJit(_fn, "t_roundtrip")
    out1 = np.asarray(a(x, y))
    files = list(aot_env.glob("*.aotx"))
    assert len(files) == 1, "executable must be persisted"

    # a fresh instance (fresh-process stand-in) must load from disk
    b = AotJit(_fn, "t_roundtrip")
    out2 = np.asarray(b(x, y))
    assert (out1 == out2).all()
    expected = (x.astype(object) + y) % gl.P_INT * x % gl.P_INT
    assert (out1 == expected.astype(np.uint64)).all()


def test_aot_key_includes_extra_and_shapes(aot_env):
    x = np.arange(64, dtype=np.uint64)
    y = np.ones(64, dtype=np.uint64)
    AotJit(_fn, "t_key", extra="a")(x, y)
    AotJit(_fn, "t_key", extra="b")(x, y)
    AotJit(_fn, "t_key", extra="a")(x[:32], y[:32])
    assert len(list(aot_env.glob("*.aotx"))) == 3


def test_aot_corrupt_file_falls_back(aot_env):
    x = np.arange(64, dtype=np.uint64)
    y = np.ones(64, dtype=np.uint64)
    a = AotJit(_fn, "t_corrupt")
    ref = np.asarray(a(x, y))
    (path,) = list(aot_env.glob("*.aotx"))
    path.write_bytes(b"garbage")
    b = AotJit(_fn, "t_corrupt")
    out = np.asarray(b(x, y))
    assert (out == ref).all()


def test_aot_sharded_entries(aot_env):
    """Mesh-sharded calls get their own cache entries (keyed by sharding +
    device assignment) and a fresh instance reloads the SHARDED executable
    from disk without re-tracing — the multi-chip warm-start path."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as PSpec

    from intmax_zkp_core_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    x = jnp.arange(64, dtype=jnp.uint64)
    y = jnp.ones(64, dtype=jnp.uint64)
    xs = jax.device_put(x, NamedSharding(mesh, PSpec("d")))
    ys = jax.device_put(y, NamedSharding(mesh, PSpec("d")))

    a = AotJit(_fn, "t_sharded")
    plain = np.asarray(a(x, y))
    sharded = np.asarray(a(xs, ys))
    assert (plain == sharded).all()
    files = list(aot_env.glob("*.aotx"))
    assert len(files) == 2, "sharded call must get its own entry"

    # fresh instance: the sharded entry must come FROM DISK (no trace)
    b = AotJit(_fn, "t_sharded")
    shapes = tuple(
        (tuple(l.shape), str(l.dtype), aot_cache._sharding_key(l))
        for l in (xs, ys)
    )
    comp, from_disk, _ = b._load_or_compile_inner(shapes, (xs, ys))
    assert from_disk, "sharded executable was not reloaded from disk"
    out = np.asarray(jax.block_until_ready(comp(xs, ys)))
    assert (out == plain).all()


def test_aot_disabled_paths(tmp_path, monkeypatch):
    # CPU backend without the opt-in: nothing written
    monkeypatch.delenv("INTMAX_TPU_AOT_CPU", raising=False)
    monkeypatch.setenv("INTMAX_TPU_AOT_CACHE", str(tmp_path))
    x = np.arange(8, dtype=np.uint64)
    out = np.asarray(AotJit(_fn, "t_disabled")(x, x))
    assert not list(tmp_path.glob("*.aotx"))
    # INTMAX_TPU_AOT=0 overrides everything
    monkeypatch.setenv("INTMAX_TPU_AOT_CPU", "1")
    monkeypatch.setenv("INTMAX_TPU_AOT", "0")
    np.asarray(AotJit(_fn, "t_disabled2")(x, x))
    assert not list(tmp_path.glob("*.aotx"))
