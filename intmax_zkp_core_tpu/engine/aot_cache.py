"""Ahead-of-time compiled-kernel cache.

JAX's persistent compilation cache only skips the XLA *compile*: every
process still pays tracing + StableHLO lowering for each kernel before it
can even look the compile up, and on this prover (dozens of wide quotient
kernels per circuit) that re-tracing dominates warm wall-clock on the
device — e.g. a fully warm zkdsa prove spent >100 s/process on it.

``AotJit`` wraps a function like ``jax.jit`` but persists the *compiled
executable* itself (``jax.experimental.serialize_executable``) keyed by
(name, static extras, flattened arg shapes/dtypes, backend, jax version).
A warm process deserializes the executable directly — no tracing, no
lowering, no compile-cache key computation.

Safety rails:

* the key's ``extra`` string must capture every closed-over static that
  the arg shapes don't already determine (e.g. the FRI blowup);
* ``AOT_FORMAT_VERSION`` is bumped whenever kernel semantics change;
* disabled on the CPU backend by default (XLA:CPU AOT artifacts are
  machine-feature-sensitive; opt in with ``INTMAX_TPU_AOT_CPU=1`` — used
  by the test suite) and entirely with ``INTMAX_TPU_AOT=0``;
* sharded (mesh) call sites are supported: a serialized executable bakes
  its device assignment, so each argument's sharding (axis spec + device
  ids) rides in the cache key — a warm mesh process with the same
  topology reloads the sharded executable, a different assignment misses
  and compiles fresh.  This is what lets multi-chip ``prove_batch`` skip
  per-process re-tracing (round-2 weak #3).

Corrupt or stale cache files fall back to a fresh trace+compile.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import re

import jax
from jax.experimental import serialize_executable as _se

AOT_FORMAT_VERSION = 1


def _enabled() -> bool:
    if os.environ.get("INTMAX_TPU_AOT") == "0":
        return False
    if jax.default_backend() == "cpu":
        return os.environ.get("INTMAX_TPU_AOT_CPU") == "1"
    return True


def cache_dir() -> str:
    return os.environ.get("INTMAX_TPU_AOT_CACHE") or os.path.expanduser(
        "~/.cache/intmax_zkp_core_tpu_aot"
    )


def _sharding_key(leaf) -> str:
    """Stable description of a leaf's sharding for the cache key: the axis
    spec plus the concrete device assignment (a serialized executable is
    only valid for the assignment it was compiled with).  Committed/numpy
    leaves without a sharding key as '' (single-device default)."""
    s = getattr(leaf, "sharding", None)
    if s is None:
        return ""
    try:
        ids = ",".join(str(d.id) for d in s._device_assignment)
    except Exception:
        try:
            ids = ",".join(str(d.id) for d in sorted(s.device_set, key=lambda d: d.id))
        except Exception:
            ids = "?"
    if getattr(s, "is_fully_replicated", False) and ids in ("0", "?"):
        return ""  # plain single-device placement == no sharding
    return f"{s}|{ids}"


class AotJit:
    """Drop-in for ``jax.jit(fn)`` with a disk-backed executable cache."""

    def __init__(self, fn, name: str, extra: str = ""):
        self._jit = jax.jit(fn)
        self._name = name
        self._extra = extra
        self._compiled: dict = {}

    def __call__(self, *args):
        if not _enabled():
            return self._jit(*args)
        leaves = jax.tree_util.tree_leaves(args)
        try:
            shapes = tuple(
                (tuple(l.shape), str(l.dtype), _sharding_key(l)) for l in leaves
            )
        except AttributeError:  # non-array leaf: let jit handle it
            return self._jit(*args)
        entry = self._compiled.get(shapes)
        if entry is None:
            entry = self._load_or_compile(shapes, args)
            self._compiled[shapes] = entry
        comp, from_disk, path = entry
        if not from_disk:
            return comp(*args)
        try:
            # dispatch errors surface asynchronously — block once to
            # validate the deserialized executable before trusting it
            # (this first blocking call is also where the device program
            # load lands; INTMAX_TPU_AOT_DEBUG=1 attributes it)
            import time as _time

            t0 = _time.perf_counter()
            out = jax.block_until_ready(comp(*args))
            if os.environ.get("INTMAX_TPU_AOT_DEBUG") == "1":
                print(
                    f"[aot] {self._name} first-call "
                    f"{_time.perf_counter()-t0:.2f}s",
                    flush=True,
                )
            self._compiled[shapes] = (comp, False, path)
            return out
        except Exception:
            # stale/incompatible on-disk executable (e.g. XLA:CPU AOT
            # artifacts): drop it and recompile fresh
            try:
                os.remove(path)
            except OSError:
                pass
            comp = self._jit.lower(*args).compile()
            self._compiled[shapes] = (comp, False, path)
            return comp(*args)

    def _load_or_compile(self, shapes, args):
        import time as _time

        t0 = _time.perf_counter()
        entry = self._load_or_compile_inner(shapes, args)
        if os.environ.get("INTMAX_TPU_AOT_DEBUG") == "1":
            how = "disk" if entry[1] else "compile"
            print(
                f"[aot] {self._name} {how} {_time.perf_counter()-t0:.2f}s",
                flush=True,
            )
        return entry

    def _load_or_compile_inner(self, shapes, args):
        key_src = repr((
            AOT_FORMAT_VERSION, self._name, self._extra, shapes,
            jax.default_backend(), jax.__version__,
        ))
        digest = hashlib.sha256(key_src.encode()).hexdigest()[:32]
        stem = re.sub(r"[^A-Za-z0-9_]+", "_", self._name)[:32]
        path = os.path.join(cache_dir(), f"{stem}-{digest}.aotx")
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                comp = _se.deserialize_and_load(payload, in_tree, out_tree)
                return (comp, True, path)  # validated on first call
            except Exception:
                pass  # corrupt/incompatible: recompile below
        comp = self._jit.lower(*args).compile()
        try:
            payload, in_tree, out_tree = _se.serialize(comp)
            os.makedirs(cache_dir(), exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f,
                            protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, path)
        except Exception:
            pass  # serialization unsupported on this backend: stay in-memory
        return (comp, False, path)
