"""Disk-backed executable caching for the Pallas kernel entry points.

The XLA persistent compilation cache keys on the serialized computation,
and a ``pallas_call``'s lowering is NOT stable across processes (the
same kernel at the same shapes produced a different cache key in every
process — observed as triplicate ``jit_*_pallas-<hash>-cache`` entries).
Through the remote axon backend that means every fresh process pays a
full REMOTE RECOMPILE per Mosaic program (4-140 s each, size-dependent)
— the entire "Mosaic first-call cost" of docs/perf_notes.md rounds 3-4.

``engine.aot_cache.AotJit`` keys on (name, extra, arg shapes) instead
and persists the compiled executable itself, so a warm process
deserializes and loads the program directly.  This module provides the
tiny factory the ops kernels use to get a cached AotJit per static
configuration; ``extra`` always includes ``limb64.LIMB_GRAPH_VERSION``
(the AOT key does not hash the jaxpr — ADVICE round 3)."""

from __future__ import annotations

from . import limb64 as limb

_CACHE: dict = {}


def aot_kernel(name: str, make_fn, statics: tuple = ()):
    """An AotJit for ``make_fn()`` (a fresh closure over ``statics``),
    cached per (name, statics).  ``statics`` must determine the traced
    graph together with the argument shapes."""
    key = (name, statics)
    ent = _CACHE.get(key)
    if ent is None:
        from ..engine.aot_cache import AotJit

        extra = f"limb{limb.LIMB_GRAPH_VERSION}-" + "-".join(
            str(s) for s in statics
        )
        ent = AotJit(make_fn(), name, extra=extra)
        _CACHE[key] = ent
    return ent
