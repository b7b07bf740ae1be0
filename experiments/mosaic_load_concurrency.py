"""Measure whether the per-process first-call cost of Mosaic/Pallas
programs through the axon backend is serialized (must be paid per
program) or overlappable (issue all loads up front, pay ~one window).

Run on the TPU, twice: the first process pays remote compiles (warms the
persistent compile cache); the second process measures pure program-load.

  python experiments/mosaic_load_concurrency.py seq      # load programs one by one
  python experiments/mosaic_load_concurrency.py async    # dispatch all, then drain
  python experiments/mosaic_load_concurrency.py threads  # 4 loader threads

Also prints the load time of a medium jnp (non-Mosaic) program for
calibration.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.perf_counter()
print("backend:", jax.default_backend(), "devices:", jax.devices(),
      f"({time.perf_counter()-t0:.1f}s)", flush=True)

from intmax_zkp_core_tpu.ops.poseidon_pallas import permute_pallas  # noqa: E402
from intmax_zkp_core_tpu.ops import poseidon as ps  # noqa: E402

BUCKETS = [256, 1024, 4096, 16384]
states = {b: jnp.zeros((b, 12), jnp.uint64) for b in BUCKETS}

mode = sys.argv[1] if len(sys.argv) > 1 else "seq"
t_all = time.perf_counter()
if mode == "seq":
    for b in BUCKETS:
        t = time.perf_counter()
        r = permute_pallas(states[b])
        np.asarray(r[:1, :1])
        print(f"seq pallas b={b}: {time.perf_counter()-t:.2f}s", flush=True)
elif mode == "async":
    rs = [permute_pallas(states[b]) for b in BUCKETS]
    print(f"dispatch all: {time.perf_counter()-t_all:.2f}s", flush=True)
    for b, r in zip(BUCKETS, rs):
        np.asarray(r[:1, :1])
        print(f"drained b={b}: {time.perf_counter()-t_all:.2f}s", flush=True)
elif mode == "threads":
    import concurrent.futures as cf

    def load(b):
        t = time.perf_counter()
        r = permute_pallas(states[b])
        np.asarray(r[:1, :1])
        return b, time.perf_counter() - t

    with cf.ThreadPoolExecutor(4) as ex:
        for b, dt in ex.map(load, BUCKETS):
            print(f"thr pallas b={b}: {dt:.2f}s", flush=True)
print(f"TOTAL {mode}: {time.perf_counter()-t_all:.2f}s", flush=True)

# calibration: one jnp u64 program (x64-rewriter graph, no Mosaic)
t = time.perf_counter()
r = ps._permute_auto_jit(jnp.zeros((1 << 15, 12), jnp.uint64))
np.asarray(r[:1, :1])
print(f"jnp permute 2^15 first call: {time.perf_counter()-t:.2f}s", flush=True)
