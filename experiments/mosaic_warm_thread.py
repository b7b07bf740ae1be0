"""Can a warmup THREAD pay the ~70-100s first-Mosaic-call window while
the main thread does host-side + jnp device work (circuit build stand-in)?

  python experiments/mosaic_warm_thread.py thread   # warmup thread + main jnp work
  python experiments/mosaic_warm_thread.py none     # same main work, no warmup thread
"""
import sys
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
from intmax_zkp_core_tpu.ops.poseidon_pallas import permute_pallas  # noqa: E402
from intmax_zkp_core_tpu.ops import poseidon as ps  # noqa: E402
from intmax_zkp_core_tpu.ops import ntt as nt  # noqa: E402

mode = sys.argv[1] if len(sys.argv) > 1 else "thread"
t_all = time.perf_counter()

done = {}
def warm():
    t = time.perf_counter()
    r = permute_pallas(jnp.zeros((256, 12), jnp.uint64))
    np.asarray(r[:1, :1])
    done["warm"] = time.perf_counter() - t

th = None
if mode == "thread":
    th = threading.Thread(target=warm)
    th.start()

# main-thread work: jnp program loads + host compute (circuit-build stand-in)
t = time.perf_counter()
r = ps._permute_auto_jit(jnp.zeros((1 << 14, 12), jnp.uint64))
np.asarray(r[:1, :1])
print(f"main jnp perm load: {time.perf_counter()-t:.2f}s", flush=True)
t = time.perf_counter()
r = nt.ntt(jnp.zeros((8, 1 << 12), jnp.uint64))
np.asarray(r[:1, :1])
print(f"main ntt load: {time.perf_counter()-t:.2f}s", flush=True)
t = time.perf_counter()
acc = 0
for i in range(3_000_000):
    acc = (acc * 6364136223846793005 + 1442695040888963407) % (1 << 64)
print(f"main host compute: {time.perf_counter()-t:.2f}s", flush=True)

if th is not None:
    th.join()
    print(f"warm thread window: {done['warm']:.2f}s", flush=True)

# now the 2nd Mosaic program load (should be cheap if window was absorbed)
t = time.perf_counter()
r = permute_pallas(jnp.zeros((1024, 12), jnp.uint64))
np.asarray(r[:1, :1])
print(f"next pallas load: {time.perf_counter()-t:.2f}s", flush=True)
print(f"TOTAL {mode}: {time.perf_counter()-t_all:.2f}s", flush=True)
