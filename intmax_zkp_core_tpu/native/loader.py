"""Build + load the native Poseidon accelerator.

Compilation happens once per machine into a cache directory; the shared
object is initialized with the round constants / MDS matrix from the single
Python source of truth.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "poseidon_native.cpp")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build_and_load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            src = open(_SRC, "rb").read()
            tag = hashlib.sha256(src).hexdigest()[:16]
            cache_dir = os.environ.get(
                "INTMAX_TPU_NATIVE_CACHE",
                os.path.expanduser("~/.cache/intmax_zkp_core_tpu_native"),
            )
            os.makedirs(cache_dir, exist_ok=True)
            so_path = os.path.join(cache_dir, f"poseidon_{tag}.so")
            if not os.path.exists(so_path):
                tmp = so_path + f".tmp{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", tmp],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, so_path)
            lib = ctypes.CDLL(so_path)
            lib.poseidon_init.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64),
            ]
            lib.poseidon_permute_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_int64,
            ]
            lib.poseidon_hash_no_pad.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint64),
            ]
            from ..ops.poseidon import _MDS
            from ..ops.poseidon_constants import ALL_ROUND_CONSTANTS

            rc = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64)
            mds = np.ascontiguousarray(_MDS, dtype=np.uint64).reshape(-1)
            lib.poseidon_init(
                rc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                mds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            )
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
    return _lib


def native_available() -> bool:
    return _build_and_load() is not None


_SRC_WITNESS = os.path.join(_HERE, "witness_native.cpp")
_wlib = None
_wbuild_failed = False


def witness_lib():
    """Build + load the native witness-generation engine (or None).

    Initialized with the Poseidon round constants, the dense MDS matrix and
    the fast-partial affine tables from the Python source of truth, so the
    C++ PoseidonGate fill is definitionally the same computation."""
    global _wlib, _wbuild_failed
    if _wlib is not None or _wbuild_failed:
        return _wlib
    with _lock:
        if _wlib is not None or _wbuild_failed:
            return _wlib
        try:
            src = open(_SRC_WITNESS, "rb").read()
            tag = hashlib.sha256(src).hexdigest()[:16]
            cache_dir = os.environ.get(
                "INTMAX_TPU_NATIVE_CACHE",
                os.path.expanduser("~/.cache/intmax_zkp_core_tpu_native"),
            )
            os.makedirs(cache_dir, exist_ok=True)
            so_path = os.path.join(cache_dir, f"witness_{tag}.so")
            if not os.path.exists(so_path):
                tmp = so_path + f".tmp{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     _SRC_WITNESS, "-o", tmp],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, so_path)
            lib = ctypes.CDLL(so_path)
            u64p = ctypes.POINTER(ctypes.c_uint64)
            i64p = ctypes.POINTER(ctypes.c_int64)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.witness_init.argtypes = [u64p, u64p, u64p, u64p]
            lib.witness_run.argtypes = [
                ctypes.c_int64, i64p, u64p, u8p,
                u64p, ctypes.c_int64, i64p,
                u8p,
                i64p, i64p, u64p,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ]
            lib.witness_run.restype = ctypes.c_int64

            from ..engine.gates import PARTIAL_A, PARTIAL_B
            from ..ops.poseidon import _MDS
            from ..ops.poseidon_constants import ALL_ROUND_CONSTANTS

            rc = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64)
            mds = np.ascontiguousarray(_MDS, dtype=np.uint64).reshape(-1)
            pa = np.ascontiguousarray(
                np.array(PARTIAL_A, dtype=np.uint64)
            ).reshape(-1)
            pb = np.ascontiguousarray(
                np.array(PARTIAL_B, dtype=np.uint64)
            ).reshape(-1)
            assert pa.shape == (22 * 35,) and pb.shape == (12 * 35,)
            lib.witness_init(
                rc.ctypes.data_as(u64p), mds.ctypes.data_as(u64p),
                pa.ctypes.data_as(u64p), pb.ctypes.data_as(u64p),
            )
            _wlib = lib
        except Exception:
            _wbuild_failed = True
            _wlib = None
    return _wlib


def native_permute_batch(states: np.ndarray) -> np.ndarray | None:
    """[n, 12] uint64 -> permuted copy, or None if unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    buf = np.ascontiguousarray(states, dtype=np.uint64).copy()
    lib.poseidon_permute_batch(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), buf.shape[0]
    )
    return buf


def native_hash_no_pad(inputs) -> tuple | None:
    """list/array of u64 -> 4-limb digest tuple, or None if unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(np.array(inputs, dtype=np.uint64))
    out = np.zeros(4, dtype=np.uint64)
    lib.poseidon_hash_no_pad(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        arr.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return tuple(int(x) for x in out)
