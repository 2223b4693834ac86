"""ctypes bindings for the native host data-path library (native/usip_native.cpp).

Auto-builds the .so with make/g++ on first use (no pybind11 / wheel machinery —
mirrors the reference's build-on-install CUDAExtension setup.py in spirit,
models/index_max_ext/setup.py:16-18). Every entry point has a numpy fallback, so
the framework runs without a compiler; the native path is the fast default for the
host-side loader work."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

# repo checkout layout: <root>/native next to the package; installed copies
# can point USIP_NATIVE_DIR at a checkout of native/ (otherwise every caller
# falls back to the pure-python path)
_NATIVE_DIR = os.environ.get("USIP_NATIVE_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libusip_native.so")

_lib = None
_load_failed = False


def build(force: bool = False) -> bool:
    """Build the shared library with make. Returns True on success.

    make's own mtime check makes this a ~30 ms no-op when the .so is current,
    and transparently rebuilds when usip_native.cpp is newer (a stale .so
    would miss newly added symbols)."""
    if os.path.exists(_SO_PATH) and not force:
        src = os.path.join(_NATIVE_DIR, "usip_native.cpp")
        try:
            if os.path.getmtime(_SO_PATH) >= os.path.getmtime(src):
                return True
        except OSError:
            return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"] +
                       (["-B"] if force else []), check=True,
                       capture_output=True)
        return os.path.exists(_SO_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_SO_PATH) and not build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        _load_failed = True
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.usip_subsample.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_uint64, f32p]
    lib.usip_fps.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                             ctypes.c_uint64, f32p, i64p]
    lib.usip_nms.argtypes = [f32p, f32p, ctypes.c_int64, ctypes.c_float,
                             f32p, f32p]
    lib.usip_nms.restype = ctypes.c_int64
    lib.usip_npy_probe.argtypes = [ctypes.c_char_p, i64p, i64p]
    lib.usip_npy_probe.restype = ctypes.c_int
    lib.usip_npy_read_f32.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int64]
    lib.usip_npy_read_f32.restype = ctypes.c_int
    lib.usip_batch_load_subsample.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_uint64, ctypes.c_int, f32p, f32p]
    lib.usip_batch_load_subsample.restype = ctypes.c_int
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.usip_batch_load_subsample_f16.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_uint64, ctypes.c_int, u16p, u16p]
    lib.usip_batch_load_subsample_f16.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def subsample(data: np.ndarray, target: int, seed: int = 0) -> np.ndarray:
    """Native fixed-size random subsample (pad-by-repetition when short)."""
    lib = _get_lib()
    data = np.ascontiguousarray(data, np.float32)
    n, c = data.shape
    if lib is None:
        from usip_tpu.data.common import subsample_fixed
        return subsample_fixed(np.random.default_rng(seed), data, target)
    out = np.empty((target, c), np.float32)
    lib.usip_subsample(_fptr(data), n, c, target, seed, _fptr(out))
    return out


def fps(points: np.ndarray, k: int, seed: int = 0
        ) -> Tuple[np.ndarray, np.ndarray]:
    """Native farthest point sampling -> (samples (k,3), indices (k,))."""
    lib = _get_lib()
    points = np.ascontiguousarray(points[:, :3], np.float32)
    n = points.shape[0]
    if lib is None:
        rng = np.random.default_rng(seed)
        first = int(rng.integers(0, n))
        idxs = [first]
        d = ((points - points[first]) ** 2).sum(1)
        for _ in range(1, k):
            far = int(np.argmax(d))
            idxs.append(far)
            d = np.minimum(d, ((points - points[far]) ** 2).sum(1))
        return points[idxs], np.asarray(idxs, np.int64)
    out = np.empty((k, 3), np.float32)
    idx = np.empty((k,), np.int64)
    lib.usip_fps(_fptr(points), n, k, seed, _fptr(out),
                 idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out, idx


def nms(keypoints: np.ndarray, sigmas: np.ndarray, radius: float
        ) -> Tuple[np.ndarray, np.ndarray]:
    """Native greedy sigma-ascending NMS; falls back to eval.export.nms."""
    lib = _get_lib()
    if radius < 0.01:
        return keypoints, sigmas
    if lib is None:
        from usip_tpu.eval.export import nms as py_nms
        return py_nms(keypoints, sigmas, radius)
    kp = np.ascontiguousarray(keypoints, np.float32)
    sg = np.ascontiguousarray(sigmas, np.float32)
    m = kp.shape[0]
    out_kp = np.empty_like(kp)
    out_sig = np.empty_like(sg)
    kept = lib.usip_nms(_fptr(kp), _fptr(sg), m, radius, _fptr(out_kp),
                        _fptr(out_sig))
    return out_kp[:kept], out_sig[:kept]


def read_npy(path: str) -> np.ndarray:
    """Native .npy reader (f4/f8 2-D C-order)."""
    lib = _get_lib()
    if lib is None:
        return np.load(path).astype(np.float32)
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.usip_npy_probe(path.encode(), ctypes.byref(rows),
                            ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"usip_npy_probe({path}) failed: {rc}")
    out = np.empty((rows.value, cols.value), np.float32)
    rc = lib.usip_npy_read_f32(path.encode(), _fptr(out), out.size)
    if rc != 0:
        raise IOError(f"usip_npy_read_f32({path}) failed: {rc}")
    return out


def batch_load_subsample(paths, target: int, sn_len: int, seed: int = 0,
                         threads: int = 0, dtype=np.float32
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Thread-pooled load+subsample+split of a batch of .npy clouds.

    Returns (pc (B, target, 3), sn (B, target, sn_len)).

    ``dtype=np.float16`` encodes the fp16 wire in the C++ thread pool
    (F16C round-to-nearest-even, identical to numpy ``astype(float16)``) so
    the Python prefetch thread does no conversion pass at all.
    """
    lib = _get_lib()
    b = len(paths)
    dtype = np.dtype(dtype)
    if dtype not in (np.float32, np.float16):
        raise ValueError(f"batch_load_subsample: dtype must be float32 or "
                         f"float16, got {dtype}")
    if lib is None:
        from usip_tpu.data.common import split_pc_sn, subsample_fixed
        rng = np.random.default_rng(seed)
        pcs, sns = [], []
        for p in paths:
            data = subsample_fixed(rng, np.load(p), target)
            pc, sn = split_pc_sn(data, sn_len)
            pcs.append(pc)
            sns.append(sn)
        return (np.stack(pcs).astype(dtype, copy=False),
                np.stack(sns).astype(dtype, copy=False))
    out_pc = np.empty((b, target, 3), dtype)
    out_sn = np.empty((b, target, max(sn_len, 1)), dtype)
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    if dtype == np.float16:
        u16p = ctypes.POINTER(ctypes.c_uint16)
        rc = lib.usip_batch_load_subsample_f16(
            arr, b, target, sn_len, seed, threads,
            out_pc.ctypes.data_as(u16p), out_sn.ctypes.data_as(u16p))
    else:
        rc = lib.usip_batch_load_subsample(arr, b, target, sn_len, seed,
                                           threads, _fptr(out_pc),
                                           _fptr(out_sn))
    if rc != 0:
        detail = {10: "npy probe failed", 11: "npy read failed",
                  12: f"cloud has fewer than {3 + sn_len} columns "
                      f"(need 3 coords + {sn_len} normals)"}.get(rc, "")
        raise IOError(f"usip_batch_load_subsample failed: {rc} {detail}")
    return out_pc, out_sn[:, :, :sn_len]
