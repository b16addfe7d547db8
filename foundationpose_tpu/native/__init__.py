"""Native (C++) host-side backends, loaded via ctypes.

Build with ``make -C foundationpose_tpu/native`` (or the build happens lazily
here on first use if a compiler is available). Every native entry point has a
pure-numpy fallback at its call site, so the package works without the
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libfp_native.so")
_lib = None


def _build():
    srcs = [os.path.join(_DIR, "cluster.cpp")]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH, *srcs,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or any(
        os.path.getmtime(os.path.join(_DIR, f)) > os.path.getmtime(_LIB_PATH)
        for f in os.listdir(_DIR)
        if f.endswith(".cpp")
    ):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fp_cluster_poses.restype = ctypes.c_int64
    lib.fp_cluster_poses.argtypes = [
        ctypes.c_double,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def cluster_poses_native(angle_diff_deg, dist_diff, poses, symmetry_tfs):
    """C++ greedy pose clustering (parity with mycpp pybind_api.cpp:24-68)."""
    lib = _load()
    poses = np.ascontiguousarray(poses, dtype=np.float64)
    sym = np.ascontiguousarray(symmetry_tfs, dtype=np.float64)
    keep = np.zeros(len(poses), dtype=np.uint8)
    lib.fp_cluster_poses(
        float(angle_diff_deg),
        float(dist_diff),
        poses.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(poses),
        sym.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(sym),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return poses[keep.astype(bool)]
