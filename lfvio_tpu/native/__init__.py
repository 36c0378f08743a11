"""ctypes bindings for the native C++ IO runtime (io_runtime.cpp).

Builds the shared library on first use (g++ is baked into the image); all
functionality has pure-Python equivalents in runtime/pipeline.py, so the
native path is an optimization, not a dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "io_runtime.cpp")
_SO = os.path.join(_DIR, "libioruntime.so")

_lib = None


def build(force: bool = False) -> str:
    """Compile the shared library if needed; returns its path."""
    if force or not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        subprocess.run(
            [
                "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                "-o", _SO, _SRC,
            ],
            check=True,
        )
    return _SO


def load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build())
    lib.vio_sync_create.restype = ctypes.c_void_p
    lib.vio_sync_create.argtypes = [ctypes.c_double, ctypes.c_int, ctypes.c_int]
    lib.vio_sync_destroy.argtypes = [ctypes.c_void_p]
    lib.vio_sync_push_imu.restype = ctypes.c_int
    lib.vio_sync_push_imu.argtypes = [
        ctypes.c_void_p, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.vio_sync_push_frame.restype = ctypes.c_int
    lib.vio_sync_push_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vio_sync_pop.restype = ctypes.c_int64
    lib.vio_sync_pop.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.vio_sync_imu_count.restype = ctypes.c_int64
    lib.vio_sync_imu_count.argtypes = [ctypes.c_void_p]
    lib.vio_sync_frame_count.restype = ctypes.c_int64
    lib.vio_sync_frame_count.argtypes = [ctypes.c_void_p]
    lib.vio_tum_open.restype = ctypes.c_void_p
    lib.vio_tum_open.argtypes = [ctypes.c_char_p]
    lib.vio_tum_write.restype = ctypes.c_int
    lib.vio_tum_write.argtypes = [
        ctypes.c_void_p, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.vio_tum_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeSynchronizer:
    """Measurement synchronizer backed by the C++ SPSC rings."""

    def __init__(self, td: float = 0.0, imu_capacity: int = 4096,
                 frame_capacity: int = 256, max_samples: int = 512):
        import numpy as np

        self._lib = load()
        self._h = self._lib.vio_sync_create(td, imu_capacity, frame_capacity)
        if not self._h:
            raise MemoryError("vio_sync_create failed")
        self._max_n = max_samples
        self._dt = np.zeros(max_samples)
        self._acc = np.zeros((max_samples, 3))
        self._gyr = np.zeros((max_samples, 3))
        self._np = np

    def push_imu(self, t, acc, gyr):
        np = self._np
        acc = np.ascontiguousarray(acc, np.float64)
        gyr = np.ascontiguousarray(gyr, np.float64)
        r = self._lib.vio_sync_push_imu(
            self._h, float(t),
            acc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            gyr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if r != 0:
            raise BufferError("IMU ring full")

    def push_frame(self, t, frame_id):
        restart = ctypes.c_int(0)
        r = self._lib.vio_sync_push_frame(
            self._h, float(t), int(frame_id), ctypes.byref(restart)
        )
        if r != 0:
            raise BufferError("frame ring full")
        return bool(restart.value)

    def pop(self):
        """Returns (frame_t, frame_id, dts, accs, gyrs) or None if no frame
        is ready (needs more IMU)."""
        ft = ctypes.c_double(0)
        fid = ctypes.c_int64(0)
        n = self._lib.vio_sync_pop(
            self._h,
            self._dt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self._acc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self._gyr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self._max_n, ctypes.byref(ft), ctypes.byref(fid),
        )
        if n < 0:
            return None
        n = int(n)
        return (
            ft.value, fid.value,
            self._dt[:n].copy(), self._acc[:n].copy(), self._gyr[:n].copy(),
        )

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.vio_sync_destroy(self._h)
        except Exception:
            pass


class NativeTumWriter:
    def __init__(self, path: str):
        import numpy as np

        self._lib = load()
        self._np = np
        self._h = self._lib.vio_tum_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open {path}")

    def write(self, t, p, q_wxyz):
        np = self._np
        p = np.ascontiguousarray(p, np.float64)
        q = np.ascontiguousarray(q_wxyz, np.float64)
        self._lib.vio_tum_write(
            self._h, float(t),
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )

    def close(self):
        if self._h:
            self._lib.vio_tum_close(self._h)
            self._h = None
