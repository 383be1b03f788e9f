"""ctypes binding for the native FFmpeg decoder (videodec.cpp).

Builds libvideodec.so on first import with g++ (no pybind11 dependency) and
exposes ``NativeVideoReader`` with the decord-style get_batch API used by
``videotransformer_tpu.data.video_reader``.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "videodec.cpp")
_SO = os.path.join(_HERE, "libvideodec.so")
_build_lock = threading.Lock()
_lib = None


def _build():
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", _SRC,
        "-lavformat", "-lavcodec", "-lavutil", "-lswscale",
        "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.vd_open.restype = ctypes.c_void_p
        lib.vd_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.vd_num_frames.restype = ctypes.c_int64
        lib.vd_num_frames.argtypes = [ctypes.c_void_p]
        lib.vd_fps.restype = ctypes.c_double
        lib.vd_fps.argtypes = [ctypes.c_void_p]
        lib.vd_width.restype = ctypes.c_int
        lib.vd_width.argtypes = [ctypes.c_void_p]
        lib.vd_height.restype = ctypes.c_int
        lib.vd_height.argtypes = [ctypes.c_void_p]
        lib.vd_error.restype = ctypes.c_char_p
        lib.vd_error.argtypes = [ctypes.c_void_p]
        lib.vd_get_batch.restype = ctypes.c_int
        lib.vd_get_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.vd_close.restype = None
        lib.vd_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeVideoReader:
    def __init__(self, path, num_threads=1, short_edge=0):
        self._lib = get_lib()
        self._h = self._lib.vd_open(path.encode(), int(num_threads),
                                    int(short_edge or 0))
        if not self._h:
            raise IOError(f"native decoder could not open {path}")
        self.path = path
        self.num_frames = int(self._lib.vd_num_frames(self._h))
        self.fps = float(self._lib.vd_fps(self._h))
        self.width = int(self._lib.vd_width(self._h))
        self.height = int(self._lib.vd_height(self._h))

    def __len__(self):
        return self.num_frames

    def get_batch(self, indices):
        indices = np.asarray(indices, dtype=np.int64)
        order = np.argsort(indices, kind="stable")
        sorted_idx = np.ascontiguousarray(indices[order])
        n = len(indices)
        out = np.empty((n, self.height, self.width, 3), dtype=np.uint8)
        ret = self._lib.vd_get_batch(
            self._h,
            sorted_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if ret != 0:
            err = self._lib.vd_error(self._h).decode()
            raise IOError(f"native decode failed ({ret}): {err} [{self.path}]")
        # restore request order
        inv = np.empty_like(order)
        inv[order] = np.arange(n)
        return np.ascontiguousarray(out[inv])

    def close(self):
        if self._h:
            self._lib.vd_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
