"""ctypes binding for the native FFmpeg encoder (videoenc.cpp).

Builds libvideoenc.so on first use with g++ (no pybind11 dependency).
``write_video(path, frames, fps)`` encodes a (T, H, W, 3) uint8 RGB array to
an mp4 with the built-in MPEG-4 encoder — used to synthesize the bundled demo
clips (tools/make_demo_assets.py) and to export visualizations.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "videoenc.cpp")
_SO = os.path.join(_HERE, "libvideoenc.so")
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
        lib.venc_write.restype = ctypes.c_int
        lib.venc_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def write_video(path: str, frames: np.ndarray, fps: int = 25) -> None:
    """Encode (T, H, W, 3) uint8 RGB frames to an mp4 at ``path``."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    assert frames.ndim == 4 and frames.shape[-1] == 3, frames.shape
    t, h, w, _ = frames.shape
    assert h % 2 == 0 and w % 2 == 0, "yuv420p needs even dimensions"
    lib = get_lib()
    rc = lib.venc_write(
        path.encode(), frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t, h, w, fps)
    if rc != 0:
        raise RuntimeError(f"venc_write({path}) failed with code {rc}")
