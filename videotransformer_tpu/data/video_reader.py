"""Random-access video decode on the host CPU.

TPU-native counterpart of the reference's decord stage (dataset.py:96-119):
decode happens on host CPU threads feeding the device prefetch queue; the
device never touches codecs.

Backends:
- "native": C++ FFmpeg decoder (videotransformer_tpu/native/videodec.cpp,
  bound via ctypes) — decord-equivalent random access: seek to the nearest
  keyframe, decode forward, convert to RGB24 with swscale.
- "cv2": OpenCV VideoCapture fallback. Random access uses sequential grab()
  for small skips (the common case: sorted linspace indices) and
  CAP_PROP_POS_FRAMES seeks for large jumps.

API mirrors decord.VideoReader: len(), get_batch(indices) -> uint8 (N,H,W,C) RGB.
"""

import os
import threading

import numpy as np

_NATIVE_LIB = None
_NATIVE_TRIED = False
_native_lock = threading.Lock()


def _load_native():
    global _NATIVE_LIB, _NATIVE_TRIED
    with _native_lock:
        if _NATIVE_TRIED:
            return _NATIVE_LIB
        _NATIVE_TRIED = True
        try:
            from videotransformer_tpu.native import videodec

            _NATIVE_LIB = videodec
        except Exception:
            _NATIVE_LIB = None
        return _NATIVE_LIB


class _CV2Backend:
    def __init__(self, path, num_threads=1, short_edge=0):
        import cv2

        self._cv2 = cv2
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise IOError(f"cv2 could not open video {path}")
        self.path = path
        self.num_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.fps = float(self.cap.get(cv2.CAP_PROP_FPS)) or 25.0
        self._pos = 0
        self._short_edge = int(short_edge or 0)

    def __len__(self):
        return self.num_frames

    def _read_at(self, idx):
        cv2 = self._cv2
        if idx < self._pos or idx > self._pos + 64:
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
            self._pos = idx
        while self._pos < idx:
            self.cap.grab()
            self._pos += 1
        ok, frame = self.cap.read()
        self._pos += 1
        if not ok:
            raise IOError(f"decode failure at frame {idx} of {self.path}")
        if self._short_edge:
            h, w = frame.shape[:2]
            s = self._short_edge
            if h <= w:
                nh, nw = s, int(s * w / h)
            else:
                nw, nh = s, int(s * h / w)
            if (nh, nw) != (h, w):
                frame = self._cv2.resize(frame, (nw, nh),
                                         interpolation=self._cv2.INTER_AREA)
        return frame[:, :, ::-1]  # BGR -> RGB

    def get_batch(self, indices):
        indices = np.asarray(indices, dtype=np.int64)
        order = np.argsort(indices, kind="stable")
        frames = [None] * len(indices)
        for o in order:
            frames[o] = self._read_at(int(indices[o]))
        return np.ascontiguousarray(np.stack(frames))

    def close(self):
        self.cap.release()


class VideoReader:
    """Random-access RGB frame reader; see module docstring."""

    def __init__(self, path, backend="auto", num_threads=1, short_edge=0):
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        native = _load_native() if backend in ("auto", "native") else None
        if backend == "native" and native is None:
            raise RuntimeError("native video decoder not built")
        if native is not None:
            self._impl = native.NativeVideoReader(
                path, num_threads=num_threads, short_edge=short_edge)
            self.backend = "native"
        else:
            self._impl = _CV2Backend(
                path, num_threads=num_threads, short_edge=short_edge)
            self.backend = "cv2"

    def __len__(self):
        return len(self._impl)

    @property
    def fps(self):
        return self._impl.fps

    def get_batch(self, indices):
        return self._impl.get_batch(indices)

    def close(self):
        if hasattr(self._impl, "close"):
            self._impl.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class DecordInit:
    """API shim matching reference dataset.py:96-119."""

    def __init__(self, num_threads=1, **kwargs):
        self.num_threads = num_threads
        self.kwargs = kwargs

    def __call__(self, filename):
        return VideoReader(filename, num_threads=self.num_threads)

    def __repr__(self):
        return f"{self.__class__.__name__}(num_threads={self.num_threads})"
