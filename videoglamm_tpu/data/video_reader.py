"""Video frame loading: native FFmpeg C++ library with a PIL frame-directory
fallback.

The reference loads videos through decord's C++ decoder
(/root/reference/VideoGLaMM/chat.py:15,80). Here the native path is
native/frameloader.cpp (libavformat/avcodec/swscale), built on first use and
bound via ctypes; frame directories (DAVIS/MeViS/YTVOS-style JPEG folders)
load through PIL.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvglframes.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "frameloader.cpp")

_lib = None


def _build_native() -> str:
    cmd = ["g++", "-O2", "-shared", "-fPIC", _SRC_PATH, "-o", _LIB_PATH,
           "-lavformat", "-lavcodec", "-lavutil", "-lswscale"]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def get_native_lib():
    """Load (building if needed) the native frame loader; raises on
    unavailability."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)):
        _build_native()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vgl_open.restype = ctypes.c_void_p
    lib.vgl_open.argtypes = [ctypes.c_char_p]
    lib.vgl_close.argtypes = [ctypes.c_void_p]
    lib.vgl_num_frames.restype = ctypes.c_long
    lib.vgl_num_frames.argtypes = [ctypes.c_void_p]
    lib.vgl_fps.restype = ctypes.c_double
    lib.vgl_fps.argtypes = [ctypes.c_void_p]
    lib.vgl_width.restype = ctypes.c_int
    lib.vgl_width.argtypes = [ctypes.c_void_p]
    lib.vgl_height.restype = ctypes.c_int
    lib.vgl_height.argtypes = [ctypes.c_void_p]
    lib.vgl_read_frames.restype = ctypes.c_int
    lib.vgl_read_frames.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
    lib.vgl_write_test_video.restype = ctypes.c_int
    lib.vgl_write_test_video.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    _lib = lib
    return lib


class VideoReader:
    """decord.VideoReader-equivalent over the native loader."""

    def __init__(self, path: str):
        self._lib = get_native_lib()
        self._h = self._lib.vgl_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open video: {path}")

    def __len__(self) -> int:
        return int(self._lib.vgl_num_frames(self._h))

    @property
    def fps(self) -> float:
        return float(self._lib.vgl_fps(self._h))

    @property
    def size(self):
        return (self._lib.vgl_width(self._h), self._lib.vgl_height(self._h))

    def get_batch(self, indices: Sequence[int],
                  out_size: Optional[tuple] = None) -> np.ndarray:
        """Decode frames at ascending `indices` -> [n, H, W, 3] uint8 RGB."""
        idx = np.asarray(sorted(indices), np.int64)
        w, h = out_size or self.size
        out = np.empty((len(idx), h, w, 3), np.uint8)
        n = self._lib.vgl_read_frames(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            len(idx), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w, h)
        if n != len(idx):
            raise IOError(f"decoded {n}/{len(idx)} frames")
        return out

    def close(self):
        if self._h:
            self._lib.vgl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_test_video(path: str, w: int = 64, h: int = 48, n_frames: int = 25,
                     fps: int = 5):
    rc = get_native_lib().vgl_write_test_video(path.encode(), w, h, n_frames,
                                               fps)
    if rc != 0:
        raise IOError(f"test video write failed: {rc}")


IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def load_frame_dir(path: str, indices: Optional[Sequence[int]] = None
                   ) -> List["np.ndarray"]:
    """Frame-directory loader (DAVIS/MeViS/YTVOS layout): sorted image files
    -> list of RGB uint8 arrays."""
    from PIL import Image
    files = sorted(f for f in os.listdir(path)
                   if f.lower().endswith(IMG_EXTS))
    if indices is not None:
        files = [files[i] for i in indices]
    return [np.asarray(Image.open(os.path.join(path, f)).convert("RGB"))
            for f in files]


def load_video_frames(path: str, num_frames: int, fps_sample: float = 1.0,
                      max_frames: int = 64) -> List[np.ndarray]:
    """Reference chat.py:382-399 loading policy: sample at ~1 fps capped at
    `max_frames` decoded frames, then linspace-subsample to `num_frames`.
    Accepts a video file (native decoder) or a frame directory."""
    from .preprocess import sample_frame_indices

    if os.path.isdir(path):
        frames = load_frame_dir(path)
        total = len(frames)
        idx = sample_frame_indices(total, num_frames)
        return [frames[i] for i in idx]

    vr = VideoReader(path)
    total = len(vr)
    fps = vr.fps or 25.0
    stride = max(int(round(fps / fps_sample)), 1)
    decode_idx = list(range(0, total, stride))[:max_frames]
    if not decode_idx:
        decode_idx = [0]
    frames = vr.get_batch(decode_idx)
    vr.close()
    sub = sample_frame_indices(len(frames), num_frames)
    return [frames[i] for i in sub]
