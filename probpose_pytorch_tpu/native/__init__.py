"""ctypes bindings for the native ingestion pre-stage (dataplane.cpp).

The reference's data path runs JPEG decode + crop + resize in Python
DataLoader workers (reference dataset.py:71-90,116-135); this module is the
TPU framework's native-equivalent: a C++ thread pool (libjpeg decode +
bilinear crop-resize matching ops/preprocess.py's sampling convention)
feeding the packed crop cache on first-epoch ingestion.

The shared library builds on demand with g++ (`make native` pre-builds it);
everything degrades gracefully to the PIL path when no toolchain is present
— `native_available()` gates all call sites and tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

__all__ = [
    "native_available",
    "crop_resize_batch",
    "decode_crop_resize_batch",
    "jpeg_size",
]

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "_dataplane.so"
_lib = None
_build_error: str | None = None


def _build() -> bool:
    global _build_error
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        str(_DIR / "dataplane.cpp"), "-o", str(_SO), "-ljpeg",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        _build_error = str(e)
        return False
    if proc.returncode != 0:
        _build_error = proc.stderr[-2000:]
        return False
    return True


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("PROBPOSE_NO_NATIVE"):
        return None
    src = _DIR / "dataplane.cpp"
    if not _SO.exists() or (
        src.exists() and src.stat().st_mtime > _SO.stat().st_mtime
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError as e:
        global _build_error
        _build_error = str(e)
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.crop_resize_batch_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.crop_resize_batch_u8.restype = ctypes.c_int
    lib.decode_crop_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_ulong), ctypes.c_int,
        f32p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.decode_crop_resize_batch.restype = ctypes.c_int
    lib.jpeg_size.argtypes = [
        u8p, ctypes.c_ulong,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.jpeg_size.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    """True when the C++ data plane is built and loadable on this host."""
    return _load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def crop_resize_batch(
    frames: np.ndarray, boxes: np.ndarray, out_size: tuple[int, int],
    n_threads: int = 0,
) -> np.ndarray:
    """(n, Hs, Ws, 3) uint8 frames + (n, 4) xywh boxes -> (n, H, W, 3) crops.

    Sampling convention identical to ops/preprocess.py crop_resize
    'bilinear_gather' (verified in tests/test_native.py), so host-made and
    device-made crops agree to rounding.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native data plane unavailable: {_build_error}")
    frames = np.ascontiguousarray(frames, np.uint8)
    boxes = np.ascontiguousarray(boxes, np.float32)
    n, hs, ws, c = frames.shape
    assert c == 3 and boxes.shape == (n, 4)
    H, W = out_size
    out = np.empty((n, H, W, 3), np.uint8)
    lib.crop_resize_batch_u8(
        _u8ptr(frames), n, hs, ws,
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _u8ptr(out), H, W, n_threads,
    )
    return out


def decode_crop_resize_batch(
    jpegs: list[bytes], boxes: np.ndarray, out_size: tuple[int, int],
    n_threads: int = 0,
) -> tuple[np.ndarray, int]:
    """Decode n JPEG buffers and crop-resize each in one threaded native
    pass. Returns (crops (n, H, W, 3) uint8, n_failed) — failed decodes
    yield zero crops."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native data plane unavailable: {_build_error}")
    n = len(jpegs)
    boxes = np.ascontiguousarray(boxes, np.float32)
    assert boxes.shape == (n, 4)
    H, W = out_size
    out = np.empty((n, H, W, 3), np.uint8)
    # keep buffer objects alive for the duration of the call
    bufs = [np.frombuffer(b, np.uint8) for b in jpegs]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(*[_u8ptr(b) for b in bufs])
    sizes = (ctypes.c_ulong * n)(*[len(b) for b in jpegs])
    failed = lib.decode_crop_resize_batch(
        ptrs, sizes, n,
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _u8ptr(out), H, W, n_threads,
    )
    return out, int(failed)


def jpeg_size(buf: bytes) -> tuple[int, int] | None:
    """(height, width) from a JPEG header via the native decoder, or None."""
    lib = _load()
    if lib is None:
        return None
    arr = np.frombuffer(buf, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.jpeg_size(_u8ptr(arr), len(buf), ctypes.byref(h), ctypes.byref(w)):
        return None
    return h.value, w.value
