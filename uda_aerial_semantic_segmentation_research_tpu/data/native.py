"""ctypes bindings for the native C++ loader core (native/loader.cpp).

Builds ``libuda_loader.so`` with g++ on first use (cached next to the
source; rebuilt when the source changes) and exposes:

- ``decode_jpeg_rgb(path, h, w)``    -> uint8 (h, w, 3), DCT-scaled decode
- ``decode_png_mask(path, h, w)``    -> int32 (h, w), nearest resize
- ``batch_decode_jpeg(paths, h, w)`` -> uint8 (n, h, w, 3), thread pool,
                                        zero-copy into the batch buffer
- ``batch_decode_png(paths, h, w)``  -> int32 (n, h, w)
- ``mask_class_histogram(path, C)``  -> int64 (C,), native-resolution scan

Everything degrades gracefully: ``available()`` is False when the
toolchain or libjpeg/libpng are missing, and callers fall back to cv2.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "loader.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(src: Path) -> Optional[Path]:
    tag = hashlib.sha1(src.read_bytes()).hexdigest()[:12]
    out = src.parent / f"libuda_loader_{tag}.so"
    if out.exists():
        return out
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", str(src),
           "-o", str(out), "-ljpeg", "-lpng", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError, OSError) as e:
        detail = getattr(e, "stderr", b"")
        print(f"native loader build failed ({e}); falling back to cv2. "
              f"{detail[:400] if detail else ''}")
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("UDA_TPU_NO_NATIVE"):
        return None
    if not _SRC.exists():
        return None
    path = _build(_SRC)
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError as e:
        print(f"native loader dlopen failed: {e}")
        return None

    lib.uda_decode_jpeg_rgb.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                        ctypes.c_int, ctypes.c_int]
    lib.uda_decode_jpeg_rgb.restype = ctypes.c_int
    lib.uda_decode_png_mask.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                        ctypes.c_int, ctypes.c_int]
    lib.uda_decode_png_mask.restype = ctypes.c_int
    lib.uda_batch_decode_jpeg.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                          ctypes.c_void_p, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_int]
    lib.uda_batch_decode_jpeg.restype = ctypes.c_int
    lib.uda_batch_decode_png.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                         ctypes.c_void_p, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int]
    lib.uda_batch_decode_png.restype = ctypes.c_int
    lib.uda_mask_class_histogram.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                             ctypes.c_int]
    lib.uda_mask_class_histogram.restype = ctypes.c_longlong
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _threads() -> int:
    return max(os.cpu_count() or 1, 1)


def decode_jpeg_rgb(path: str, h: int, w: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty((h, w, 3), dtype=np.uint8)
    rc = lib.uda_decode_jpeg_rgb(str(path).encode(), out.ctypes.data, h, w)
    return out if rc == 0 else None


def decode_png_mask(path: str, h: int, w: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty((h, w), dtype=np.int32)
    rc = lib.uda_decode_png_mask(str(path).encode(), out.ctypes.data, h, w)
    return out if rc == 0 else None


def batch_decode_jpeg(paths: List[str], h: int, w: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None or not paths:
        return None
    out = np.empty((len(paths), h, w, 3), dtype=np.uint8)
    joined = "\n".join(str(p) for p in paths).encode()
    rc = lib.uda_batch_decode_jpeg(joined, len(paths), out.ctypes.data,
                                   h, w, _threads())
    return out if rc == 0 else None


def batch_decode_png(paths: List[str], h: int, w: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None or not paths:
        return None
    out = np.empty((len(paths), h, w), dtype=np.int32)
    joined = "\n".join(str(p) for p in paths).encode()
    rc = lib.uda_batch_decode_png(joined, len(paths), out.ctypes.data,
                                  h, w, _threads())
    return out if rc == 0 else None


def mask_class_histogram(path: str, num_classes: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    counts = np.zeros(num_classes, dtype=np.int64)
    total = lib.uda_mask_class_histogram(str(path).encode(),
                                         counts.ctypes.data, num_classes)
    return counts if total >= 0 else None
