"""ctypes bindings for the native C++ decode+resize loader
(``native/loader.cpp``), with transparent PIL fallback.

Build once with ``native/build.sh`` (g++, libjpeg, libpng). The .so is also
auto-built on first use if a compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native", "liblc2is_loader.so")
_lib = None
_tried = False


def _load_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        build = os.path.join(os.path.dirname(__file__), "..", "..", "native", "build.sh")
        if os.path.exists(build):
            try:
                subprocess.run(["bash", build], check=True, capture_output=True, timeout=120)
            except Exception:
                return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.lc2is_decode_resize_batch.restype = ctypes.c_int
        lib.lc2is_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.lc2is_decode.restype = ctypes.c_long
        lib.lc2is_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def decode_resize_batch(
    paths: Sequence[str],
    out_hw: Tuple[int, int],
    channels: int = 3,
    nearest: bool = False,
    num_threads: int = 0,
) -> np.ndarray:
    """Decode+resize a batch of images into one (N, H, W, C) uint8 array.
    Uses the C++ thread pool when available, PIL otherwise."""
    n = len(paths)
    oh, ow = out_hw
    lib = _load_lib()
    if lib is not None:
        out = np.empty((n, oh, ow, channels), dtype=np.uint8)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = lib.lc2is_decode_resize_batch(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            oh, ow, channels, int(nearest), num_threads,
        )
        if rc == 0:
            return out
        raise IOError(f"native decode failed for {paths[-rc - 1]}")
    # PIL fallback
    from PIL import Image

    out = np.empty((n, oh, ow, channels), dtype=np.uint8)
    for i, p in enumerate(paths):
        im = Image.open(p)
        im = im.convert("RGB" if channels == 3 else "L")
        im = im.resize((ow, oh), Image.NEAREST if nearest else Image.BILINEAR)
        a = np.asarray(im, dtype=np.uint8)
        out[i] = a if channels == 3 else a[..., None]
    return out


class NativeADE20KBatcher:
    """Fixed-shape fast path: paths -> (pixel uint8 NCHW, label int32) batch,
    ready for the on-device preprocess stage (data/preprocess.py)."""

    def __init__(self, img_size: int = 512, label_size: Optional[int] = None, num_threads: int = 0):
        self.img_size = img_size
        self.label_size = label_size or img_size
        self.num_threads = num_threads

    def __call__(self, img_paths: List[str], label_paths: List[str]):
        imgs = decode_resize_batch(img_paths, (self.img_size, self.img_size), 3,
                                   nearest=False, num_threads=self.num_threads)
        labels = decode_resize_batch(label_paths, (self.label_size, self.label_size), 1,
                                     nearest=True, num_threads=self.num_threads)
        return imgs.transpose(0, 3, 1, 2), labels[..., 0].astype(np.int32)
