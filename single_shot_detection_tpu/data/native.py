"""ctypes bindings for the native C++ decode/staging library (native/).

The native path replaces the reference's jpeg4py/libturbojpeg + OpenCV data
pipeline (SURVEY.md §2.9) with an in-repo C++ thread-pooled batch decoder
writing straight into the staging buffer.  Falls back to PIL/cv2 when the
library isn't built (``make -C native``) or inputs aren't JPEG files.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libssd_decode.so')


def _build():
    try:
        subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception as exc:  # toolchain missing etc.
        logging.debug(f'native build failed: {exc}')
        return False


def get_library() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native decoder, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.decode_batch.restype = ctypes.c_int
        lib.decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ]
        lib.decode_single.restype = ctypes.c_int
        lib.decode_single.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        _LIB = lib
        logging.info('===> native decode library loaded')
    except OSError as exc:
        logging.debug(f'native load failed: {exc}')
    return _LIB


def decode_batch_into(paths: List[str], out: np.ndarray,
                      num_threads: int = 8,
                      fast_scale: bool = True) -> Optional[np.ndarray]:
    """Decode + stage JPEGs into ``out [B, H, W, 3]`` uint8.

    Returns per-image original (w, h) as ``[B, 2]`` int32, or None if the
    native path is unavailable.  Slots that failed to decode have size 0 —
    the caller falls back for those.

    ``fast_scale`` decodes at the smallest covering libjpeg DCT scale
    (num/8) before the bilinear stage — a large IDCT saving with a proper
    low-pass; disable for bit-parity with full-decode + cv2.resize.
    """
    lib = get_library()
    if lib is None:
        return None
    if not all(p.lower().endswith(('.jpg', '.jpeg')) for p in paths):
        return None
    b, h, w, _ = out.shape
    assert len(paths) <= b and out.dtype == np.uint8 and out.flags.c_contiguous
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    sizes = np.zeros((len(paths), 2), np.int32)
    lib.decode_batch(arr, len(paths),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                     w, h,
                     sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                     num_threads, int(fast_scale))
    return sizes
