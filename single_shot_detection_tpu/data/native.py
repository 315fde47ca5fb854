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
        try:
            lib.decode_batch_yuv420.restype = ctypes.c_int
            lib.decode_batch_yuv420.argtypes = lib.decode_batch.argtypes
        except AttributeError:  # stale .so without the YUV entry point
            pass
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


def decode_batch_into_yuv420(paths: List[str], out: np.ndarray,
                             size: Tuple[int, int],
                             num_threads: int = 8,
                             fast_scale: bool = True) -> Optional[np.ndarray]:
    """Decode + stage JPEGs as planar YUV420 into ``out [B, H*W*3//2]``.

    ``size`` is the (w, h) staging size (both even).  Each slot holds the
    Y plane at (h, w) followed by Cb and Cr at (h//2, w//2) — 1.5 bytes per
    pixel, HALF the device-transfer volume of the RGB staging path.
    Reconstruction happens on-device (data/transforms.yuv420_to_rgb).
    Returns per-image original (w, h) or None if unavailable.
    """
    lib = get_library()
    if lib is None or not hasattr(lib, 'decode_batch_yuv420'):
        return None
    if not all(p.lower().endswith(('.jpg', '.jpeg')) for p in paths):
        return None
    w, h = size
    if (w % 2) or (h % 2):
        return None
    assert out.dtype == np.uint8 and out.flags.c_contiguous
    assert out.shape[0] >= len(paths) and out.shape[1] == w * h * 3 // 2
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    sizes = np.zeros((len(paths), 2), np.int32)
    rc = lib.decode_batch_yuv420(
        arr, len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads, int(fast_scale))
    if rc < 0:
        return None
    return sizes


def rgb_to_yuv420(img: np.ndarray) -> np.ndarray:
    """Python fallback: staged RGB uint8 [H, W, 3] -> packed planar YUV420
    (BT.601 full-range, 2x2 mean chroma subsampling) — used when the native
    decoder can't serve a sample (non-JPEG datasets, exotic colorspaces)."""
    h, w = img.shape[:2]
    f = img.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    sub = lambda p: p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    parts = [np.clip(np.round(y), 0, 255).ravel(),
             np.clip(np.round(sub(cb)), 0, 255).ravel(),
             np.clip(np.round(sub(cr)), 0, 255).ravel()]
    return np.concatenate(parts).astype(np.uint8)
