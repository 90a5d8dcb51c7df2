"""ctypes bindings for the native C++ data pipeline (native/dtt_data.cpp).

Builds the shared object on first use (g++ is in the image), caches it next
to the source, and degrades to pure numpy when a compiler is unavailable.
The native path provides deterministic Fisher-Yates epoch shuffling and
multi-threaded batch gather + uint8→[-1,1] float32 normalization.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SRC = os.path.join(_NATIVE_DIR, "dtt_data.cpp")
_SO = os.path.join(_NATIVE_DIR, "libdtt_data.so")

_lib = None
_load_attempted = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-o", _SO, _SRC, "-lpthread",
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"[data.native] build failed, using numpy fallback: {e}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not os.path.exists(_SRC) or not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.dtt_shuffle_indices.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_uint64,
        ]
        lib.dtt_gather_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ]
        lib.dtt_gather_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except OSError as e:
        print(f"[data.native] load failed, using numpy fallback: {e}")
    return _lib


def shuffle_indices(n: int, seed: int) -> np.ndarray:
    """Deterministic epoch permutation; native Fisher-Yates when available."""
    lib = get_lib()
    idx = np.arange(n, dtype=np.int64)
    if lib is None:
        np.random.default_rng(seed).shuffle(idx)
        return idx
    lib.dtt_shuffle_indices(
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n, seed
    )
    return idx


def gather_normalize(images_u8: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Gather + uint8→[-1,1] float32 normalize a batch (multi-threaded)."""
    images_u8 = np.ascontiguousarray(images_u8, dtype=np.uint8)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    batch = idx.shape[0]
    img_elems = int(np.prod(images_u8.shape[1:]))
    lib = get_lib()
    if lib is None:
        return (
            images_u8[idx].astype(np.float32) / 255.0 * 2.0 - 1.0
        )
    out = np.empty((batch,) + images_u8.shape[1:], dtype=np.float32)
    lib.dtt_gather_normalize(
        images_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        batch,
        img_elems,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def gather_f32(images_f32: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Multi-threaded gather of pre-normalized float32 images."""
    images_f32 = np.ascontiguousarray(images_f32, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    batch = idx.shape[0]
    img_elems = int(np.prod(images_f32.shape[1:]))
    lib = get_lib()
    if lib is None:
        return images_f32[idx]
    out = np.empty((batch,) + images_f32.shape[1:], dtype=np.float32)
    lib.dtt_gather_f32(
        images_f32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        batch,
        img_elems,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
