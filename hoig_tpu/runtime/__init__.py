"""Native runtime: C++ data-pipeline kernels behind ctypes.

Compiled on first use with the system toolchain (g++); falls back to the
cv2/numpy paths transparently if the toolchain is unavailable. See warp.cc
for what each kernel replaces in the reference.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC_PATH = os.path.join(_THIS_DIR, "warp.cc")
_LIB = None
_TRIED = False


def _so_path() -> str:
    # The build artifact is keyed on a content hash of the source (git does
    # not preserve mtimes, so mtime staleness checks are meaningless on
    # fresh clones); a hash mismatch simply builds a new file. Binaries are
    # never committed (.gitignore's *.so).
    with open(_SRC_PATH, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_THIS_DIR, f"libhoigwarp-{digest}.so")


def _build(so_path: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC_PATH,
             "-o", so_path],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:  # toolchain missing / sandboxed
        print(f"[hoig_tpu.runtime] native build unavailable ({e}); "
              "falling back to cv2/numpy")
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so_path = _so_path()
    if not os.path.exists(so_path):
        if not _build(so_path):
            return None
    lib = ctypes.CDLL(so_path)
    lib.hoig_warp_affine_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.hoig_normalize_chw.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return _LIB


def warp_affine(src_u8: np.ndarray, trans: np.ndarray, out_hw) -> np.ndarray:
    """cv2.warpAffine(INTER_LINEAR, BORDER_CONSTANT 0) equivalent.

    src_u8: (H, W, C) uint8; trans: (2, 3) forward affine; -> (oh, ow, C)
    float32 in [0, 255].
    """
    lib = get_lib()
    oh, ow = out_hw
    if lib is None:
        import cv2

        return cv2.warpAffine(
            src_u8, trans.astype(np.float32), (ow, oh), flags=cv2.INTER_LINEAR
        ).astype(np.float32)
    src = np.ascontiguousarray(src_u8, dtype=np.uint8)
    h, w = src.shape[:2]
    ch = 1 if src.ndim == 2 else src.shape[2]
    t = np.ascontiguousarray(trans, dtype=np.float32)
    out = np.empty((oh, ow, ch), np.float32)
    lib.hoig_warp_affine_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, ch,
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), oh, ow,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out[:, :, 0] if src.ndim == 2 else out


def normalize_chw(patch_f32: np.ndarray, swap_rb: bool = True,
                  scale: float = 2.0, offset: float = -1.0) -> np.ndarray:
    """(H, W, C) float [0,255] -> (C, H, W) normalized float32."""
    lib = get_lib()
    if lib is None:
        arr = patch_f32[..., ::-1] if swap_rb else patch_f32
        return ((arr / 255.0) * scale + offset).transpose(2, 0, 1).astype(
            np.float32
        )
    src = np.ascontiguousarray(patch_f32, dtype=np.float32)
    h, w, ch = src.shape
    out = np.empty((ch, h, w), np.float32)
    lib.hoig_normalize_chw(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, ch,
        1 if swap_rb else 0, scale, offset,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
