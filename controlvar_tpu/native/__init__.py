"""ctypes binding for the native data-path kernels, with transparent
build-on-first-import and graceful fallback to the numpy implementations.

Public API:
  available() -> bool
  rle_decode(counts: str, h, w) -> (h, w) uint8
  render_mask(anns, image_size, colormap, min_area) -> (H, W, 3) uint8
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "rle_native.c")
_SO = os.path.join(_HERE, "librle_native.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.rle_decode.restype = ctypes.c_int
    lib.rle_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ]
    lib.render_mask.restype = ctypes.c_int
    lib.render_mask.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_double,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def rle_decode(counts: str, h: int, w: int) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    out = np.zeros((h, w), np.uint8)
    rc = lib.rle_decode(counts.encode("ascii"), h, w, out)
    assert rc == 0, f"rle_decode failed rc={rc}"
    return out


def render_mask(anns: Sequence[Dict], image_size: int, colormap: np.ndarray,
                min_area: float = 5000.0) -> np.ndarray:
    """Fused native path for colormap.render_instance_mask. Requires every
    annotation's RLE to be at the same (image_size, image_size) resolution
    with string counts."""
    lib = _load()
    assert lib is not None
    usable = []
    for ann in anns:
        seg = ann.get("segmentation", {})
        if (
            isinstance(seg.get("counts"), str)
            and tuple(seg.get("size", ())) == (image_size, image_size)
        ):
            usable.append(ann)
        else:
            return None  # mixed formats: caller falls back to numpy
    counts = (ctypes.c_char_p * len(usable))(
        *[a["segmentation"]["counts"].encode("ascii") for a in usable]
    )
    areas = np.asarray([float(a.get("area", np.inf)) for a in usable], np.float64)
    cmap = np.ascontiguousarray(colormap.astype(np.uint8))
    out = np.zeros((image_size, image_size, 3), np.uint8)
    rc = lib.render_mask(
        counts, areas, len(usable), image_size, image_size,
        cmap, len(cmap), float(min_area), out,
    )
    assert rc == 0, f"render_mask failed rc={rc}"
    return out
