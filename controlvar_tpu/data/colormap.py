"""Instance-mask colorization.

The pseudo-label masks are rendered as COLOR images before tokenization: each
instance gets a color from a 124-entry grid over the 5-level RGB cube (black
removed), selected by the instance centroid's cell in an 11x11 grid
(reference: datasets/imagenetC.py:15-37).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from controlvar_tpu.data.rle import decode_rle


def grid_color_map() -> np.ndarray:
    """(124, 3) uint8: 5^3 RGB grid minus black (reference: imagenetC.py:31-37)."""
    levels = [0, 64, 128, 192, 255]
    cmap = [[r, g, b] for r in levels for g in levels for b in levels]
    return np.array(cmap[1:], dtype=np.int64)


def procedural_palette(n: int = 150, seed: int = 1) -> np.ndarray:
    """Deterministic distinct-color palette for semantic-segmentation datasets
    (stands in for the reference's hand-written ADE table,
    reference: datasets/color_map.py)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, 3), dtype=np.int64)


def render_instance_mask(
    anns: Sequence[Dict],
    image_size: int = 512,
    colormap: np.ndarray = None,
    min_area: float = 5000.0,
    use_native: bool = True,
) -> np.ndarray:
    """COCO-style annotations -> (image_size, image_size, 3) color mask.

    Exact reference semantics (reference: imagenetC.py:15-29): skip instances
    with area < 5000; color index = (cx_cell * cy_cell) % 124 where the
    centroid cell comes from an 11x11 grid; later instances overwrite earlier.

    Uses the fused C kernel (controlvar_tpu/native) when available and the
    annotations are uniform compressed RLEs; falls back to numpy.
    """
    if colormap is None:
        colormap = grid_color_map()
    if use_native and len(anns):
        try:
            from controlvar_tpu import native

            if native.available():
                out = native.render_mask(anns, image_size, colormap, min_area)
                if out is not None:
                    return out.astype(np.float64)
        except Exception:
            pass  # fall back to the numpy path
    mask = np.zeros((image_size, image_size, 3), dtype=np.float64)
    for ann in anns:
        if ann.get("area", np.inf) < min_area:
            continue
        m = decode_rle(ann["segmentation"])
        ys, xs = np.nonzero(m == 1)
        if len(xs) == 0:
            continue
        X, Y = m.shape[1], m.shape[0]
        x = int(np.mean(xs) // (X / 11))
        y = int(np.mean(ys) // (Y / 11))
        mask[m.astype(bool)] = colormap[(x * y) % len(colormap)]
    return mask
