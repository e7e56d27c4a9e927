"""Torch-parity separable image resizes, expressed as matrix multiplies.

The reference quantizer round-trips features through `F.interpolate` with
mode='area' (downsample, reference: models/quant.py:199) and mode='bicubic'
(upsample, reference: models/quant.py:209,235); matching these semantics
exactly is what makes token streams reproducible across frameworks.

TPU-first design: both resizes are *separable linear maps*, so we precompute
an (out, in) row matrix and apply it as two dense matmuls
    y = A_h @ x @ A_w^T
which XLA tiles onto the MXU. Sizes here are tiny (<=16 for the quantizer
pyramid, <=256 for full-image paths), so dense matrices are free and fusion
with neighbor ops is automatic. No gathers, no dynamic shapes.

Semantics reproduced:
  * 'area'    == torch adaptive_avg_pool2d: output cell i averages input rows
                 [floor(i*n/o), ceil((i+1)*n/o)) with uniform weights.
  * 'bicubic' == torch upsample_bicubic2d (align_corners=False,
                 antialias=False): cubic convolution kernel a=-0.75, source
                 coordinate (i+0.5)*n/o - 0.5, edge-clamped taps.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize_matrix", "resize_area", "resize_bicubic", "upsample_nearest_2x"]


def _cubic_weight(x: float, a: float = -0.75) -> float:
    x = abs(x)
    if x <= 1.0:
        return (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0
    if x < 2.0:
        return a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a
    return 0.0


@functools.lru_cache(maxsize=None)
def _resize_matrix_np(n_in: int, n_out: int, mode: str) -> np.ndarray:
    """(n_out, n_in) float32 row-interpolation matrix."""
    W = np.zeros((n_out, n_in), dtype=np.float64)
    if mode == "area":
        # adaptive average pooling bins
        for i in range(n_out):
            lo = (i * n_in) // n_out
            hi = -((-(i + 1) * n_in) // n_out)  # ceil((i+1)*n_in/n_out)
            W[i, lo:hi] = 1.0 / (hi - lo)
    elif mode == "bicubic":
        scale = n_in / n_out
        for i in range(n_out):
            src = (i + 0.5) * scale - 0.5
            f = math.floor(src)
            t = src - f
            for tap, dist in ((f - 1, 1.0 + t), (f, t), (f + 1, 1.0 - t), (f + 2, 2.0 - t)):
                w = _cubic_weight(dist)
                j = min(max(tap, 0), n_in - 1)  # edge clamp (replicate)
                W[i, j] += w
    elif mode == "nearest":
        # torch 'nearest' (legacy): src = floor(i * n_in / n_out)
        for i in range(n_out):
            W[i, min(int(i * n_in / n_out), n_in - 1)] = 1.0
    else:
        raise ValueError(f"unknown resize mode: {mode}")
    return W.astype(np.float32)


def resize_matrix(n_in: int, n_out: int, mode: str) -> jnp.ndarray:
    return jnp.asarray(_resize_matrix_np(n_in, n_out, mode))


def _apply_separable(x: jnp.ndarray, out_h: int, out_w: int, mode: str) -> jnp.ndarray:
    """x: (..., H, W, C) NHWC -> (..., out_h, out_w, C). Computes in fp32."""
    h, w = x.shape[-3], x.shape[-2]
    if h == out_h and w == out_w:
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    Ah = resize_matrix(h, out_h, mode)
    Aw = resize_matrix(w, out_w, mode)
    # HIGHEST precision: on TPU, fp32 matmuls otherwise run as bf16 on the MXU,
    # which breaks token-stream parity with the torch reference. These matrices
    # are tiny (<=256 rows), so the cost is negligible.
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,...hwc->...owc", Ah, xf, precision=hi)
    y = jnp.einsum("pw,...owc->...opc", Aw, y, precision=hi)
    return y.astype(dtype)


def resize_area(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Torch F.interpolate(mode='area') on NHWC input."""
    return _apply_separable(x, out_h, out_w, "area")


def resize_bicubic(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Torch F.interpolate(mode='bicubic', align_corners=False) on NHWC input."""
    return _apply_separable(x, out_h, out_w, "bicubic")


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Exact nearest 2x upsample (decoder path, reference: models/vae_modules.py:28)."""
    b = x.shape[:-3]
    h, w, c = x.shape[-3:]
    x = jnp.broadcast_to(x[..., :, None, :, None, :], b + (h, 2, w, 2, c))
    return x.reshape(b + (2 * h, 2 * w, c))
