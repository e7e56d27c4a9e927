"""Parity of matrix-based resizes vs torch F.interpolate (the oracle the
reference quantizer depends on: models/quant.py:199,209)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from controlvar_tpu.ops.resize import resize_area, resize_bicubic, upsample_nearest_2x

PATCH_NUMS = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16)


def _to_nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def _from_torch(y_nchw):
    return y_nchw.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("pn", PATCH_NUMS[:-1])
def test_area_downsample_matches_torch(rng, pn):
    x = rng.standard_normal((2, 16, 16, 32)).astype(np.float32)
    ours = np.asarray(resize_area(jnp.asarray(x), pn, pn))
    ref = _from_torch(F.interpolate(_to_nchw(x), size=(pn, pn), mode="area"))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("pn", PATCH_NUMS[:-1])
def test_bicubic_upsample_matches_torch(rng, pn):
    x = rng.standard_normal((2, pn, pn, 32)).astype(np.float32)
    ours = np.asarray(resize_bicubic(jnp.asarray(x), 16, 16))
    ref = _from_torch(F.interpolate(_to_nchw(x), size=(16, 16), mode="bicubic"))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_bicubic_downsample_matches_torch(rng):
    # idxBl_to_var_input also bicubic-downsamples nothing, but embed_to_fhat
    # upsamples small->256 paths; check a non-square-ish case too.
    x = rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
    ours = np.asarray(resize_bicubic(jnp.asarray(x), 10, 10))
    ref = _from_torch(F.interpolate(_to_nchw(x), size=(10, 10), mode="bicubic"))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_area_identity():
    x = np.arange(2 * 5 * 5 * 3, dtype=np.float32).reshape(2, 5, 5, 3)
    np.testing.assert_array_equal(np.asarray(resize_area(jnp.asarray(x), 5, 5)), x)


def test_nearest_2x_matches_torch(rng):
    x = rng.standard_normal((2, 7, 7, 4)).astype(np.float32)
    ours = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    ref = _from_torch(F.interpolate(_to_nchw(x), scale_factor=2, mode="nearest"))
    np.testing.assert_array_equal(ours, ref)
