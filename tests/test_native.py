"""Native C data-path kernels: parity with the numpy implementations."""
import time

import numpy as np
import pytest

from controlvar_tpu import native
from controlvar_tpu.data.colormap import grid_color_map, render_instance_mask
from controlvar_tpu.data.rle import decode_rle, encode_rle


@pytest.fixture(scope="module")
def has_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_rle_decode_parity(has_native, rng):
    for _ in range(5):
        m = (rng.random((97, 61)) > 0.55).astype(np.uint8)
        enc = encode_rle(m)
        np.testing.assert_array_equal(
            native.rle_decode(enc["counts"], 97, 61), decode_rle(enc)
        )


def test_native_render_parity(has_native, rng):
    size = 128
    anns = []
    for i in range(4):
        m = np.zeros((size, size), np.uint8)
        y0, x0 = int(rng.integers(0, 64)), int(rng.integers(0, 64))
        m[y0 : y0 + 50, x0 : x0 + 50] = 1
        anns.append({"area": float(m.sum()), "segmentation": encode_rle(m)})
    # tiny one below min_area
    s = np.zeros((size, size), np.uint8)
    s[0:3, 0:3] = 1
    anns.append({"area": 9.0, "segmentation": encode_rle(s)})

    cm = grid_color_map()
    ours_native = native.render_mask(anns, size, cm, min_area=100.0)
    ours_numpy = render_instance_mask(anns, size, cm, min_area=100.0,
                                      use_native=False)
    np.testing.assert_array_equal(ours_native, ours_numpy.astype(np.uint8))


def test_native_is_faster(has_native, rng):
    size = 512
    anns = []
    for i in range(8):
        m = (rng.random((size, size)) > 0.5).astype(np.uint8)
        anns.append({"area": float(m.sum()), "segmentation": encode_rle(m)})
    cm = grid_color_map()
    t0 = time.perf_counter()
    native.render_mask(anns, size, cm, min_area=0.0)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    render_instance_mask(anns, size, cm, min_area=0.0, use_native=False)
    t_numpy = time.perf_counter() - t0
    # informational bound: native should not be slower than 2x numpy
    assert t_native < 2 * t_numpy, (t_native, t_numpy)
