"""W-packed (space-to-depth along width) convs for the VQVAE decoder tail.

The decoder's 256^2 stage (ch=160, 7 of its 3x3 convs, ~56% of decoder
FLOPs — reference: models/vae_modules.py:163-226 runs it as plain NCHW
convs) measures at 28% of this chip's matmul rate: 160 channels fill only
1.25 of the MXU's 128-lane tiles on BOTH the contraction and output dims
(tools/conv_micro.py case a). Folding width pairs into channels — layout
(B, H, W/2, 2C) — runs the SAME logical convs at 320 channels and half the
spatial positions. A 3x3 conv on the unpacked grid becomes one VALID 3x2
conv over the padded packed tensor plus two shifted channel slices:
output phase 0 at packed col j reads packed cols (j-1, j); phase 1 reads
(j, j+1). FLOPs grow 4/3x but lane efficiency grows more (measured case g
vs a), and the tensor never leaves the packed layout across the stage.

Exact in real arithmetic (kernel entries are PLACED, never summed —
unlike the phase-conv upsample rewrite); floating-point differs only by
conv accumulation order. Parity: tests/test_vae.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["wpack", "wunpack", "wpack_kernel", "conv_wpacked",
           "upsample_2x_wpacked"]


def wpack(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W/2, 2C); packed channel qc*C+c holds column
    phase qc (even/odd original column)."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W // 2, 2 * C)


def wunpack(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of wpack."""
    B, H, Wp, C2 = x.shape
    return x.reshape(B, H, 2 * Wp, C2 // 2)


@functools.lru_cache(maxsize=2)
def _placement_entries():
    """(v, btap, qc, pc) tuples: original col tap v of output phase pc lands
    on window tap btap, input phase qc (window start: j-1 for pc=0, j for
    pc=1 — the two phases read the conv output at shifted positions)."""
    entries = []
    for pc in range(2):
        start = -1 if pc == 0 else 0
        for v in range(3):
            oc = pc - 1 + v          # original col offset from 2j
            pcol = oc // 2           # floor: -1 -> packed col j-1, phase 1
            qc = oc % 2
            entries.append((v, pcol - start, qc, pc))
    return tuple(entries)


def wpack_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (3, 2, 2Cin, 2Cout) packed-conv kernel.

    Pure STATIC placement — every original tap is .at[].set() into its slot
    exactly once, no arithmetic touches the weights. The previous 0/1
    einsum form was mathematically identical but measured WRONG on the
    remote-TPU toolchain: fused into the consuming conv, the phase-1 output
    channels came back garbage (per-column error ~200 on O(1) data,
    /tmp-repro round 5), and the einsum itself ran on the MXU at bf16
    (max|d| 0.0139 on the packed kernel — breaking the placement-exactness
    contract). The .at[].set() form is data movement only: exact on every
    backend and nothing for the compiler to mis-fuse."""
    kh, kw, Cin, Cout = w.shape
    # conv_wpacked pads H by 1 on each side, i.e. assumes kh == 3 as well
    assert kh == 3 and kw == 3, w.shape
    K = jnp.zeros((kh, 2, 2, Cin, 2, Cout), w.dtype)
    for v, btap, qc, pc in _placement_entries():
        K = K.at[:, btap, qc, :, pc, :].set(w[:, v])
    return K.reshape(kh, 2, 2 * Cin, 2 * Cout)


def conv_wpacked(p, x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """3x3 SAME conv (+bias) on the W-packed layout: pad, one VALID 3x2
    conv with the packed kernel, then the two phase-shifted channel slices
    assembled back into packed layout.

    The assembly uses .at[].set() instead of jnp.concatenate: on the
    remote-TPU toolchain, a channel-axis concat whose second operand is a
    WIDTH-SHIFTED slice of the conv output (y[:, :, 1:, C:]) — or a roll —
    miscompiles and returns garbage in the second channel half (round-5
    bisection /tmp/wpk_bisect2: t3/t9 rel_rms 0.99 vs CPU, while the same
    values through at[].set (t8), plain slices (t5/t6), or an unshifted
    concat (t7) are exact). The at-set form carries the identical values
    through a pattern every backend compiles correctly."""
    K = wpack_kernel(p["kernel"]).astype(x.dtype)
    Cout = p["kernel"].shape[-1]
    hp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    conv = lambda h, Kk: jax.lax.conv_general_dilated(
        h, Kk, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )
    # one VALID conv per output phase over its own shifted input view:
    # phase 0's windows start at packed col j-1, phase 1's at j. Same
    # total MACs as a single (3, 2, 2C, 2C) conv; the concat operands are
    # two INDEPENDENT conv outputs, which compiles correctly everywhere
    y0 = conv(hp[:, :, :-1], K[..., :Cout])
    y1 = conv(hp[:, :, 1:], K[..., Cout:])
    out = jnp.concatenate([y0, y1], axis=-1)
    bias = jnp.tile(p["bias"].astype(x.dtype), 2)
    return out + bias


def upsample_2x_wpacked(x: jnp.ndarray) -> jnp.ndarray:
    """nearest-2x upsample (B, H, W, C) -> W-packed (B, 2H, W, 2C): row
    duplication stays spatial; column duplication IS the packed-channel
    duplication (both phases of a packed column hold the same source
    pixel), so the width axis never materializes at 2W."""
    up_h = jnp.repeat(x, 2, axis=1)
    return jnp.concatenate([up_h, up_h], axis=-1)
