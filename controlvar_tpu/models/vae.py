"""VQVAE conv backbone (LDM vq-f16 encoder/decoder), TPU-native.

Functional NHWC re-design of the reference's CompVis modules
(reference: models/vae_modules.py): ResNet blocks (GroupNorm32 + SiLU),
single-head spatial attention at the lowest resolution and mid, nearest+conv
upsampling, asymmetric-pad stride-2 downsampling.

TPU notes:
  * NHWC layout + HWIO kernels: XLA's native conv layout on TPU.
  * `compute_dtype=bfloat16` runs convs on the MXU at full speed (used for
    training-time tokenization, mirroring the reference's bf16 autocast,
    reference: train_control_var_hpu.py:157-167); `float32` pins HIGHEST
    precision for token-parity eval.
  * GroupNorm statistics always in fp32.

Params pytree (see init_encoder_params/init_decoder_params for the schema).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from controlvar_tpu.config import VQVAEConfig
from controlvar_tpu.ops.resize import upsample_nearest_2x

Params = Dict


# ----------------------------------------------------------------------------
# primitives
# ----------------------------------------------------------------------------

def _conv(p: Params, x: jnp.ndarray, stride: int = 1, padding="SAME",
          precision=None) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    return y + p["bias"].astype(x.dtype)


def group_norm(p: Params, x: jnp.ndarray, num_groups: int = 32,
               eps: float = 1e-6, matmul_ok: bool = False) -> jnp.ndarray:
    """GroupNorm over NHWC with fp32 statistics (reference: vae_modules.py:18-19).

    matmul_ok=True + bf16 input dispatches to the layout-preserving matmul
    form: at ch=160 the textbook (B,H,W,G,C/G) reshape puts a 5-wide minor
    dim on the 128-lane axis and costs 18 of the 138 ms per 32-image 256^2
    decode; the matmul form recovers 17 of them (tools/profile_vae.py, v5e).
    Only decoder_apply (the sampling epilogue) sets it: the matmul form's
    one-pass reductions compile to DIFFERENT fp32 roundings inside a
    lax.scan body than straight-line, which broke the exact
    grad-accum==big-batch equality through the train step's per-microbatch
    tokenize (tests/test_train.py::test_grad_accum_matches_big_batch).
    Encoder (tokenize) and fp32 (parity) inputs keep the reference-ordered
    two-pass reduction.
    """
    if matmul_ok and x.dtype == jnp.bfloat16:
        from controlvar_tpu.ops.groupnorm import group_norm_matmul

        return group_norm_matmul(p, x, num_groups=num_groups, eps=eps)
    dtype = x.dtype
    B, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, H, W, num_groups, C // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 2, 4), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(B, H, W, C)
    return (xn * p["scale"] + p["bias"]).astype(dtype)


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _resblock(p: Params, x: jnp.ndarray, precision,
              gn_matmul: bool = False) -> jnp.ndarray:
    h = _conv(p["conv1"], _swish(group_norm(p["norm1"], x, matmul_ok=gn_matmul)),
              precision=precision)
    h = _conv(p["conv2"], _swish(group_norm(p["norm2"], h, matmul_ok=gn_matmul)),
              precision=precision)
    if "nin_shortcut" in p:
        x = _conv(p["nin_shortcut"], x, precision=precision)
    return x + h


# row/col transfer matrices mapping 3x3 taps onto the 2x2 phase windows:
# T[phase, window_tap, orig_tap] (see conv_after_upsample_2x)
_PHASE_T = np.array(
    [[[1, 0, 0], [0, 1, 1]],   # even output row/col: sources (i-1, i)
     [[1, 1, 0], [0, 0, 1]]],  # odd  output row/col: sources (i, i+1)
    np.float32,
)


def conv_after_upsample_2x(p: Params, x: jnp.ndarray, precision) -> jnp.ndarray:
    """conv3x3(nearest_upsample_2x(x), W) computed WITHOUT upsampling.

    On the nearest-2x-duplicated grid, output pixel (2i+pr, 2j+pc) touches at
    most a 2x2 window of SOURCE pixels, with per-phase effective kernels that
    are row/col sums of the 3x3 taps: K[pr,pc,a,b] = sum_{u in U(pr,a),
    v in V(pc,b)} W[u,v] (U(0,·)={0},{1,2}; U(1,·)={0,1},{2}). One 2x2 conv
    with 4*Cout phase-grouped output channels over the 1-padded source then
    a depth-to-space interleave reproduces the reference values exactly (in
    real arithmetic; bf16 differs only by one extra rounding of the tap
    sums): 16 vs 36 MACs per source pixel and 4*Cout output channels that
    tile the 128-lane MXU minor dim exactly.

    MEASURED NEGATIVE on v5e (kept as documentation + parity test): 156.5 ms
    vs 138.7 ms for the literal upsample-then-conv at B=32. XLA already
    fuses the nearest-2x broadcast into the conv's input read (the 4x
    intermediate is never materialized), and the phase interleave's
    stack/transpose relayouts cost more than the saved MACs. Not called by
    decoder_apply.
    """
    W = p["kernel"]  # (3, 3, Cin, Cout)
    Cin, Cout = W.shape[2], W.shape[3]
    T = jnp.asarray(_PHASE_T)
    # (pr, pc, a, b, cin, cout) -> (a, b, cin, pr, pc, cout)
    K = jnp.einsum("pau,qbv,uvio->abipqo", T, T, W)
    K4 = K.reshape(2, 2, Cin, 4 * Cout).astype(x.dtype)
    B, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Y = jax.lax.conv_general_dilated(
        xp, K4, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )                                        # (B, h+1, w+1, 4*Cout)
    Y = Y.reshape(B, h + 1, w + 1, 2, 2, Cout)
    ee = Y[:, :h, :w, 0, 0]
    eo = Y[:, :h, 1:, 0, 1]
    oe = Y[:, 1:, :w, 1, 0]
    oo = Y[:, 1:, 1:, 1, 1]
    even = jnp.stack([ee, eo], axis=-2)      # (B, h, w, pc, C)
    odd = jnp.stack([oe, oo], axis=-2)
    out = jnp.stack([even, odd], axis=-3)    # (B, h, w, pr, pc, C)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * h, 2 * w, Cout)
    return out + p["bias"].astype(x.dtype)


def _attnblock(p: Params, x: jnp.ndarray, precision,
               gn_matmul: bool = False) -> jnp.ndarray:
    """Single-head spatial self-attention (reference: vae_modules.py:63-92)."""
    B, H, W, C = x.shape
    qkv = _conv(p["qkv"], group_norm(p["norm"], x, matmul_ok=gn_matmul),
                precision=precision)
    # torch packs qkv as (B, 3C, H, W) -> channel-major split
    qkv = qkv.reshape(B, H * W, 3, C)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    w = jnp.einsum("bic,bjc->bij", q, k, precision=precision) * (C ** -0.5)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(x.dtype)
    h = jnp.einsum("bij,bjc->bic", w, v, precision=precision).reshape(B, H, W, C)
    return x + _conv(p["proj"], h, precision=precision)


# ----------------------------------------------------------------------------
# encoder / decoder
# ----------------------------------------------------------------------------

def encoder_apply(p: Params, x: jnp.ndarray, cfg: VQVAEConfig,
                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """img (B, H, W, 3) in [-1, 1] -> feature (B, H/16, W/16, z_channels).

    Mirrors Encoder.forward (reference: vae_modules.py:144-160).
    """
    precision = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
    x = x.astype(compute_dtype)
    h = _conv(p["conv_in"], x, precision=precision)
    n_lvl = len(cfg.ch_mult)
    for i_level in range(n_lvl):
        lvl = p["down"][i_level]
        for i_block in range(cfg.num_res_blocks):
            h = _resblock(lvl["block"][i_block], h, precision)
            if lvl.get("attn"):
                h = _attnblock(lvl["attn"][i_block], h, precision)
        if i_level != n_lvl - 1:
            # stride-2 conv with asymmetric (0,1,0,1) pad (reference: vae_modules.py:37)
            hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = _conv(lvl["downsample"], hp, stride=2, padding="VALID", precision=precision)
    h = _resblock(p["mid"]["block_1"], h, precision)
    h = _attnblock(p["mid"]["attn_1"], h, precision)
    h = _resblock(p["mid"]["block_2"], h, precision)
    h = _conv(p["conv_out"], _swish(group_norm(p["norm_out"], h)), precision=precision)
    return h


def _resblock_wpacked(p: Params, x: jnp.ndarray, precision) -> jnp.ndarray:
    """_resblock on the W-packed layout (ops/packed_conv). Only for
    same-channel blocks (the decoder's final level is 160->160 throughout,
    so no nin_shortcut appears)."""
    from controlvar_tpu.ops.groupnorm import group_norm_matmul
    from controlvar_tpu.ops.packed_conv import conv_wpacked

    assert "nin_shortcut" not in p
    h = conv_wpacked(p["conv1"],
                     _swish(group_norm_matmul(p["norm1"], x, phases=2)),
                     precision=precision)
    h = conv_wpacked(p["conv2"],
                     _swish(group_norm_matmul(p["norm2"], h, phases=2)),
                     precision=precision)
    return x + h


def decoder_apply(p: Params, z: jnp.ndarray, cfg: VQVAEConfig,
                  compute_dtype=jnp.float32,
                  wpack: Optional[bool] = None) -> jnp.ndarray:
    """feature (B, h, w, z_channels) -> img (B, 16h, 16w, 3).

    Mirrors Decoder.forward (reference: vae_modules.py:210-226).

    wpack: run the final (highest-resolution) level W-packed — width pairs
    folded into channels so the ch-160 convs run as 320-channel convs at
    half the spatial positions (see ops/packed_conv). Exact in real
    arithmetic; bf16/fp32 outputs differ from the literal path only by conv
    accumulation order. Default (None): OFF — the only FAST formulation
    (single fused conv + shifted-slice channel concat, 110.6 ms vs literal
    121.9 at B=32) MISCOMPILES on this image's remote TPU toolchain
    (garbage phase-1 outputs, see ops/packed_conv.conv_wpacked), and every
    numerically-correct assembly measured slower than literal (at-set 243,
    two-conv 167 ms; tools/wpack_ab.json round 5). Opt in per-config via
    VQVAEConfig.wpack_decoder=True or CONTROLVAR_WPACK=1 on toolchains
    where the fused form compiles correctly. fp32 (token-parity) runs stay
    literal regardless.
    """
    precision = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
    if wpack is None:
        wpack = getattr(cfg, "wpack_decoder", None)
    if wpack is None:
        import os

        wpack = (compute_dtype == jnp.bfloat16
                 and os.environ.get("CONTROLVAR_WPACK", "0") == "1")
    z = z.astype(compute_dtype)
    h = _conv(p["conv_in"], z, precision=precision)
    # gn=True: the decoder is the sampling epilogue — bf16 runs take the
    # layout-preserving matmul GroupNorm (see group_norm's docstring)
    h = _resblock(p["mid"]["block_1"], h, precision, gn_matmul=True)
    h = _attnblock(p["mid"]["attn_1"], h, precision, gn_matmul=True)
    h = _resblock(p["mid"]["block_2"], h, precision, gn_matmul=True)
    n_lvl = len(cfg.ch_mult)
    # the final level can run packed only when it has no attention and no
    # channel-changing blocks (true for the released vq-f16 shape), AND a
    # packed entry point exists: the tensor enters the packed layout at the
    # i_level==1 upsample, so a single-level decoder (no upsample) must stay
    # literal (round-4 advisor finding)
    wpack = (wpack and n_lvl >= 2 and not p["up"][0].get("attn")
             and all("nin_shortcut" not in b for b in p["up"][0]["block"]))
    for i_level in reversed(range(n_lvl)):
        lvl = p["up"][i_level]
        if i_level == 0 and wpack:
            from controlvar_tpu.ops.groupnorm import group_norm_matmul
            from controlvar_tpu.ops.packed_conv import (conv_wpacked,
                                                        wunpack)

            for i_block in range(cfg.num_res_blocks + 1):
                h = _resblock_wpacked(lvl["block"][i_block], h, precision)
            h = conv_wpacked(
                p["conv_out"],
                _swish(group_norm_matmul(p["norm_out"], h, phases=2)),
                precision=precision,
            )
            return wunpack(h)
        for i_block in range(cfg.num_res_blocks + 1):
            h = _resblock(lvl["block"][i_block], h, precision, gn_matmul=True)
            if lvl.get("attn"):
                h = _attnblock(lvl["attn"][i_block], h, precision,
                               gn_matmul=True)
        if i_level != 0:
            if i_level == 1 and wpack:
                # enter the packed layout AT the upsample: nearest-2x column
                # duplication is exactly the packed-channel duplication, so
                # the 2x-width tensor never materializes
                from controlvar_tpu.ops.packed_conv import (
                    conv_wpacked, upsample_2x_wpacked)

                h = conv_wpacked(lvl["upsample"], upsample_2x_wpacked(h),
                                 precision=precision)
                continue
            # literal upsample-then-conv: XLA fuses the nearest-2x broadcast
            # into the conv input read, so the phase-conv rewrite
            # (conv_after_upsample_2x) measured SLOWER on v5e (156.5 vs
            # 138.7 ms, B=32 decoder) — its depth-to-space interleave costs
            # two full-tensor relayouts that outweigh the 2.25x MAC saving
            h = _conv(lvl["upsample"], upsample_nearest_2x(h), precision=precision)
    h = _conv(p["conv_out"], _swish(group_norm(p["norm_out"], h, matmul_ok=True)),
              precision=precision)
    return h


# ----------------------------------------------------------------------------
# init (torch-default initializers so randomly-initialized nets match scale)
# ----------------------------------------------------------------------------

def _init_conv(key, kh, kw, cin, cout):
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * cin
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(k1, (kh, kw, cin, cout), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
    }


def _init_norm(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _init_resblock(key, cin, cout):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _init_norm(cin),
        "conv1": _init_conv(ks[0], 3, 3, cin, cout),
        "norm2": _init_norm(cout),
        "conv2": _init_conv(ks[1], 3, 3, cout, cout),
    }
    if cin != cout:
        p["nin_shortcut"] = _init_conv(ks[2], 1, 1, cin, cout)
    return p


def _init_attn(key, c):
    k1, k2 = jax.random.split(key)
    return {
        "norm": _init_norm(c),
        "qkv": _init_conv(k1, 1, 1, c, 3 * c),
        "proj": _init_conv(k2, 1, 1, c, c),
    }


def init_encoder_params(key: jax.Array, cfg: VQVAEConfig) -> Params:
    ks = iter(jax.random.split(key, 256))
    ch = cfg.ch
    n_lvl = len(cfg.ch_mult)
    p: Params = {"conv_in": _init_conv(next(ks), 3, 3, 3, ch)}
    in_mult = (1,) + tuple(cfg.ch_mult)
    down = []
    block_in = ch
    for i_level in range(n_lvl):
        block_in = ch * in_mult[i_level]
        block_out = ch * cfg.ch_mult[i_level]
        blocks, attns = [], []
        for _ in range(cfg.num_res_blocks):
            blocks.append(_init_resblock(next(ks), block_in, block_out))
            block_in = block_out
            if i_level == n_lvl - 1:
                attns.append(_init_attn(next(ks), block_in))
        lvl: Params = {"block": blocks, "attn": attns}
        if i_level != n_lvl - 1:
            lvl["downsample"] = _init_conv(next(ks), 3, 3, block_in, block_in)
        down.append(lvl)
    p["down"] = down
    p["mid"] = {
        "block_1": _init_resblock(next(ks), block_in, block_in),
        "attn_1": _init_attn(next(ks), block_in),
        "block_2": _init_resblock(next(ks), block_in, block_in),
    }
    p["norm_out"] = _init_norm(block_in)
    p["conv_out"] = _init_conv(next(ks), 3, 3, block_in, cfg.z_channels)
    return p


def init_decoder_params(key: jax.Array, cfg: VQVAEConfig) -> Params:
    ks = iter(jax.random.split(key, 256))
    ch = cfg.ch
    n_lvl = len(cfg.ch_mult)
    block_in = ch * cfg.ch_mult[n_lvl - 1]
    p: Params = {"conv_in": _init_conv(next(ks), 3, 3, cfg.z_channels, block_in)}
    p["mid"] = {
        "block_1": _init_resblock(next(ks), block_in, block_in),
        "attn_1": _init_attn(next(ks), block_in),
        "block_2": _init_resblock(next(ks), block_in, block_in),
    }
    up: list = [None] * n_lvl
    for i_level in reversed(range(n_lvl)):
        block_out = ch * cfg.ch_mult[i_level]
        blocks, attns = [], []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_init_resblock(next(ks), block_in, block_out))
            block_in = block_out
            if i_level == n_lvl - 1:
                attns.append(_init_attn(next(ks), block_in))
        lvl: Params = {"block": blocks, "attn": attns}
        if i_level != 0:
            lvl["upsample"] = _init_conv(next(ks), 3, 3, block_in, block_in)
        up[i_level] = lvl
    p["up"] = up
    p["norm_out"] = _init_norm(block_in)
    p["conv_out"] = _init_conv(next(ks), 3, 3, block_in, 3)
    return p
