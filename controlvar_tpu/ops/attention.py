"""Attention ops for scale-pyramid transformers.

Two paths:
  * `mha_xla`: plain einsum attention; XLA fuses the mask add + fp32 softmax.
    Used for decode steps (tiny q lengths) and as the reference path.
  * `flash_attention`: Pallas TPU flash-attention kernel with an additive
    block mask, used for the full-sequence training forward (L≈680-1378).
    Replaces the reference's flash-attn/xformers CUDA kernels
    (reference: models/basic_var.py:14-29,111-117).

Conventions: q, k, v are (B, H, L, hd); softmax statistics in fp32; the
boolean mask is (Lq, Lk) with True = attend.
"""
from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # large-negative instead of -inf: keeps masked softmax NaN-free


def mha_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, H, Lq, hd) x (B, H, Lk, hd) -> (B, H, Lq, hd)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * jnp.asarray(scale, q.dtype), k)
    logits = logits.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


# ----------------------------------------------------------------------------
# Pallas flash attention (training path)
# ----------------------------------------------------------------------------

def _flash_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref=None, *,
                  scale, block_k, kv_len, bh_block, with_lse=False):
    """One (bh-block, q-block) program: stream K/V blocks, online softmax,
    bh_block (batch, head) entries per program to amortize grid overhead
    (the 1-entry kernel ran ~1400 programs/layer at d16 train shapes).

    Dots take bf16 operands with fp32 accumulation (MXU-native); casting the
    operands to fp32 first forces multi-pass fp32 matmuls and doubles VMEM.
    """
    block_q = q_ref.shape[-2]
    num_kv = kv_len // block_k
    for j in range(bh_block):
        q = q_ref[j] * jnp.asarray(scale, q_ref.dtype)    # (block_q, hd)

        def body(i, carry, q=q, j=j):
            m_prev, l_prev, acc = carry
            k_blk = k_ref[j, pl.ds(i * block_k, block_k), :]
            v_blk = v_ref[j, pl.ds(i * block_k, block_k), :]
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # (block_q, block_k) fp32
            msk = mask_ref[pl.ds(0, block_q), pl.ds(i * block_k, block_k)]
            s = jnp.where(msk, s, NEG_INF)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc

        m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc0 = jnp.zeros((block_q, q_ref.shape[-1]), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
        o_ref[j] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        if with_lse:
            # logsumexp per row: consumed by the Pallas backward kernels
            lse_ref[j] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "bh_block", "interpret",
                     "return_lse"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,
    scale: float,
    block_q: int = 256,
    block_k: int = 256,
    bh_block: int = 0,    # 0 = auto-size by VMEM budget
    interpret: bool = False,
    return_lse: bool = False,
):
    """Masked flash attention. q,k,v: (B, H, L, hd); mask: (L, L) bool.

    L is padded to a block multiple internally (padded keys are masked out,
    padded queries discarded), so the 680/1360/1378-token pyramids work.
    """
    B, H, L, hd = q.shape
    Lp = -(-L // max(block_q, block_k)) * max(block_q, block_k)
    if Lp != L:
        pad = [(0, 0), (0, 0), (0, Lp - L), (0, 0)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        mask = jnp.pad(mask, [(0, Lp - L), (0, Lp - L)])  # pad=False: masked out
    BH = B * H
    if bh_block <= 0:
        # VMEM budget (with input double-buffering): per entry k+v full Lp
        # plus q/o blocks; mask and score tiles are shared
        per = 2 * (2 * Lp * hd * 2 + 2 * block_q * hd * 2)
        fixed = 2 * block_q * Lp + 4 * block_q * block_k
        bh_block = max(1, min(16, int((_DECODE_VMEM_BUDGET - fixed) // per)))
    bh_block = min(bh_block, BH)
    if return_lse and not interpret:
        # the 2-D lse out-block (bh, block_q) needs BOTH dims 8-aligned on
        # TPU; callers (flash_mha fwd) already require BH % 8 == 0
        bh_block = max(8, bh_block // 8 * 8)
        while bh_block > 0 and BH % bh_block:
            bh_block -= 8
        if bh_block <= 0:
            raise ValueError(f"return_lse requires B*H divisible by 8, got {BH}")
    else:
        while BH % bh_block:  # largest divisor <= budget (powers-of-2 halving
            bh_block -= 1     # quadrupled the grid for BH like 128 w/ budget 10)
    qf = q.reshape(BH, Lp, hd)
    kf = k.reshape(BH, Lp, hd)
    vf = v.reshape(BH, Lp, hd)

    grid = (BH // bh_block, Lp // block_q)
    kernel = functools.partial(
        _flash_kernel, scale=scale, block_k=block_k, kv_len=Lp,
        bh_block=bh_block, with_lse=return_lse,
    )
    out_specs = [pl.BlockSpec((bh_block, block_q, hd), lambda b, i: (b, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((BH, Lp, hd), q.dtype)]
    if return_lse:
        out_specs.append(pl.BlockSpec((bh_block, block_q), lambda b, i: (b, i)))
        out_shape.append(jax.ShapeDtypeStruct((BH, Lp), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, Lp), lambda b, i: (i, 0)),           # mask
            pl.BlockSpec((bh_block, block_q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((bh_block, Lp, hd), lambda b, i: (b, 0, 0)),   # k
            pl.BlockSpec((bh_block, Lp, hd), lambda b, i: (b, 0, 0)),   # v
        ],
        out_specs=out_specs if return_lse else out_specs[0],
        out_shape=out_shape if return_lse else out_shape[0],
        interpret=interpret,
    )(mask, qf, kf, vf)
    if return_lse:
        out, lse = res
        out = out.reshape(B, H, Lp, hd)[:, :, :L, :]
        return out, lse.reshape(B, H, Lp)[:, :, :L]
    return res.reshape(B, H, Lp, hd)[:, :, :L, :]


# ----------------------------------------------------------------------------
# differentiable wrapper: flash forward, recompute backward
# ----------------------------------------------------------------------------

# ----------------------------------------------------------------------------
# Pallas decode attention (KV-cached step)
# ----------------------------------------------------------------------------

def _dot_operands(fp32_dots, *ts):
    """Mosaic's non-MXU lowering of tiny dots emits invalid bf16->f32 IR on
    some toolchains; cast operands to fp32 for small blocks (perf-irrelevant
    there). One definition so all decode kernels stay in sync."""
    if fp32_dots:
        ts = tuple(t.astype(jnp.float32) for t in ts)
    return ts if len(ts) > 1 else ts[0]


def _decode_kernel(q_ref, kT_ref, vT_ref, o_ref, *, scale, bh_block,
                   fp32_dots=False):
    """One (bh-block, q-block) program. kT/vT for `bh_block` (batch, head)
    pairs live fully in VMEM (8 x 64 x 1408 bf16 = 1.4 MB), so no K streaming
    is needed: per pair, compute the (block_q, Lk) score tile in fp32 VMEM,
    softmax, contract with vT. Blocking several (b, h) pairs per program
    amortizes Pallas grid-program overhead — the 1-pair kernel spent ~30 us
    of fixed cost per program and ran at <100 GB/s effective."""
    for j in range(bh_block):
        q = q_ref[j] * jnp.asarray(scale, q_ref.dtype)    # (block_q, hd) bf16
        q, kT, vT = _dot_operands(fp32_dots, q, kT_ref[j], vT_ref[j])
        s = jax.lax.dot_general(
            q, kT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # (block_q, Lk) fp32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vT.dtype), vT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # (block_q, hd)
        o_ref[j] = o.astype(o_ref.dtype)


def _decode_kernel_masked(mask_ref, q_ref, kT_ref, vT_ref, o_ref, *, scale,
                          bh_block, fp32_dots=False):
    for j in range(bh_block):
        q = q_ref[j] * jnp.asarray(scale, q_ref.dtype)
        q, kT, vT = _dot_operands(fp32_dots, q, kT_ref[j], vT_ref[j])
        s = jax.lax.dot_general(
            q, kT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(mask_ref[...], s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vT.dtype), vT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[j] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "bh_block", "interpret")
)
def flash_decode(
    q: jnp.ndarray,       # (B, H, l, hd)
    kT: jnp.ndarray,      # (B, H, hd, Lk)
    vT: jnp.ndarray,      # (B, H, hd, Lk)
    mask: Optional[jnp.ndarray] = None,  # (l, Lk) bool
    scale: float = 1.0,
    block_q: int = 512,
    bh_block: int = 0,    # 0 = auto-size by VMEM budget
    interpret: bool = False,
) -> jnp.ndarray:
    """KV-cached decode attention over transposed caches, Pallas TPU."""
    B, H, l, hd = q.shape
    Lk = kT.shape[-1]
    bq = min(block_q, max(8, -(-l // 8) * 8))  # sublane-aligned q block
    lp = -(-l // bq) * bq
    if lp != l:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, lp - l), (0, 0)])
        if mask is not None:
            mask = jnp.pad(mask, [(0, lp - l), (0, 0)])
    BH = B * H
    if bh_block <= 0:
        # a flat j-entry is ONE head = half a paired entry's bytes, so twice
        # as many fit the budget (cap the unrolled loop length at 32)
        bh_block = min(32, max(1, 2 * _auto_bh_block(BH, Lk, bq, hd)))
    bh_block = min(bh_block, BH)
    while BH % bh_block:
        bh_block -= 1
    qf = q.reshape(BH, lp, hd)
    kf = kT.reshape(BH, hd, Lk)
    vf = vT.reshape(BH, hd, Lk)
    grid = (BH // bh_block, lp // bq)
    in_specs = [
        pl.BlockSpec((bh_block, bq, hd), lambda b, i: (b, i, 0)),
        pl.BlockSpec((bh_block, hd, Lk), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((bh_block, hd, Lk), lambda b, i: (b, 0, 0)),
    ]
    fp32_dots = bq < 128 or Lk < 128
    if mask is not None:
        kernel = functools.partial(_decode_kernel_masked, scale=scale,
                                   bh_block=bh_block, fp32_dots=fp32_dots)
        in_specs = [pl.BlockSpec((bq, Lk), lambda b, i: (i, 0))] + in_specs
        args = (mask, qf, kf, vf)
    else:
        kernel = functools.partial(_decode_kernel, scale=scale,
                                   bh_block=bh_block, fp32_dots=fp32_dots)
        args = (qf, kf, vf)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bh_block, bq, hd), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, lp, hd), q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, lp, hd)[:, :, :l, :]


def _decode_kernel_paired(q_ref, kp_ref, vp_ref, o_ref, *, scale, bh_block,
                          hd, fp32_dots=False):
    """Paired-head decode: the cache stores TWO heads side by side on a
    128-wide minor axis (hd=64 pairs), so cache rows are full (8, 128) TPU
    tiles — DUS cache writes and kernel reads are contiguous instead of
    64-wide half tiles. One program handles bh_block (batch, head-pair)
    entries x 2 heads."""
    # fp32_dots: Mosaic's non-MXU lowering of tiny dots emits an invalid
    # bf16->f32 vector.broadcast (verifier error); feed fp32 operands there
    # (the small scales are perf-irrelevant)
    for j in range(bh_block):
        kp = kp_ref[j]                                    # (Lk, 2*hd) bf16
        vp = vp_ref[j]
        for h in range(2):
            q = q_ref[j, h] * jnp.asarray(scale, q_ref.dtype)  # (block_q, hd)
            q, k_h = _dot_operands(fp32_dots, q, kp[:, h * hd : (h + 1) * hd])
            s = jax.lax.dot_general(
                q, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # (block_q, Lk) fp32
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            v_h = _dot_operands(fp32_dots, vp[:, h * hd : (h + 1) * hd])
            pv = p.astype(v_h.dtype)
            o = jax.lax.dot_general(
                pv, v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # (block_q, hd)
            o_ref[j, h] = o.astype(o_ref.dtype)


def _decode_kernel_paired_masked(mask_ref, q_ref, kp_ref, vp_ref, o_ref, *,
                                 scale, bh_block, hd, fp32_dots=False):
    for j in range(bh_block):
        kp = kp_ref[j]
        vp = vp_ref[j]
        for h in range(2):
            q = q_ref[j, h] * jnp.asarray(scale, q_ref.dtype)
            q, k_h = _dot_operands(fp32_dots, q, kp[:, h * hd : (h + 1) * hd])
            s = jax.lax.dot_general(
                q, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = jnp.where(mask_ref[...], s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            v_h = _dot_operands(fp32_dots, vp[:, h * hd : (h + 1) * hd])
            pv = p.astype(v_h.dtype)
            o = jax.lax.dot_general(
                pv, v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[j, h] = o.astype(o_ref.dtype)


# bytes; v5e VMEM ~16 MB/core, leave slack. Decode-attention cost is
# dominated by per-program overhead (~19 us) and program count =
# BH2/bh_block with bh_block VMEM-limited, so the budget directly sets the
# grid size. CONTROLVAR_VMEM_BUDGET overrides for on-chip A/B (read once at
# import; the value is baked into traces). Scope: decode kernels AND the
# training flash FORWARD's bh auto-sizing; the flash BACKWARD has its own
# knob below so decode A/Bs never silently change training blocking.
_DECODE_VMEM_BUDGET = int(os.environ.get("CONTROLVAR_VMEM_BUDGET",
                                         11_000_000))

# separate budget for flash_attention_bwd's bh sizing and block-shrink model
# (CONTROLVAR_BWD_VMEM_BUDGET; round-4 advisor: sharing the decode knob made
# a decode A/B silently change training-backward blocking in-process).
_BWD_VMEM_BUDGET = int(os.environ.get("CONTROLVAR_BWD_VMEM_BUDGET",
                                      11_000_000))


def _auto_bh_block(BH2: int, Lk: int, bq: int, hd: int,
                   tile_cols: int = 0) -> int:
    """Largest (batch, head-pair)-block that fits the VMEM budget.

    Program-grid overhead is the dominant decode-attention cost at small
    scales (measured ~19 us/program); blocking as many (b, pair) entries per
    program as VMEM allows keeps the grid tiny when the live cache prefix is
    short (early scales) and shrinks it at the final scales too.

    tile_cols > 0: count one (bq, tile_cols) fp32 score tile PER HEAD per
    pair in the per-pair cost — Mosaic allocates the score/softmax
    temporaries separately for every unrolled (j, h) iteration (measured:
    the prefix kernel's scoped stack grows ~bq*cols*4 bytes per unrolled
    head; the old one-tile 'fixed' model overflowed scoped vmem by ~1 MB at
    bh=4, pos=848, l=512)."""
    per_pair = Lk * 2 * hd * 2 * 2      # K + V rows, bf16
    per_pair += 2 * bq * hd * 2 * 2     # q + o for both heads, bf16
    per_pair *= 2                       # Mosaic double-buffers blocked inputs
    per_pair += 2 * bq * tile_cols * 4  # per-head fp32 score tiles (if any)
    fixed = 4 * bq * Lk + 2 * bq * hd * 4  # fp32 score tile + fp32 acc
    bh = max(1, int((_DECODE_VMEM_BUDGET - fixed) // per_pair))
    # cap: the kernel unrolls its (pair, head) loop, so very large blocks
    # blow up Mosaic compile time for no overhead win
    bh = min(bh, BH2, 32)
    while BH2 % bh:
        bh -= 1
    return bh


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "bh_block", "interpret")
)
def flash_decode_paired(
    q: jnp.ndarray,       # (B, H, l, hd)
    kp: jnp.ndarray,      # (B, H//2, Lk, 2*hd)  paired-head cache slice
    vp: jnp.ndarray,      # (B, H//2, Lk, 2*hd)
    mask: Optional[jnp.ndarray] = None,  # (l, Lk) bool
    scale: float = 1.0,
    block_q: int = 512,
    bh_block: int = 0,    # 0 = auto-size by VMEM budget
    interpret: bool = False,
) -> jnp.ndarray:
    """KV-cached decode attention over the paired-head cache layout."""
    B, H, l, hd = q.shape
    H2 = H // 2
    Lk = kp.shape[-2]
    bq = min(block_q, max(8, -(-l // 8) * 8))  # sublane-aligned q block
    lp = -(-l // bq) * bq
    if lp != l:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, lp - l), (0, 0)])
        if mask is not None:
            mask = jnp.pad(mask, [(0, lp - l), (0, 0)])
    BH2 = B * H2
    if bh_block <= 0:
        bh_block = _auto_bh_block(BH2, Lk, bq, hd)
    while BH2 % bh_block:
        bh_block //= 2
    bh_block = max(bh_block, 1)
    qf = q.reshape(BH2, 2, lp, hd)
    kf = kp.reshape(BH2, Lk, 2 * hd)
    vf = vp.reshape(BH2, Lk, 2 * hd)
    grid = (BH2 // bh_block, lp // bq)
    in_specs = [
        pl.BlockSpec((bh_block, 2, bq, hd), lambda b, i: (b, 0, i, 0)),
        pl.BlockSpec((bh_block, Lk, 2 * hd), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((bh_block, Lk, 2 * hd), lambda b, i: (b, 0, 0)),
    ]
    fp32_dots = bq < 128 or Lk < 128
    if mask is not None:
        kernel = functools.partial(_decode_kernel_paired_masked, scale=scale,
                                   bh_block=bh_block, hd=hd,
                                   fp32_dots=fp32_dots)
        in_specs = [pl.BlockSpec((bq, Lk), lambda b, i: (i, 0))] + in_specs
        args = (mask, qf, kf, vf)
    else:
        kernel = functools.partial(_decode_kernel_paired, scale=scale,
                                   bh_block=bh_block, hd=hd,
                                   fp32_dots=fp32_dots)
        args = (qf, kf, vf)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bh_block, 2, bq, hd), lambda b, i: (b, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH2, 2, lp, hd), q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, lp, hd)[:, :, :l, :]


def _decode_kernel_fused(q_ref, kv_ref, o_ref, *, scale, bh_block, hd,
                         fp32_dots=False, mask_ref=None):
    """Paired-head decode over a FUSED KV cache row: the last axis holds
    [k_pair (2*hd) | v_pair (2*hd)] so the carried cache is ONE buffer —
    one DUS write and one dynamic-slice read per layer instead of two each
    (the per-op overhead of those cache ops measured 84 ms/batch on the d16
    headline, tools/chained_ablation.json). Same dot shapes/operands as
    _decode_kernel_paired, so outputs are bitwise identical to it."""
    for j in range(bh_block):
        kv = kv_ref[j]                                    # (Lk, 4*hd) bf16
        for h in range(2):
            q = q_ref[j, h] * jnp.asarray(scale, q_ref.dtype)  # (block_q, hd)
            q, k_h = _dot_operands(fp32_dots, q, kv[:, h * hd : (h + 1) * hd])
            s = jax.lax.dot_general(
                q, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # (block_q, Lk) fp32
            if mask_ref is not None:
                s = jnp.where(mask_ref[...], s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            v_h = _dot_operands(fp32_dots,
                                kv[:, (2 + h) * hd : (3 + h) * hd])
            pv = p.astype(v_h.dtype)
            o = jax.lax.dot_general(
                pv, v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # (block_q, hd)
            o_ref[j, h] = o.astype(o_ref.dtype)


def _decode_kernel_fused_masked(mask_ref, q_ref, kv_ref, o_ref, *, scale,
                                bh_block, hd, fp32_dots=False):
    _decode_kernel_fused(q_ref, kv_ref, o_ref, scale=scale,
                         bh_block=bh_block, hd=hd, fp32_dots=fp32_dots,
                         mask_ref=mask_ref)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "bh_block", "interpret")
)
def flash_decode_fused(
    q: jnp.ndarray,       # (B, H, l, hd)
    kv: jnp.ndarray,      # (B, H//2, Lk, 4*hd)  fused [k_pair | v_pair] rows
    mask: Optional[jnp.ndarray] = None,  # (l, Lk) bool
    scale: float = 1.0,
    block_q: int = 512,
    bh_block: int = 0,    # 0 = auto-size by VMEM budget
    interpret: bool = False,
) -> jnp.ndarray:
    """KV-cached decode attention over the fused single-buffer cache layout
    (see _decode_kernel_fused). Numerics identical to flash_decode_paired."""
    B, H, l, hd = q.shape
    H2 = H // 2
    Lk = kv.shape[-2]
    bq = min(block_q, max(8, -(-l // 8) * 8))  # sublane-aligned q block
    lp = -(-l // bq) * bq
    if lp != l:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, lp - l), (0, 0)])
        if mask is not None:
            mask = jnp.pad(mask, [(0, lp - l), (0, 0)])
    BH2 = B * H2
    if bh_block <= 0:
        bh_block = _auto_bh_block(BH2, Lk, bq, hd)
    while BH2 % bh_block:
        bh_block //= 2
    bh_block = max(bh_block, 1)
    qf = q.reshape(BH2, 2, lp, hd)
    kvf = kv.reshape(BH2, Lk, 4 * hd)
    grid = (BH2 // bh_block, lp // bq)
    in_specs = [
        pl.BlockSpec((bh_block, 2, bq, hd), lambda b, i: (b, 0, i, 0)),
        pl.BlockSpec((bh_block, Lk, 4 * hd), lambda b, i: (b, 0, 0)),
    ]
    fp32_dots = bq < 128 or Lk < 128
    if mask is not None:
        kernel = functools.partial(_decode_kernel_fused_masked, scale=scale,
                                   bh_block=bh_block, hd=hd,
                                   fp32_dots=fp32_dots)
        in_specs = [pl.BlockSpec((bq, Lk), lambda b, i: (i, 0))] + in_specs
        args = (mask, qf, kvf)
    else:
        kernel = functools.partial(_decode_kernel_fused, scale=scale,
                                   bh_block=bh_block, hd=hd,
                                   fp32_dots=fp32_dots)
        args = (qf, kvf)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bh_block, 2, bq, hd), lambda b, i: (b, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH2, 2, lp, hd), q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, lp, hd)[:, :, :l, :]


def _prefix_kernel_paired(q_ref, kpre_ref, vpre_ref, kn_ref, vn_ref,
                          o_ref, *, scale, bh_block, hd, pos, l,
                          fp32_dots=False):
    """Decode attention over [cache prefix | fresh scale tokens].

    The prefix is read straight from ONE LAYER's full cache buffer via a
    BlockSpec that covers only the first pos_p rows — an XLA dynamic_slice
    of the cache feeding a pallas call breaks scan-carry in-place aliasing
    and cost ~86 ms/step at the final d16 scale (measured). Joint softmax
    over the two score tiles reproduces attention over the concatenated
    keys exactly.

    Block second-minor dims must be 8-aligned on TPU, so the prefix block is
    pos rounded UP to a multiple of 8 and the tail columns are iota-masked
    (they can hold stale data in donated caches); same for the fresh block.
    """
    pos_p = kpre_ref.shape[-2]
    l_p = kn_ref.shape[-2]
    for j in range(bh_block):
        kpre = kpre_ref[j]                                # (pos_p, 2*hd) bf16
        vpre = vpre_ref[j]
        kn = kn_ref[j]                                    # (l_p, 2*hd)
        vn = vn_ref[j]
        for h in range(2):
            q = q_ref[j, h] * jnp.asarray(scale, q_ref.dtype)  # (bq, hd)
            q, k1, k2 = _dot_operands(
                fp32_dots, q, kpre[:, h * hd : (h + 1) * hd],
                kn[:, h * hd : (h + 1) * hd])
            s1 = jax.lax.dot_general(
                q, k1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # (bq, pos_p) fp32
            s2 = jax.lax.dot_general(
                q, k2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # (bq, l_p)
            if pos_p != pos:
                tail = jax.lax.broadcasted_iota(jnp.int32, s1.shape, 1) >= pos
                s1 = jnp.where(tail, NEG_INF, s1)
            if l_p != l:
                tail = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) >= l
                s2 = jnp.where(tail, NEG_INF, s2)
            m = jnp.maximum(jnp.max(s1, axis=-1, keepdims=True),
                            jnp.max(s2, axis=-1, keepdims=True))
            p1 = jnp.exp(s1 - m)
            p2 = jnp.exp(s2 - m)
            den = (jnp.sum(p1, axis=-1, keepdims=True)
                   + jnp.sum(p2, axis=-1, keepdims=True))
            v1, v2 = _dot_operands(
                fp32_dots, vpre[:, h * hd : (h + 1) * hd],
                vn[:, h * hd : (h + 1) * hd])
            o = jax.lax.dot_general(
                p1.astype(v1.dtype), v1,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                p2.astype(v2.dtype), v2,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            o_ref[j, h] = (o / den).astype(o_ref.dtype)


def _prefix_kernel_paired_masked(mpre_ref, mn_ref, q_ref, kpre_ref,
                                 vpre_ref, kn_ref, vn_ref, o_ref, *, scale,
                                 bh_block, hd, pos, l, fp32_dots=False):
    # masks are padded with False to the aligned pos_p/l_p outside
    del pos, l
    for j in range(bh_block):
        kpre = kpre_ref[j]
        vpre = vpre_ref[j]
        kn = kn_ref[j]
        vn = vn_ref[j]
        for h in range(2):
            q = q_ref[j, h] * jnp.asarray(scale, q_ref.dtype)
            q, k1, k2 = _dot_operands(
                fp32_dots, q, kpre[:, h * hd : (h + 1) * hd],
                kn[:, h * hd : (h + 1) * hd])
            s1 = jax.lax.dot_general(
                q, k1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s2 = jax.lax.dot_general(
                q, k2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s1 = jnp.where(mpre_ref[...], s1, NEG_INF)
            s2 = jnp.where(mn_ref[...], s2, NEG_INF)
            m = jnp.maximum(jnp.max(s1, axis=-1, keepdims=True),
                            jnp.max(s2, axis=-1, keepdims=True))
            p1 = jnp.exp(s1 - m)
            p2 = jnp.exp(s2 - m)
            den = (jnp.sum(p1, axis=-1, keepdims=True)
                   + jnp.sum(p2, axis=-1, keepdims=True))
            v1, v2 = _dot_operands(
                fp32_dots, vpre[:, h * hd : (h + 1) * hd],
                vn[:, h * hd : (h + 1) * hd])
            o = jax.lax.dot_general(
                p1.astype(v1.dtype), v1,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                p2.astype(v2.dtype), v2,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            o_ref[j, h] = (o / den).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("pos", "scale", "block_q", "interpret")
)
def flash_decode_prefix(
    q: jnp.ndarray,        # (B, H, l, hd) fresh queries of this scale
    cache_k: jnp.ndarray,  # (B, H//2, L_max, 2*hd) ONE layer's full cache
    cache_v: jnp.ndarray,
    k_new: jnp.ndarray,    # (B, H//2, l, 2*hd) paired fresh keys
    v_new: jnp.ndarray,
    pos: int,              # static prefix length (tokens already cached)
    mask: Optional[jnp.ndarray] = None,  # (l, pos + l) bool
    scale: float = 1.0,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Paired-head decode attention reading the cache prefix in-kernel.

    NOTE: takes one layer's cache (static layer selection by the caller's
    unrolled loop). A scalar-prefetch variant indexing the stacked cache
    hangs this environment's remote Mosaic compiler — do not reintroduce.
    """
    B, H, l, hd = q.shape
    H2 = H // 2
    L_max = cache_k.shape[-2]
    pos_p = -(-pos // 8) * 8          # 8-aligned prefix block (tail masked)
    if pos_p + l > 1024:
        # large joint extent: halve q blocks or the dual-score-tile kernel
        # overflows scoped VMEM (measured 23.2M vs 16M at bq=512, d16 final
        # scale; bq=256/bh=4 compiles and runs 4.7 ms/layer)
        block_q = min(block_q, 256)
    bq = min(block_q, max(8, -(-l // 8) * 8))
    lp = -(-l // bq) * bq
    if lp != l:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, lp - l), (0, 0)])
        if mask is not None:
            mask = jnp.pad(mask, [(0, lp - l), (0, 0)])
    l_p = lp
    if l_p != l:
        pad = [(0, 0), (0, 0), (0, l_p - l), (0, 0)]
        k_new = jnp.pad(k_new, pad)
        v_new = jnp.pad(v_new, pad)
    BH2 = B * H2
    # fresh k/v blocks ride along with the prefix: count them twice in the
    # budget (once as cache rows, once as their own buffers); per-head fp32
    # score tiles span the joint [prefix | fresh] extent
    bh = _auto_bh_block(BH2, pos_p + 2 * l_p, bq, hd,
                        tile_cols=pos_p + l_p)
    while BH2 % bh:
        bh -= 1
    qf = q.reshape(BH2, 2, lp, hd)
    ckf = cache_k.reshape(BH2, L_max, 2 * hd)
    cvf = cache_v.reshape(BH2, L_max, 2 * hd)
    knf = k_new.reshape(BH2, l_p, 2 * hd)
    vnf = v_new.reshape(BH2, l_p, 2 * hd)
    grid = (BH2 // bh, lp // bq)
    in_specs = [
        pl.BlockSpec((bh, 2, bq, hd), lambda b, i: (b, 0, i, 0)),      # q
        pl.BlockSpec((bh, pos_p, 2 * hd), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((bh, pos_p, 2 * hd), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((bh, l_p, 2 * hd), lambda b, i: (b, 0, 0)),       # kn
        pl.BlockSpec((bh, l_p, 2 * hd), lambda b, i: (b, 0, 0)),       # vn
    ]
    fp32_dots = bq < 128 or pos_p < 128 or l_p < 128
    if mask is not None:
        kernel = functools.partial(_prefix_kernel_paired_masked, scale=scale,
                                   bh_block=bh, hd=hd, pos=pos, l=l,
                                   fp32_dots=fp32_dots)
        mpre = jnp.pad(mask[:, :pos], [(0, 0), (0, pos_p - pos)])
        mn = jnp.pad(mask[:, pos:], [(0, 0), (0, l_p - (mask.shape[1] - pos))])
        in_specs = [
            pl.BlockSpec((bq, pos_p), lambda b, i: (i, 0)),  # mask prefix
            pl.BlockSpec((bq, l_p), lambda b, i: (i, 0)),    # mask new
        ] + in_specs
        args = (mpre, mn, qf, ckf, cvf, knf, vnf)
    else:
        kernel = functools.partial(_prefix_kernel_paired, scale=scale,
                                   bh_block=bh, hd=hd, pos=pos, l=l,
                                   fp32_dots=fp32_dots)
        args = (qf, ckf, cvf, knf, vnf)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bh, 2, bq, hd), lambda b, i: (b, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH2, 2, lp, hd), q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, lp, hd)[:, :, :l, :]



def _inplace_kernel(li_ref, q_ref, kn_ref, vn_ref, ck_hbm, cv_hbm,
                    o_ref, cko_hbm, cvo_hbm, kpre, vpre, sems, *,
                    scale, bh_block, hd, pos, pos_p, l, BH2, fp32_dots):
    """Fused write+attend decode step over the FULL stacked HBM cache.

    One launch per layer-step does what the carry-scan path previously split
    across two dynamic_update_slice ops, a dynamic_slice read, and a kernel
    launch (PERF.md §3: the DUS writes alone cost 84 ms/batch of XLA
    carry-aliasing bookkeeping on the d16 headline):

      1. DMA the fresh paired K/V rows (VMEM inputs) into THIS layer's rows
         [pos, pos+l) of the stacked (depth*B*H/2, L_max, 2hd) cache, which
         is ALIASED in/out (input_output_aliases) — the write is in place,
         no XLA-level cache op exists at all.
      2. DMA the layer's cache prefix rows [0, pos_p) into VMEM scratch.
         pos_p rounds pos up to sublane alignment; the tail columns overlap
         the rows being written in step 1 but are iota-masked out of the
         softmax, so the race is value-irrelevant.
      3. Two-tile joint-softmax attention over [prefix | fresh], exactly
         _prefix_kernel_paired's math (bitwise: same dot shapes/operands).

    The layer index arrives as a traced int32 in SMEM — NOT scalar prefetch
    (PrefetchScalarGridSpec hangs this image's remote Mosaic compiler) — and
    only offsets manual DMAs, never a BlockSpec index_map.
    """
    i = pl.program_id(1)
    li = li_ref[0]
    base = li * BH2 + pl.program_id(0) * bh_block
    l_p = kn_ref.shape[-2]

    # 1. fresh-row write into the aliased cache output (once per bh-row
    # group: q-block programs i > 0 see the same fresh rows via kn/vn refs).
    # The copy spans the full PADDED l_p rows — Mosaic requires VMEM-side
    # slices to be sublane(8)-aligned — so up to 7 zero rows land in
    # [pos+l, pos+l_p). Padding is value-invisible: a row r is only ever
    # read UNMASKED by steps whose pos > r (every step iota-masks prefix
    # columns >= its own pos), the step owning r (pos <= r < pos+l) writes
    # r's real value, and it runs before any step with pos > r; padding
    # touches only rows >= the padder's cur, whose owning steps run later
    # and overwrite it. So real values always land last before an unmasked
    # read.
    @pl.when(i == 0)
    def _write():
        wk = pltpu.make_async_copy(
            kn_ref,
            cko_hbm.at[pl.ds(base, bh_block), pl.ds(pos, l_p), :],
            sems.at[2],
        )
        wv = pltpu.make_async_copy(
            vn_ref,
            cvo_hbm.at[pl.ds(base, bh_block), pl.ds(pos, l_p), :],
            sems.at[3],
        )
        wk.start()
        wv.start()
        wk.wait()
        wv.wait()

    if pos > 0:
        # 2. prefix read — from the aliased OUTPUT refs (same buffer)
        rk = pltpu.make_async_copy(
            cko_hbm.at[pl.ds(base, bh_block), pl.ds(0, pos_p), :],
            kpre, sems.at[0],
        )
        rv = pltpu.make_async_copy(
            cvo_hbm.at[pl.ds(base, bh_block), pl.ds(0, pos_p), :],
            vpre, sems.at[1],
        )
        rk.start()
        rv.start()
        rk.wait()
        rv.wait()

    # 3. attention
    for j in range(bh_block):
        kn = kn_ref[j]                                    # (l_p, 2hd)
        vn = vn_ref[j]
        for h in range(2):
            q = q_ref[j, h] * jnp.asarray(scale, q_ref.dtype)  # (bq, hd)
            if pos == 0:
                q, k2, v2 = _dot_operands(
                    fp32_dots, q, kn[:, h * hd : (h + 1) * hd],
                    vn[:, h * hd : (h + 1) * hd])
                s2 = jax.lax.dot_general(
                    q, k2, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if l_p != l:
                    tail = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) >= l
                    s2 = jnp.where(tail, NEG_INF, s2)
                m = jnp.max(s2, axis=-1, keepdims=True)
                p2 = jnp.exp(s2 - m)
                den = jnp.sum(p2, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    p2.astype(v2.dtype), v2,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[j, h] = (o / den).astype(o_ref.dtype)
                continue
            q, k1, k2 = _dot_operands(
                fp32_dots, q, kpre[j, :, h * hd : (h + 1) * hd],
                kn[:, h * hd : (h + 1) * hd])
            s1 = jax.lax.dot_general(
                q, k1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # (bq, pos_p) fp32
            s2 = jax.lax.dot_general(
                q, k2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # (bq, l_p)
            if pos_p != pos:
                tail = jax.lax.broadcasted_iota(jnp.int32, s1.shape, 1) >= pos
                s1 = jnp.where(tail, NEG_INF, s1)
            if l_p != l:
                tail = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) >= l
                s2 = jnp.where(tail, NEG_INF, s2)
            m = jnp.maximum(jnp.max(s1, axis=-1, keepdims=True),
                            jnp.max(s2, axis=-1, keepdims=True))
            p1 = jnp.exp(s1 - m)
            p2 = jnp.exp(s2 - m)
            den = (jnp.sum(p1, axis=-1, keepdims=True)
                   + jnp.sum(p2, axis=-1, keepdims=True))
            v1, v2 = _dot_operands(
                fp32_dots, vpre[j, :, h * hd : (h + 1) * hd],
                vn[:, h * hd : (h + 1) * hd])
            o = jax.lax.dot_general(
                p1.astype(v1.dtype), v1,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                p2.astype(v2.dtype), v2,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            o_ref[j, h] = (o / den).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("pos", "scale", "block_q", "interpret")
)
def flash_decode_inplace(
    q: jnp.ndarray,        # (B, H, l, hd) fresh queries of this scale
    cache_k: jnp.ndarray,  # (depth, B, H//2, L_max, 2*hd) FULL stacked cache
    cache_v: jnp.ndarray,
    k_new: jnp.ndarray,    # (B, H//2, l, 2*hd) paired fresh keys
    v_new: jnp.ndarray,
    li: jnp.ndarray,       # () or (1,) int32 traced layer index
    pos: int,              # static prefix length (tokens already cached)
    scale: float = 1.0,
    block_q: int = 512,
    interpret: bool = False,
):
    """Fused in-place cache write + decode attention (see _inplace_kernel).

    Returns (o, cache_k, cache_v) with the caches updated IN PLACE via
    pallas input_output_aliases — callers must treat the inputs as consumed
    (the carry-scan decode path does: the caches flow through the scan
    carry). Unmasked attention only; `indep`-mode callers keep the split
    write+read path."""
    B, H, l, hd = q.shape
    H2 = H // 2
    depth = cache_k.shape[0]
    L_max = cache_k.shape[-2]
    assert cache_k.shape == (depth, B, H2, L_max, 2 * hd), (
        cache_k.shape, (depth, B, H2, L_max, 2 * hd))
    assert pos + l <= L_max
    pos_p = -(-pos // 8) * 8          # 8-aligned prefix block (tail masked)
    if pos_p + l > 1024:
        block_q = min(block_q, 256)   # dual-score-tile VMEM (see prefix kern)
    bq = min(block_q, max(8, -(-l // 8) * 8))
    lp = -(-l // bq) * bq
    if lp != l:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, lp - l), (0, 0)])
    # fresh K/V rows are padded to sublane alignment ONLY (<= 7 zero rows):
    # the in-kernel DMA needs an 8-aligned VMEM source, and decoupling this
    # from the q-block padding keeps the cache pollution bounded regardless
    # of block_q
    l8 = max(8, -(-l // 8) * 8)
    if l8 != l:
        pad = [(0, 0), (0, 0), (0, l8 - l), (0, 0)]
        k_new = jnp.pad(k_new, pad)
        v_new = jnp.pad(v_new, pad)
    BH2 = B * H2
    # padded write must stay inside the buffer: callers allocate L_max
    # 8-aligned (init_kv_cache rounds up), so ceil8(cur) <= L_max
    assert pos + l8 <= L_max, (pos, l8, L_max)
    # VMEM model: prefix scratch is NOT double-buffered (plain scratch), the
    # blocked q/kn/vn/o are; per-head fp32 score tiles span [prefix | fresh]
    bh = _auto_bh_block(BH2, 2 * l8, bq, hd, tile_cols=pos_p + l8)
    while bh > 1 and bh * pos_p * 2 * hd * 2 * 2 > _DECODE_VMEM_BUDGET // 3:
        bh -= 1                       # prefix scratch share of the budget
    while BH2 % bh:
        bh -= 1
    qf = q.reshape(BH2, 2, lp, hd)
    knf = k_new.reshape(BH2, l8, 2 * hd)
    vnf = v_new.reshape(BH2, l8, 2 * hd)
    ckf = cache_k.reshape(depth * BH2, L_max, 2 * hd)
    cvf = cache_v.reshape(depth * BH2, L_max, 2 * hd)
    lif = jnp.asarray(li, jnp.int32).reshape(1)
    grid = (BH2 // bh, lp // bq)
    fp32_dots = bq < 128 or (pos > 0 and pos_p < 128) or l8 < 128
    kernel = functools.partial(
        _inplace_kernel, scale=scale, bh_block=bh, hd=hd, pos=pos,
        pos_p=pos_p, l=l, BH2=BH2, fp32_dots=fp32_dots,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    o, ck_out, cv_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                  # li
            pl.BlockSpec((bh, 2, bq, hd), lambda b, i: (b, 0, i, 0)),  # q
            pl.BlockSpec((bh, l8, 2 * hd), lambda b, i: (b, 0, 0)),    # kn
            pl.BlockSpec((bh, l8, 2 * hd), lambda b, i: (b, 0, 0)),    # vn
            any_spec,                                               # ck
            any_spec,                                               # cv
        ],
        out_specs=[
            pl.BlockSpec((bh, 2, bq, hd), lambda b, i: (b, 0, i, 0)),
            any_spec,
            any_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH2, 2, lp, hd), q.dtype),
            jax.ShapeDtypeStruct(ckf.shape, ckf.dtype),
            jax.ShapeDtypeStruct(cvf.shape, cvf.dtype),
        ],
        input_output_aliases={4: 1, 5: 2},
        scratch_shapes=[
            pltpu.VMEM((bh, max(pos_p, 8), 2 * hd), cache_k.dtype),  # kpre
            pltpu.VMEM((bh, max(pos_p, 8), 2 * hd), cache_k.dtype),  # vpre
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(lif, qf, knf, vnf, ckf, cvf)
    o = o.reshape(B, H, lp, hd)[:, :, :l, :]
    shape5 = (depth, B, H2, L_max, 2 * hd)
    return o, ck_out.reshape(shape5), cv_out.reshape(shape5)


def _flash_bwd_dq_kernel(mask_ref, q_ref, do_ref, lse_ref, dsum_ref, k_ref,
                         v_ref, dq_ref, *, scale, block_k, kv_len, bh_block):
    """dq = scale * sum_k [P o (dP - D)] K  with P recomputed from LSE.

    One (bh-block, q-block) program; K/V live whole in VMEM; k-blocks are
    streamed with a fori_loop. No (L, L) matrices ever touch HBM."""
    block_q = q_ref.shape[-2]
    num_kv = kv_len // block_k
    for j in range(bh_block):
        qs = q_ref[j] * jnp.asarray(scale, q_ref.dtype)       # (bq, hd)
        do = do_ref[j]                                        # (bq, hd)
        lse = lse_ref[j][:, None]                             # (bq, 1) f32
        dsum = dsum_ref[j][:, None]                           # (bq, 1) f32

        def body(i, acc, qs=qs, do=do, lse=lse, dsum=dsum, j=j):
            k_blk = k_ref[j, pl.ds(i * block_k, block_k), :]
            v_blk = v_ref[j, pl.ds(i * block_k, block_k), :]
            s = jax.lax.dot_general(
                qs, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                 # (bq, bk)
            msk = mask_ref[pl.ds(0, qs.shape[0]), pl.ds(i * block_k, block_k)]
            s = jnp.where(msk, s, NEG_INF)
            p = jnp.exp(s - lse)                              # (bq, bk) f32
            dp = jax.lax.dot_general(
                do, v_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                 # (bq, bk)
            ds = p * (dp - dsum)
            return acc + jax.lax.dot_general(
                ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc0 = jnp.zeros((block_q, q_ref.shape[-1]), jnp.float32)
        acc = jax.lax.fori_loop(0, num_kv, body, acc0)
        dq_ref[j] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(mask_ref, q_ref, do_ref, lse_ref, dsum_ref, k_ref,
                          v_ref, dk_ref, dv_ref, *, scale, block_q, q_len,
                          bh_block):
    """dk = scale * sum_q dS^T Q;  dv = sum_q P^T dO.

    One (bh-block, k-block) program; Q/dO/LSE/D live whole in VMEM and
    q-blocks are streamed."""
    block_k = k_ref.shape[-2]
    num_q = q_len // block_q
    for j in range(bh_block):
        k_blk = k_ref[j]                                      # (bk, hd)
        v_blk = v_ref[j]

        def body(i, carry, k_blk=k_blk, v_blk=v_blk, j=j):
            dk_acc, dv_acc = carry
            q_i = q_ref[j, pl.ds(i * block_q, block_q), :]
            qs = q_i * jnp.asarray(scale, q_i.dtype)
            do_i = do_ref[j, pl.ds(i * block_q, block_q), :]
            lse_i = lse_ref[j, pl.ds(i * block_q, block_q)][:, None]
            dsum_i = dsum_ref[j, pl.ds(i * block_q, block_q)][:, None]
            s = jax.lax.dot_general(
                qs, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                 # (bq, bk)
            msk = mask_ref[pl.ds(i * block_q, block_q), pl.ds(0, block_k)]
            s = jnp.where(msk, s, NEG_INF)
            p = jnp.exp(s - lse_i)
            dv_acc = dv_acc + jax.lax.dot_general(
                p.astype(do_i.dtype), do_i, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                 # (bk, hd)
            dp = jax.lax.dot_general(
                do_i, v_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - dsum_i)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds.astype(q_i.dtype), q_i, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                 # (bk, hd)
            return dk_acc, dv_acc

        z = jnp.zeros((block_k, k_ref.shape[-1]), jnp.float32)
        dk_acc, dv_acc = jax.lax.fori_loop(0, num_q, body, (z, z))
        dk_ref[j] = (dk_acc * scale).astype(dk_ref.dtype)
        dv_ref[j] = dv_acc.astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret"),
)
def flash_attention_bwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,
    out: jnp.ndarray,
    lse: jnp.ndarray,     # (B, H, L) f32 from flash_attention(return_lse=True)
    g: jnp.ndarray,       # cotangent of out
    scale: float,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
):
    """Flash-attention backward: (dq, dk, dv) with no (L, L) HBM matrices.

    The einsum backward materializes four (B, H, L, L) fp32/bf16 matrices
    per layer (~5 GB of traffic each at d16 train shapes); these kernels
    stream tiles and recompute P from the forward's LSE."""
    B, H, L, hd = q.shape
    # Provisional padded length from the REQUESTED blocks: used only to size
    # bh and the shrink model. The final Lp is recomputed below after the
    # shrink loop settles the real block sizes (shrinking blocks can only
    # reduce Lp, so sizing with the provisional value is conservative).
    lcm0 = math.lcm(block_q, block_k)
    Lp = -(-L // lcm0) * lcm0
    BH = B * H
    # lse/D ride as (bh, block) 2-D blocks: both dims must be 8-aligned on
    # TPU, so bh must be a multiple of 8 (callers fall back to the einsum
    # path when BH % 8 != 0)
    per = 2 * (4 * Lp * hd * 2)   # q/do/k-or-v pairs, double-buffered
    bh = max(8, min(16, int(_BWD_VMEM_BUDGET // per) // 8 * 8))
    bh = min(bh, BH)
    while bh > 0 and BH % bh:
        bh -= 8
    if bh <= 0:
        if not interpret:
            raise ValueError(
                f"flash_attention_bwd requires B*H divisible by 8, got {BH}")
        bh = 1  # interpret mode has no block-alignment rule
    # Scoped-VMEM stack model: Mosaic allocates the three (block_q, block_k)
    # fp32 temporaries (s, p, dp) SEPARATELY for every unrolled bh iteration
    # (same lesson as _auto_bh_block's tile_cols), on top of the
    # double-buffered whole-L K/V (dq kernel) or Q/dO (dkv kernel) blocks.
    # At d16 train shapes (Lp=1536, bh=8) the 256x256 defaults overflow the
    # scoped budget at COMPILE time ("kernel-vmem-stack-oom",
    # tools/train_bwd_ab.json round 4); halve the blocks until the model
    # fits. Explicit block args are honored verbatim; the 128 floor applies
    # only when the shrink loop actually ran.
    def _stack_bytes(bq, bk):
        whole_l = bh * 2 * Lp * hd * 2 * 2      # K+V (or Q+dO), dbl-buffered
        temps = bh * 3 * bq * bk * 4            # per-j fp32 s/p/dp
        io = bh * 2 * bq * hd * 2 * 2 + 2 * max(bq, bk) * Lp
        return whole_l + temps + io

    shrunk = False
    while (_stack_bytes(block_q, block_k) > _BWD_VMEM_BUDGET
           and max(block_q, block_k) > 128):
        if block_q >= block_k:
            block_q //= 2
        else:
            block_k //= 2
        shrunk = True
    if shrunk:
        block_q = max(block_q, min(128, Lp))
        block_k = max(block_k, min(128, Lp))
    # Final padded length: a multiple of BOTH block sizes, recomputed AFTER
    # the block sizes are settled — padding from the original blocks and
    # then raising a block under-covered the grid and silently left tail
    # rows of dq/dk/dv unwritten (round-4 advisor finding).
    lcm = math.lcm(block_q, block_k)
    Lp = -(-L // lcm) * lcm
    assert Lp % block_q == 0 and Lp % block_k == 0
    if Lp != L:
        pad = [(0, 0), (0, 0), (0, Lp - L), (0, 0)]
        q, k, v, out, g = (jnp.pad(t, pad) for t in (q, k, v, out, g))
        mask = jnp.pad(mask, [(0, Lp - L), (0, Lp - L)])
        lse = jnp.pad(lse, [(0, 0), (0, 0), (0, Lp - L)])
    qf = q.reshape(BH, Lp, hd)
    kf = k.reshape(BH, Lp, hd)
    vf = v.reshape(BH, Lp, hd)
    gf = g.reshape(BH, Lp, hd)
    lsef = lse.reshape(BH, Lp)
    dsum = jnp.sum(gf.astype(jnp.float32) * out.reshape(BH, Lp, hd).astype(jnp.float32),
                   axis=-1)                                   # (BH, Lp)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, block_k=block_k,
                          kv_len=Lp, bh_block=bh),
        grid=(BH // bh, Lp // block_q),
        in_specs=[
            pl.BlockSpec((block_q, Lp), lambda b, i: (i, 0)),           # mask
            pl.BlockSpec((bh, block_q, hd), lambda b, i: (b, i, 0)),    # q
            pl.BlockSpec((bh, block_q, hd), lambda b, i: (b, i, 0)),    # dO
            pl.BlockSpec((bh, block_q), lambda b, i: (b, i)),           # lse
            pl.BlockSpec((bh, block_q), lambda b, i: (b, i)),           # D
            pl.BlockSpec((bh, Lp, hd), lambda b, i: (b, 0, 0)),         # k
            pl.BlockSpec((bh, Lp, hd), lambda b, i: (b, 0, 0)),         # v
        ],
        out_specs=pl.BlockSpec((bh, block_q, hd), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Lp, hd), q.dtype),
        interpret=interpret,
    )(mask, qf, gf, lsef, dsum, kf, vf)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, block_q=block_q,
                          q_len=Lp, bh_block=bh),
        grid=(BH // bh, Lp // block_k),
        in_specs=[
            pl.BlockSpec((Lp, block_k), lambda b, i: (0, i)),           # mask
            pl.BlockSpec((bh, Lp, hd), lambda b, i: (b, 0, 0)),         # q
            pl.BlockSpec((bh, Lp, hd), lambda b, i: (b, 0, 0)),         # dO
            pl.BlockSpec((bh, Lp), lambda b, i: (b, 0)),                # lse
            pl.BlockSpec((bh, Lp), lambda b, i: (b, 0)),                # D
            pl.BlockSpec((bh, block_k, hd), lambda b, i: (b, i, 0)),    # k
            pl.BlockSpec((bh, block_k, hd), lambda b, i: (b, i, 0)),    # v
        ],
        out_specs=[
            pl.BlockSpec((bh, block_k, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((bh, block_k, hd), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Lp, hd), q.dtype),
            jax.ShapeDtypeStruct((BH, Lp, hd), q.dtype),
        ],
        interpret=interpret,
    )(mask, qf, gf, lsef, dsum, kf, vf)

    trim = lambda t: t.reshape(B, H, Lp, hd)[:, :, :L, :]
    return trim(dq), trim(dk), trim(dv)


def _pallas_available() -> bool:
    """Pallas TPU kernels only compile on TPU; CPU (tests, dryruns) falls
    back to the XLA path."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # backend not initialized yet
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_mha(q, k, v, mask, scale):
    """Differentiable masked attention: Pallas flash kernels for BOTH the
    forward and the backward on TPU (tile-streamed, no (L, L) HBM matrices);
    einsum forward/backward elsewhere."""
    if _pallas_available():
        return flash_attention(q, k, v, mask, scale)
    return mha_xla(q, k, v, scale, mask)


def _flash_mha_fwd(q, k, v, mask, scale):
    import os

    B, H, L, _ = q.shape
    # CONTROLVAR_FLASH_BWD=1 opts into the Pallas backward. It is sound
    # (interpret-mode gradient parity; compiles AND runs standalone at d16
    # train shapes) but embedding it in a depth-16 lax.scan HANGS this
    # image's remote Mosaic compiler (depth<=8 compiles fine - the hang
    # depends only on the scan trip count). Default to the einsum backward
    # until the toolchain is fixed.
    if (_pallas_available() and (B * H) % 8 == 0
            and os.environ.get("CONTROLVAR_FLASH_BWD", "0") == "1"):
        out, lse = flash_attention(q, k, v, mask, scale, return_lse=True)
        return out, (q, k, v, mask, out, lse)
    # einsum backward, but keep the Pallas FORWARD on TPU (no (L, L)
    # materialization in the fwd pass)
    out = flash_mha(q, k, v, mask, scale)
    return out, (q, k, v, mask, None, None)


def _flash_mha_bwd(scale, res, g):
    q, k, v, mask, out, lse = res
    if out is not None:
        dq, dk, dv = flash_attention_bwd(q, k, v, mask, out, lse, g, scale)
        return dq, dk, dv, None
    s = jnp.einsum("bhqd,bhkd->bhqk", q * jnp.asarray(scale, q.dtype), k)
    s = jnp.where(mask, s.astype(jnp.float32), NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v).astype(jnp.float32)
    pf = p.astype(jnp.float32)
    ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
    ds = ds.astype(q.dtype) * jnp.asarray(scale, q.dtype)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q)
    return dq, dk, dv, None


flash_mha.defvjp(_flash_mha_fwd, _flash_mha_bwd)
