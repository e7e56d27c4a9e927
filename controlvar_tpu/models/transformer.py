"""AdaLN self-attention transformer core, TPU-native.

One block type implementing the reference AdaLNSABlock semantics
(reference: models/basic_var.py:179-213): pre-norm (no affine) with
per-condition (gamma1, gamma2, scale1, scale2, shift1, shift2) modulation,
fused-QKV attention with zero-k-bias, 1/(sqrt(hd)*tau) scaling, optional
cosine attention with learnable per-head log scale clamped at ln(100)
(reference: basic_var.py:66-69,99-104), GELU(tanh) MLP.

TPU-first design decisions:
  * all `depth` blocks are STACKED along a leading axis and executed with
    `lax.scan` -> one compiled block body, fast compiles at depth 30;
  * training attention runs the Pallas flash kernel (ops/attention.py) over
    the whole pyramid sequence; decode uses a preallocated static-shape KV
    cache written with `dynamic_update_slice` at static per-scale offsets
    (vs. the reference's unbounded torch.cat cache, basic_var.py:106-108);
  * residual stream in bf16, LayerNorm statistics and softmax in fp32
    (mirrors the reference's autocast boundary).

Stacked params schema (leading dim = depth):
  qkv_kernel (D, C, 3C)   q_bias/v_bias (D, C)
  proj{kernel (D,C,C), bias (D,C)}   fc1{(D,C,hidden)}  fc2{(D,hidden,C)}
  ada_lin{kernel (D, Dc, 6C), bias (D, 6C)}   [or ada_gss (D, 6C) if shared]
  scale_mul (D, H)  [cos_attn only]
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from controlvar_tpu.config import VARConfig
from controlvar_tpu.ops.attention import flash_mha, mha_xla

Params = Dict

MAX_COS_SCALE = float(np.log(100.0))


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Affine-free LayerNorm with fp32 statistics."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _trunc_normal(key, shape, std):
    """torch.nn.init.trunc_normal_(std=s) semantics: truncation at ABSOLUTE
    ±2 (i.e. ±2/std in standardized space), which for the small stds used
    here (≤0.08 → ≥25σ bounds) is effectively an untruncated normal — NOT a
    ±2σ truncation (which would shrink the effective std by ~12%)."""
    a = 2.0 / std
    if a >= 10.0:  # tail mass < 1e-23: a plain normal is exact in practice
        return std * jax.random.normal(key, shape, jnp.float32)
    return std * jax.random.truncated_normal(key, -a, a, shape, jnp.float32)


def init_block_params(key: jax.Array, cfg: VARConfig) -> Params:
    """Init matching the reference's defaults + special_init depth scaling
    (reference: models/var.py:255-285, helpers.py:63-84)."""
    C, D = cfg.embed_dim, cfg.depth
    hidden = round(C * cfg.mlp_ratio)
    ks = jax.random.split(key, 8)
    std = 0.02
    p: Params = {
        "qkv_kernel": _trunc_normal(ks[0], (D, C, 3 * C), std),
        "q_bias": jnp.zeros((D, C), jnp.float32),
        "v_bias": jnp.zeros((D, C), jnp.float32),
        "proj": {
            "kernel": _trunc_normal(ks[1], (D, C, C), std) / np.sqrt(2 * D),
            "bias": jnp.zeros((D, C), jnp.float32),
        },
        "fc1": {
            "kernel": _trunc_normal(ks[2], (D, C, hidden), std),
            "bias": jnp.zeros((D, hidden), jnp.float32),
        },
        "fc2": {
            "kernel": _trunc_normal(ks[3], (D, hidden, C), std) / np.sqrt(2 * D),
            "bias": jnp.zeros((D, C), jnp.float32),
        },
    }
    if cfg.shared_aln:
        p["ada_gss"] = jax.random.normal(ks[4], (D, 6, C), jnp.float32) / np.sqrt(C)
        p["ada_gss"] = p["ada_gss"].at[:, :2].mul(cfg.aln_gamma_init)
        p["ada_gss"] = p["ada_gss"].at[:, 2:].mul(cfg.aln_init)
    else:
        w = _trunc_normal(ks[4], (D, cfg.embed_dim, 6 * C), std)
        # gamma rows scaled by aln_gamma_init, scale/shift rows by aln_init
        w = w.at[:, :, : 2 * C].mul(cfg.aln_gamma_init)
        w = w.at[:, :, 2 * C:].mul(cfg.aln_init)
        p["ada_lin"] = {"kernel": w, "bias": jnp.zeros((D, 6 * C), jnp.float32)}
    if cfg.cos_attn:
        p["scale_mul"] = jnp.full((D, cfg.num_heads), np.log(4.0), jnp.float32)
    return p


def _qkv(lp: Params, x: jnp.ndarray, cfg: VARConfig):
    """x (B, L, C) -> q, k, v each (B, H, L, hd); cos-attn normalization applied."""
    B, L, C = x.shape
    H, hd = cfg.num_heads, cfg.head_dim
    bias = jnp.concatenate(
        [lp["q_bias"], jnp.zeros_like(lp["q_bias"]), lp["v_bias"]], axis=-1
    )
    qkv = x @ lp["qkv_kernel"].astype(x.dtype) + bias.astype(x.dtype)
    qkv = qkv.reshape(B, L, 3, H, hd).transpose(2, 0, 3, 1, 4)  # (3, B, H, L, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]
    if cfg.cos_attn:
        sm = jnp.exp(jnp.minimum(lp["scale_mul"], MAX_COS_SCALE))  # (H,)
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        q = (qf / jnp.linalg.norm(qf, axis=-1, keepdims=True).clip(1e-12)
             * sm[None, :, None, None]).astype(x.dtype)
        k = (kf / jnp.linalg.norm(kf, axis=-1, keepdims=True).clip(1e-12)).astype(x.dtype)
    return q, k, v


def _adaln(lp: Params, cond_act: jnp.ndarray, shared_gss: Optional[jnp.ndarray],
           cfg: VARConfig):
    """cond_act = SiLU(cond) (B, Dc) -> six (B, 1, C) modulation tensors."""
    C = cfg.embed_dim
    if cfg.shared_aln:
        ada = lp["ada_gss"].reshape(1, 6, C) + shared_gss  # (B, 6, C)
    else:
        # compute in the kernel's dtype: bf16 when the caller pre-cast the
        # weights for decode (reference runs ada_lin under bf16 autocast too)
        k = lp["ada_lin"]["kernel"]
        ada = (cond_act.astype(k.dtype) @ k + lp["ada_lin"]["bias"].astype(k.dtype))
        ada = ada.astype(jnp.float32).reshape(-1, 6, C)
    g1, g2, s1, s2, sh1, sh2 = jnp.split(ada, 6, axis=1)  # each (B, 1, C)
    return g1, g2, s1, s2, sh1, sh2


def _ffn(lp: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = x @ lp["fc1"]["kernel"].astype(x.dtype) + lp["fc1"]["bias"].astype(x.dtype)
    h = jax.nn.gelu(h, approximate=True)
    return h @ lp["fc2"]["kernel"].astype(x.dtype) + lp["fc2"]["bias"].astype(x.dtype)


def _drop_path(key, x: jnp.ndarray, rate: jnp.ndarray) -> jnp.ndarray:
    """Per-sample stochastic depth (reference: models/helpers.py:39-46)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * (mask.astype(x.dtype) / keep.astype(x.dtype))


def blocks_forward(
    bp: Params,
    x: jnp.ndarray,
    cond: jnp.ndarray,
    cfg: VARConfig,
    mask: jnp.ndarray,
    *,
    train: bool = False,
    key: Optional[jax.Array] = None,
    use_flash: bool = True,
    shared_lin: Optional[Params] = None,
    remat: bool = True,
) -> jnp.ndarray:
    """Full-sequence forward through all stacked blocks via lax.scan.

    x: (B, L, C) residual stream (bf16 recommended); cond: (B, Dc) fp32;
    mask: (L, L) bool. shared_lin: model-level SharedAdaLin params when
    cfg.shared_aln (reference: var.py:82).

    remat: rematerialize the block body in the backward pass (saves only the
    per-layer residual stream instead of every intermediate — without it the
    d16 train step at B=8/L=1360 overflows a 16G chip on FFN activations).
    """
    cond_act = jax.nn.silu(cond.astype(jnp.float32))
    shared_gss = None
    if cfg.shared_aln:
        shared_gss = cond_act @ shared_lin["kernel"] + shared_lin["bias"]
        shared_gss = shared_gss.reshape(-1, 6, cfg.embed_dim)

    D = cfg.depth
    use_droppath = train and key is not None and cfg.drop_path_rate > 0
    dpr = jnp.linspace(0.0, cfg.drop_path_rate, D)
    if use_droppath:
        layer_keys = jax.random.split(key, 2 * D).reshape(D, 2)
    else:
        layer_keys = jnp.zeros((D, 1))

    scan_params = bp

    def body(h, inputs):
        lp, rate, lkeys = inputs
        g1, g2, s1, s2, sh1, sh2 = _adaln(lp, cond_act, shared_gss, cfg)
        hn = layer_norm(h, cfg.norm_eps)
        hn = (hn.astype(jnp.float32) * (s1 + 1.0) + sh1).astype(h.dtype)
        q, k, v = _qkv(lp, hn, cfg)
        scale = 1.0 if cfg.cos_attn else cfg.attn_scale
        if use_flash:
            o = flash_mha(q, k, v, mask, scale)
        else:
            o = mha_xla(q, k, v, scale, mask)
        B, H, L, hd = o.shape
        # named for the 'dots_attn' remat policy (no-op under other
        # policies): lets the backward reuse the attention output instead
        # of re-running the flash kernel — see _remat_wrap
        o = checkpoint_name(o, "attn_out")
        o = o.transpose(0, 2, 1, 3).reshape(B, L, H * hd)
        o = o @ lp["proj"]["kernel"].astype(o.dtype) + lp["proj"]["bias"].astype(o.dtype)
        o = (o.astype(jnp.float32) * g1).astype(h.dtype)
        if use_droppath:
            o = _drop_path(lkeys[0], o, rate)
        h = h + o
        hn = layer_norm(h, cfg.norm_eps)
        hn = (hn.astype(jnp.float32) * (s2 + 1.0) + sh2).astype(h.dtype)
        f = _ffn(lp, hn)
        f = (f.astype(jnp.float32) * g2).astype(h.dtype)
        if use_droppath:
            f = _drop_path(lkeys[1], f, rate)
        h = h + f
        return h, None

    body_fn = _remat_wrap(body) if (train and remat) else body
    chunk = _fwd_scan_chunk(D)
    if chunk >= D:
        x, _ = jax.lax.scan(body_fn, x, (scan_params, dpr, layer_keys))
        return x
    # Chunked layer scan: identical math (the scan is sequential either
    # way), but autodiff emits one BACKWARD scan per chunk with trip count
    # = chunk. The remote Mosaic compiler hangs on the Pallas flash
    # backward inside a scan with trip count > 8 (depth <= 8 compiles and
    # runs fine), so chunking at 8 makes CONTROLVAR_FLASH_BWD usable at
    # d16/d24/d30 — see ops/attention._flash_mha_fwd and PERF.md §6.
    for s in range(0, D, chunk):
        sl = jax.tree_util.tree_map(lambda a: a[s : s + chunk], scan_params)
        x, _ = jax.lax.scan(
            body_fn, x, (sl, dpr[s : s + chunk], layer_keys[s : s + chunk])
        )
    return x


def _remat_wrap(body):
    """Rematerialization policy for the per-layer train body
    (CONTROLVAR_REMAT, read at trace time; A/B: tools/remat_ab.py).

    full (default): save only the per-layer residual stream — everything
      else recomputes in the backward (~26% extra FLOPs, PERF.md §8).
    dots: jax.checkpoint_policies.dots_with_no_batch_dims_saveable —
      the qkv/proj/FFN weight-matmul outputs are saved across the
      backward (~200 MB/layer bf16 at d16 B=8 L=1360), deleting the
      recompute of the step's FLOP-heaviest ops.
    dots_attn: 'dots' plus the named attention output (checkpoint_name
      'attn_out' above, ~22 MB/layer), so the backward also skips
      re-running the flash forward kernel.

    The policy changes WHAT is saved, never the math: gradients are
    bitwise identical across modes (tests/test_transformer.py).
    """
    import os

    mode = os.environ.get("CONTROLVAR_REMAT", "full")
    if mode == "full":
        return jax.checkpoint(body)
    cp = jax.checkpoint_policies
    if mode == "dots":
        return jax.checkpoint(body, policy=cp.dots_with_no_batch_dims_saveable)
    if mode == "dots_attn":
        pol = cp.save_from_both_policies(
            cp.dots_with_no_batch_dims_saveable,
            cp.save_only_these_names("attn_out"))
        return jax.checkpoint(body, policy=pol)
    raise ValueError(f"CONTROLVAR_REMAT={mode!r}: want full|dots|dots_attn")


def _fwd_scan_chunk(depth: int) -> int:
    """Layer-scan chunk length for blocks_forward. CONTROLVAR_SCAN_CHUNK=n
    forces it; otherwise CONTROLVAR_FLASH_BWD=1 defaults to 8 (the largest
    trip count whose flash-backward scan this image's compiler accepts)."""
    import os

    c = int(os.environ.get("CONTROLVAR_SCAN_CHUNK", "0"))
    if c <= 0 and os.environ.get("CONTROLVAR_FLASH_BWD", "0") == "1":
        c = 8
    return c if c > 0 else depth


def _ablate_mode() -> str:
    """CONTROLVAR_ABLATE with a safety interlock: the hooks live on the
    PRODUCTION decode paths (they must, to measure anything — PERF.md §4's
    round-3 lesson), and an ablated trace produces garbage images with no
    other symptom. A stale env var in a shell must not silently corrupt
    sampling, so ablation additionally requires CONTROLVAR_ABLATE_OK=1
    (round-4 advisor finding); the measurement tools set both."""
    import os

    mode = os.environ.get("CONTROLVAR_ABLATE", "")
    if mode and os.environ.get("CONTROLVAR_ABLATE_OK", "0") != "1":
        raise RuntimeError(
            f"CONTROLVAR_ABLATE={mode!r} is set but CONTROLVAR_ABLATE_OK=1 "
            "is not: ablated decode traces produce garbage outputs by "
            "design. Set CONTROLVAR_ABLATE_OK=1 for timing runs, or unset "
            "CONTROLVAR_ABLATE."
        )
    return mode


def _mha_decode(q, kT, vT, scale, mask):
    """Decode attention over transposed caches.

    q: (B, H, l, hd); kT/vT: (B, H, hd, Lk). On TPU this runs the Pallas
    flash_decode kernel (whole kT/vT in VMEM, no HBM-materialized fp32
    logits); elsewhere the XLA einsum path with fp32 softmax.
    """
    from controlvar_tpu.ops.attention import NEG_INF, _pallas_available, flash_decode

    if _pallas_available():
        return flash_decode(q, kT.astype(q.dtype), vT.astype(q.dtype),
                            mask=mask, scale=scale)
    logits = jnp.einsum("bhqd,bhdk->bhqk", q * jnp.asarray(scale, q.dtype),
                        kT.astype(q.dtype))
    logits = logits.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhdk->bhqd", probs, vT.astype(q.dtype))


def kv_layout(cfg: VARConfig) -> str:
    """'paired': two hd=64 heads side by side on a 128-wide minor axis —
    cache rows are whole (8, 128) TPU tiles, so per-layer DUS writes and
    kernel reads are contiguous (the flat hd-minor layout writes 64-wide
    half-tiles; the L-minor layout pads hd 64->128, 2x memory). 'flat' is
    the fallback for odd head counts / non-64 head dims."""
    return "paired" if (cfg.head_dim == 64 and cfg.num_heads % 2 == 0) else "flat"


def kv_fused(cfg: VARConfig) -> bool:
    """True -> the STACKED decode cache stores K and V in ONE buffer with
    rows [k_pair (2hd) | v_pair (2hd)] on a 256-wide minor axis: one DUS
    write and one dynamic-slice read per layer instead of two each. The
    per-op overhead of those cache ops measured 84 ms/batch of DUS writes
    on the d16 headline (tools/chained_ablation.json: full 628 ms vs
    no_cache_write 544 ms), so halving their count looked like the lever.
    MEASURED NEGATIVE on v5e (default OFF, CONTROLVAR_KV_FUSED=1 opts in):
    25.11 img/s fused vs 25.47-25.54 paired on the d16 headline — the write
    cost is per LAYER-STEP (160 either way), not per DUS op (320 vs 160),
    i.e. XLA's carry-aliasing bookkeeping around any write+read of the
    carried buffer, not op dispatch. Numerics are bitwise identical (same
    dot operands, see ops/attention._decode_kernel_fused; equality-tested),
    so the layout is kept for toolchains where the trade differs. Applies
    only to the stacked carry-scan path (blocks_decode); seg/xs/unrolled
    variants keep the two-buffer paired layout."""
    import os as _os

    return (kv_layout(cfg) == "paired"
            and _os.environ.get("CONTROLVAR_KV_FUSED", "0") == "1")


def init_kv_cache(cfg: VARConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Preallocated K and V buffers; layout per kv_layout(cfg)/kv_fused(cfg):
      fused:  ONE (depth, B, H//2, L_max, 4*hd) buffer [k_pair | v_pair] and
              a shape-(0,) placeholder for the V slot (the samplers thread
              both slots opaquely)
      paired: (depth, B, H//2, L_max, 2*hd) x2
      flat:   (depth, B, H, hd, L_max) x2  (L last so tile padding hits L)

    max_len is rounded up to a multiple of 8 (TPU sublane) plus 8 slack
    rows: readers slice [:cur] so tail rows are invisible, and the in-place
    write+attend kernel (flash_decode_inplace) pads each fresh-row DMA to
    pos + ceil8(l), which can overrun an exact-length buffer by up to 7
    rows when a scale starts at an unaligned pos. Cost: < 1% of the cache.
    """
    max_len = -(-max_len // 8) * 8 + 8
    if kv_fused(cfg):
        shape = (cfg.depth, batch, cfg.num_heads // 2, max_len, 4 * cfg.head_dim)
        return jnp.zeros(shape, dtype), jnp.zeros((0,), dtype)
    if kv_layout(cfg) == "paired":
        shape = (cfg.depth, batch, cfg.num_heads // 2, max_len, 2 * cfg.head_dim)
    else:
        shape = (cfg.depth, batch, cfg.num_heads, cfg.head_dim, max_len)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def _pair_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, l, hd) -> (B, H//2, l, 2*hd) with heads 2i, 2i+1 side by side."""
    B, H, l, hd = x.shape
    return x.reshape(B, H // 2, 2, l, hd).transpose(0, 1, 3, 2, 4).reshape(
        B, H // 2, l, 2 * hd
    )


def _mha_decode_paired(q, kp, vp, scale, mask, use_pallas=None):
    """Decode attention over paired-head cache slices.

    q: (B, H, l, hd); kp/vp: (B, H//2, Lk, 2*hd). Pallas kernel on TPU
    (unless use_pallas=False); unpack + XLA softmax attention elsewhere."""
    from controlvar_tpu.ops.attention import (
        NEG_INF,
        _pallas_available,
        flash_decode_paired,
    )

    if use_pallas is None:
        use_pallas = _pallas_available()
    if use_pallas:
        return flash_decode_paired(q, kp.astype(q.dtype), vp.astype(q.dtype),
                                   mask=mask, scale=scale)
    B, H, l, hd = q.shape
    Lk = kp.shape[-2]
    unpack = lambda t: t.reshape(B, H // 2, Lk, 2, hd).transpose(
        0, 1, 3, 2, 4
    ).reshape(B, H, Lk, hd)
    k = unpack(kp).astype(q.dtype)
    v = unpack(vp).astype(q.dtype)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * jnp.asarray(scale, q.dtype), k)
    logits = logits.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _mha_decode_fused(q, kvp, scale, mask, use_pallas=None):
    """Decode attention over a fused [k_pair | v_pair] cache slice.

    q: (B, H, l, hd); kvp: (B, H//2, Lk, 4*hd). Pallas kernel on TPU;
    elsewhere split the columns and defer to the paired fallback (bitwise
    the same operands either way)."""
    from controlvar_tpu.ops.attention import _pallas_available, flash_decode_fused

    if use_pallas is None:
        use_pallas = _pallas_available()
    if use_pallas:
        return flash_decode_fused(q, kvp.astype(q.dtype), mask=mask,
                                  scale=scale)
    half = kvp.shape[-1] // 2
    return _mha_decode_paired(q, kvp[..., :half], kvp[..., half:], scale,
                              mask, use_pallas=False)


def _ada_all_layers(bp: Params, cond_act: jnp.ndarray, cfg: VARConfig,
                    shared_gss: Optional[jnp.ndarray]) -> jnp.ndarray:
    """(depth, B, 6, C) AdaLN modulations for ALL layers in one batched
    matmul — they depend only on the conditioning vector, so computing them
    per layer inside the decode loop wastes 16 poorly-tiled matmuls/step."""
    if cfg.shared_aln:
        return bp["ada_gss"][:, None] + shared_gss[None]
    k_ada = bp["ada_lin"]["kernel"]
    # compute in the kernel's dtype (bf16 when prepare_params pre-cast the
    # weights), exactly like the per-layer path
    ada = jnp.einsum(
        "bc,dce->dbe", cond_act.astype(k_ada.dtype), k_ada
    ).astype(jnp.float32) + bp["ada_lin"]["bias"].astype(jnp.float32)[:, None]
    return ada.reshape(cfg.depth, -1, 6, cfg.embed_dim)


def _decode_block_body(lp: Params, h: jnp.ndarray, ada: jnp.ndarray,
                       cfg: VARConfig, attn_fn) -> jnp.ndarray:
    """Shared per-layer decode body: AdaLN-modulated pre-norm -> fused QKV ->
    caller-supplied attention (cache handling differs between the scan and
    unrolled paths) -> gamma-gated residual -> modulated FFN residual."""
    g1, g2, s1, s2, sh1, sh2 = (
        a.reshape(-1, 1, cfg.embed_dim) for a in jnp.split(ada, 6, axis=1)
    )
    hn = layer_norm(h, cfg.norm_eps)
    hn = (hn.astype(jnp.float32) * (s1 + 1.0) + sh1).astype(h.dtype)
    q, k, v = _qkv(lp, hn, cfg)
    o = attn_fn(q, k, v)
    B, H, Lq, hd = o.shape
    o = o.transpose(0, 2, 1, 3).reshape(B, Lq, H * hd)
    o = o @ lp["proj"]["kernel"].astype(o.dtype) + lp["proj"]["bias"].astype(o.dtype)
    h = h + (o.astype(jnp.float32) * g1).astype(h.dtype)
    hn = layer_norm(h, cfg.norm_eps)
    hn = (hn.astype(jnp.float32) * (s2 + 1.0) + sh2).astype(h.dtype)
    f = _ffn(lp, hn)
    return h + (f.astype(jnp.float32) * g2).astype(h.dtype)


def blocks_decode(
    bp: Params,
    x: jnp.ndarray,
    cond: jnp.ndarray,
    cfg: VARConfig,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    pos: int,
    mask_slice: Optional[jnp.ndarray] = None,
    shared_lin: Optional[Params] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One KV-cached decode step over all blocks.

    x: (B, l, C) new tokens of the current scale; pos: static write offset.
    mask_slice: optional (l, pos + l) bool mask (ControlVAR `indep` decode,
    reference: control_var.py:497-498); None = attend to everything cached.
    Returns (y, new_cache_k, new_cache_v).
    """
    l = x.shape[1]
    cur = pos + l
    cond_act = jax.nn.silu(cond.astype(jnp.float32))
    shared_gss = None
    if cfg.shared_aln:
        shared_gss = cond_act @ shared_lin["kernel"] + shared_lin["bias"]
        shared_gss = shared_gss.reshape(-1, 6, cfg.embed_dim)
    ada_all = _ada_all_layers(bp, cond_act, cfg, shared_gss)

    # The full (depth, ...) caches ride in the scan CARRY and are updated with
    # per-layer dynamic slices: XLA aliases carries in place, so only ONE cache
    # buffer exists across the whole unrolled multi-scale decode (threading
    # them through xs/ys made XLA keep compressed+uncompressed copies and OOM
    # at 2B=64 on a 16G chip). NOTE: the dynamic_slice READ feeding the
    # attention kernel still breaks aliasing — prefer blocks_decode_unrolled
    # on the hot path (stepwise samplers route there via blocks_decode_any).
    paired = kv_layout(cfg) == "paired"
    scale = 1.0 if cfg.cos_attn else cfg.attn_scale
    # CONTROLVAR_ABLATE: TIMING-ONLY ablations (outputs are garbage), same
    # contract as blocks_decode_unrolled's hooks. This scan path is the
    # production decode (the unrolled path is toolchain-blocked, see
    # decode_caches), so the attention/cache re-attribution campaign must
    # ablate HERE to measure anything. Read at trace time.
    import os as _os

    ablate = _ablate_mode()
    # CONTROLVAR_DECODE_KERNEL=0: XLA einsum attention instead of the Pallas
    # decode kernel (same escape hatch the unrolled path has). Production
    # default stays Pallas; the XLA path materializes an unpacked cache copy
    # per layer (documented OOM risk at the largest scales).
    _use_pallas = None if _os.environ.get(
        "CONTROLVAR_DECODE_KERNEL", "1") != "0" else False
    # CONTROLVAR_XLA_SMALL=<Lk>: mixed dispatch — steps whose total prefix
    # (cur, static per trace) is <= the threshold take the XLA einsum path
    # (fuses into the scan body: no kernel launch, and the cache
    # unpack/relayout that sinks the XLA path at large Lk is cheap here);
    # bigger steps keep the Pallas kernel. 0 (default) = always Pallas.
    # Rationale: §3 of PERF.md attributes ~0.7 ms/layer-step of FIXED kernel
    # launch cost; at the 7 smallest scales that overhead rivals the math.
    if _use_pallas is None and cur <= int(
            _os.environ.get("CONTROLVAR_XLA_SMALL", "0")):
        _use_pallas = False

    # fused single-buffer cache (see kv_fused): discriminate on the buffer
    # itself so behavior follows the data, not the env at this trace point
    fused = cache_v.ndim == 1

    # CONTROLVAR_INPLACE_DECODE=1: fused write+attend — ONE pallas launch per
    # layer-step writes the fresh K/V rows into the stacked cache (aliased
    # in/out, manual DMA) AND attends over [prefix | fresh]. Deletes both
    # per-layer DUS writes (84 ms/batch of carry bookkeeping, PERF.md §3)
    # and the dynamic_slice cache read. Paired layout, unmasked decode only
    # (`indep` keeps the split path). Numerics: same two-tile joint softmax
    # as flash_decode_prefix (PERF.md round-5 A/B).
    from controlvar_tpu.ops.attention import _pallas_available

    inplace = (
        _os.environ.get("CONTROLVAR_INPLACE_DECODE", "0") == "1"
        and paired and not fused and mask_slice is None
        and ablate == "" and _use_pallas is not False
    )
    inplace_interpret = inplace and not _pallas_available()

    def body(carry, inputs):
        h, ck, cv = carry
        li, lp, ada = inputs
        box = {}

        def attn_fn(q, k, v):
            ck, cv = carry[1], carry[2]
            if ablate == "no_attn":
                box["ck"], box["cv"] = ck, cv
                return q
            if inplace:
                from controlvar_tpu.ops.attention import flash_decode_inplace

                kp = _pair_heads(k).astype(ck.dtype)
                vp = _pair_heads(v).astype(cv.dtype)
                o, ck, cv = flash_decode_inplace(
                    q, ck, cv, kp, vp, li, pos, scale=scale,
                    interpret=inplace_interpret)
                box["ck"], box["cv"] = ck, cv
                return o
            if fused:
                kvp = jnp.concatenate(
                    [_pair_heads(k), _pair_heads(v)], axis=-1
                ).astype(ck.dtype)                     # (B, H/2, l, 4hd)
                if ablate != "no_cache_write":
                    ck = jax.lax.dynamic_update_slice(
                        ck, kvp[None], (li, 0, 0, pos, 0))
                if ablate == "attn_nocache":
                    o = _mha_decode_fused(
                        q, kvp, scale, mask_slice if pos == 0 else None,
                        use_pallas=_use_pallas)
                else:
                    kv_all = jax.lax.dynamic_slice_in_dim(
                        ck, li, 1, axis=0)[0, :, :, :cur]
                    o = _mha_decode_fused(q, kv_all, scale, mask_slice,
                                          use_pallas=_use_pallas)
                box["ck"], box["cv"] = ck, cv
                return o
            if paired:
                kp = _pair_heads(k).astype(ck.dtype)   # (B, H/2, l, 2hd)
                vp = _pair_heads(v).astype(cv.dtype)
                if ablate != "no_cache_write":
                    ck = jax.lax.dynamic_update_slice(ck, kp[None], (li, 0, 0, pos, 0))
                    cv = jax.lax.dynamic_update_slice(cv, vp[None], (li, 0, 0, pos, 0))
                if ablate == "attn_nocache":
                    # current-scale tokens only: no prefix read, no
                    # dynamic_slice of the carried cache (writes kept above)
                    o = _mha_decode_paired(
                        q, kp, vp, scale, mask_slice if pos == 0 else None,
                        use_pallas=_use_pallas)
                    box["ck"], box["cv"] = ck, cv
                    return o
                k_all = jax.lax.dynamic_slice_in_dim(ck, li, 1, axis=0)[0, :, :, :cur]
                v_all = jax.lax.dynamic_slice_in_dim(cv, li, 1, axis=0)[0, :, :, :cur]
                o = _mha_decode_paired(q, k_all, v_all, scale, mask_slice,
                                       use_pallas=_use_pallas)
            else:
                kT = k.transpose(0, 1, 3, 2).astype(ck.dtype)  # (B, H, hd, l)
                vT = v.transpose(0, 1, 3, 2).astype(cv.dtype)
                ck = jax.lax.dynamic_update_slice(ck, kT[None], (li, 0, 0, 0, pos))
                cv = jax.lax.dynamic_update_slice(cv, vT[None], (li, 0, 0, 0, pos))
                k_all = jax.lax.dynamic_slice_in_dim(ck, li, 1, axis=0)[0, ..., :cur]
                v_all = jax.lax.dynamic_slice_in_dim(cv, li, 1, axis=0)[0, ..., :cur]
                o = _mha_decode(q, k_all, v_all, scale, mask_slice)
            box["ck"], box["cv"] = ck, cv
            return o

        h = _decode_block_body(lp, h, ada, cfg, attn_fn)
        return (h, box["ck"], box["cv"]), None

    layer_idx = jnp.arange(cfg.depth, dtype=jnp.int32)
    (x, new_k, new_v), _ = jax.lax.scan(
        body, (x, cache_k, cache_v), (layer_idx, bp, ada_all)
    )
    return x, new_k, new_v


def blocks_decode_inv(
    bp: Params,
    x: jnp.ndarray,
    cond: jnp.ndarray,
    cfg: VARConfig,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    pos: int,
    mask_slice: Optional[jnp.ndarray] = None,
    shared_lin: Optional[Params] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step with the caches LOOP-INVARIANT in the layer scan
    (attempt 5 on the carry-aliasing pathology; paired layout, no mask).

    Within one scale step the cache prefix [:pos] is read-only — each layer
    reads only rows written at PREVIOUS scale steps — so the caches need not
    ride the scan carry at all: the body closes over them, dynamic-slices
    layer li's prefix rows [:pos_p] (pos_p = ceil8(pos); the materialized
    slice is the same buffer the Pallas prefix kernel would read anyway),
    attends over [prefix | fresh] with flash_decode_prefix (proven in the
    seg path), and emits the fresh K/V pairs as ys. After the scan, ONE
    dynamic_update_slice per cache writes all layers' fresh rows at the
    static offset. This deletes the 320 in-scan DUS ops/batch whose XLA
    carry bookkeeping measured 84 ms on the d16 headline (PERF.md §3) at
    the price of 20 post-scan DUS ops and the per-layer prefix slice
    materialization the carry path already paid.
    """
    assert kv_layout(cfg) == "paired"
    import os as _os

    from controlvar_tpu.ops.attention import (
        _pallas_available,
        flash_decode_prefix,
    )

    cond_act = jax.nn.silu(cond.astype(jnp.float32))
    shared_gss = None
    if cfg.shared_aln:
        shared_gss = cond_act @ shared_lin["kernel"] + shared_lin["bias"]
        shared_gss = shared_gss.reshape(-1, 6, cfg.embed_dim)
    ada_all = _ada_all_layers(bp, cond_act, cfg, shared_gss)
    # honor the same escape hatch the other decode paths expose
    use_kernel = (_pallas_available()
                  and _os.environ.get("CONTROLVAR_DECODE_KERNEL", "1") != "0")
    scale = 1.0 if cfg.cos_attn else cfg.attn_scale
    pos_p = -(-pos // 8) * 8

    def body(h, inputs):
        li, lp, ada = inputs
        box = {}

        def attn_fn(q, k, v):
            kp = _pair_heads(k).astype(cache_k.dtype)
            vp = _pair_heads(v).astype(cache_v.dtype)
            if pos == 0:
                o = _mha_decode_paired(q, kp, vp, scale, mask_slice)
            else:
                k_pre = jax.lax.dynamic_slice_in_dim(
                    cache_k, li, 1, axis=0)[0, :, :, :pos_p]
                v_pre = jax.lax.dynamic_slice_in_dim(
                    cache_v, li, 1, axis=0)[0, :, :, :pos_p]
                if use_kernel:
                    o = flash_decode_prefix(q, k_pre, v_pre, kp, vp, pos,
                                            mask=mask_slice, scale=scale)
                else:
                    k_all = jnp.concatenate([k_pre[:, :, :pos], kp], axis=2)
                    v_all = jnp.concatenate([v_pre[:, :, :pos], vp], axis=2)
                    o = _mha_decode_paired(q, k_all, v_all, scale, mask_slice)
            box["kp"], box["vp"] = kp, vp
            return o

        h = _decode_block_body(lp, h, ada, cfg, attn_fn)
        return h, (box["kp"], box["vp"])

    layer_idx = jnp.arange(cfg.depth, dtype=jnp.int32)
    x, (kps, vps) = jax.lax.scan(body, x, (layer_idx, bp, ada_all))
    cache_k = jax.lax.dynamic_update_slice(cache_k, kps, (0, 0, 0, pos, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, vps, (0, 0, 0, pos, 0))
    return x, cache_k, cache_v


def blocks_decode_xs(
    bp: Params,
    x: jnp.ndarray,
    cond: jnp.ndarray,
    cfg: VARConfig,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    pos: int,
    mask_slice: Optional[jnp.ndarray] = None,
    shared_lin: Optional[Params] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step with the caches as scan XS inputs (attempt 3 on the
    carry-aliasing pathology; paired layout only). MEASURED SLOWER than the
    carry scan (17.1 vs 20.9 img/s on the d16 headline): the per-iteration
    xs slice materializes each layer's (B, H/2, L_max, 2hd) cache block
    before the kernel reads it — a full extra cache read+write per scale
    step — whereas the carry path only pays aliasing-break copies on the
    written columns. Kept (off by default, CONTROLVAR_XS_DECODE=1) as the
    documented negative result; see PERF.md.

    `blocks_decode` carries the stacked caches through the layer scan and
    both writes (DUS) and reads (dynamic_slice -> Pallas) them per layer;
    the read of a carried buffer breaks XLA's in-place carry aliasing and
    copies multi-GB cache buffers every scale step (~150-200 ms/batch at
    d16 B=16). Here the caches are scan xs: each iteration receives ITS
    layer's buffer as a read-only input slice (no write-read conflict), the
    fresh K/V segments leave through ys, and ONE static-offset
    dynamic_update_slice per cache writes all layers after the scan — on
    donated inputs that write is in-place. Attention over [prefix | fresh]
    uses the zero-copy Pallas prefix kernel (ops/attention.py
    flash_decode_prefix); pos == 0 skips the prefix entirely.
    """
    assert kv_layout(cfg) == "paired"
    from controlvar_tpu.ops.attention import _pallas_available, flash_decode_prefix

    cond_act = jax.nn.silu(cond.astype(jnp.float32))
    shared_gss = None
    if cfg.shared_aln:
        shared_gss = cond_act @ shared_lin["kernel"] + shared_lin["bias"]
        shared_gss = shared_gss.reshape(-1, 6, cfg.embed_dim)
    ada_all = _ada_all_layers(bp, cond_act, cfg, shared_gss)
    use_kernel = _pallas_available()
    scale = 1.0 if cfg.cos_attn else cfg.attn_scale

    def body(h, inputs):
        lp, ada, ck_l, cv_l = inputs  # ck_l/cv_l: (B, H//2, L_max, 2hd)
        box = {}

        def attn_fn(q, k, v):
            kp = _pair_heads(k).astype(ck_l.dtype)
            vp = _pair_heads(v).astype(cv_l.dtype)
            if pos == 0:
                o = _mha_decode_paired(q, kp, vp, scale, mask_slice)
            elif use_kernel:
                o = flash_decode_prefix(q, ck_l, cv_l, kp, vp, pos,
                                        mask=mask_slice, scale=scale)
            else:
                k_all = jnp.concatenate([ck_l[:, :, :pos], kp], axis=2)
                v_all = jnp.concatenate([cv_l[:, :, :pos], vp], axis=2)
                o = _mha_decode_paired(q, k_all, v_all, scale, mask_slice)
            box["kp"], box["vp"] = kp, vp
            return o

        h = _decode_block_body(lp, h, ada, cfg, attn_fn)
        return h, (box["kp"], box["vp"])

    x, (kps, vps) = jax.lax.scan(body, x, (bp, ada_all, cache_k, cache_v))
    cache_k = jax.lax.dynamic_update_slice(cache_k, kps, (0, 0, 0, pos, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, vps, (0, 0, 0, pos, 0))
    return x, cache_k, cache_v


def blocks_decode_seg(
    bp: Params,
    x: jnp.ndarray,
    cond: jnp.ndarray,
    cfg: VARConfig,
    segs_k: Tuple[jnp.ndarray, ...],
    segs_v: Tuple[jnp.ndarray, ...],
    mask_slice: Optional[jnp.ndarray] = None,
    shared_lin: Optional[Params] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step over SEGMENTED per-scale caches (attempt 4 on the
    carry-aliasing pathology; paired layout only).

    Instead of one preallocated (depth, B, H/2, L_max, 2hd) cache updated
    in place, every scale's K/V lives in its own (depth, B, H/2, l_s, 2hd)
    array: segs_k/segs_v hold the previous scales' segments. The layer scan
    reads them as xs (per-layer slices feed a concat of exactly the LIVE
    prefix — Σ cur ≈ 2060 rows over a d16 decode vs 10 x 1360 full-buffer
    rows for any whole-cache copy) and emits this scale's fresh K/V as ys.
    There are NO dynamic_update_slice writes and NO carried cache buffers,
    so XLA's scan-carry aliasing pathology (~150-200 ms/batch of cache
    copies, PERF.md §4) cannot occur — the only extra traffic is the
    prefix-concat write. Attention runs the Pallas prefix kernel over
    [concat prefix | fresh].

    Returns (y, k_seg, v_seg) where k_seg/v_seg (depth, B, H/2, l, 2hd) are
    this scale's segments for the caller to append to segs_k/segs_v.
    """
    assert kv_layout(cfg) == "paired"
    from controlvar_tpu.ops.attention import _pallas_available, flash_decode_prefix

    pos = sum(int(s.shape[-2]) for s in segs_k)
    cond_act = jax.nn.silu(cond.astype(jnp.float32))
    shared_gss = None
    if cfg.shared_aln:
        shared_gss = cond_act @ shared_lin["kernel"] + shared_lin["bias"]
        shared_gss = shared_gss.reshape(-1, 6, cfg.embed_dim)
    ada_all = _ada_all_layers(bp, cond_act, cfg, shared_gss)
    use_kernel = _pallas_available()
    scale = 1.0 if cfg.cos_attn else cfg.attn_scale
    pos_p = -(-pos // 8) * 8  # prefix padded to sublane alignment in-body

    def body(h, inputs):
        lp, ada, sk, sv = inputs  # sk/sv: tuples of (B, H//2, l_s, 2hd)
        box = {}

        def attn_fn(q, k, v):
            kp = _pair_heads(k).astype(x.dtype)
            vp = _pair_heads(v).astype(x.dtype)
            if pos == 0:
                o = _mha_decode_paired(q, kp, vp, scale, mask_slice)
            elif use_kernel:
                pad = [(0, 0), (0, 0), (0, pos_p - pos), (0, 0)]
                k_pre = jnp.pad(jnp.concatenate(sk, axis=2), pad)
                v_pre = jnp.pad(jnp.concatenate(sv, axis=2), pad)
                o = flash_decode_prefix(q, k_pre, v_pre, kp, vp, pos,
                                        mask=mask_slice, scale=scale)
            else:
                k_all = jnp.concatenate(sk + (kp,), axis=2)
                v_all = jnp.concatenate(sv + (vp,), axis=2)
                o = _mha_decode_paired(q, k_all, v_all, scale, mask_slice)
            box["kp"], box["vp"] = kp, vp
            return o

        h = _decode_block_body(lp, h, ada, cfg, attn_fn)
        return h, (box["kp"], box["vp"])

    x, (kps, vps) = jax.lax.scan(body, x, (bp, ada_all, segs_k, segs_v))
    return x, kps, vps


def init_kv_cache_layers(cfg: VARConfig, batch: int, max_len: int,
                         dtype=jnp.bfloat16):
    """Per-layer paired caches: two tuples of `depth` buffers, each
    (B, H//2, L_max, 2*hd).

    Separate per-layer buffers (vs one stacked array) let the unrolled
    decode hand each layer's WHOLE buffer to the attention kernel — no
    dynamic_slice copy — while static-index DUS writes stay in-place."""
    assert kv_layout(cfg) == "paired"
    shape = (batch, cfg.num_heads // 2, max_len, 2 * cfg.head_dim)
    ck = tuple(jnp.zeros(shape, dtype) for _ in range(cfg.depth))
    cv = tuple(jnp.zeros(shape, dtype) for _ in range(cfg.depth))
    return ck, cv


def blocks_decode_unrolled(
    bp: Params,
    x: jnp.ndarray,
    cond: jnp.ndarray,
    cfg: VARConfig,
    cache_k,
    cache_v,
    pos: int,
    mask_slice: Optional[jnp.ndarray] = None,
    shared_lin: Optional[Params] = None,
):
    """One decode step, python-unrolled over layers with per-layer caches.

    cache_k/cache_v: tuples from init_kv_cache_layers. Two measured XLA
    pathologies of the scan-based `blocks_decode` motivate this variant:
    a dynamic_slice READ of the carried stacked cache feeding the attention
    kernel breaks in-place carry aliasing (~86 ms/step of cache copies at
    the final d16 scale), and the traced layer index adds DUS overhead.
    Here layer indices are static, writes are in-place `dynamic_update_slice`
    on donated per-layer buffers, and on TPU the Pallas prefix kernel
    (`flash_decode_prefix`) reads each layer's cache buffer whole —
    zero-copy. Compile time grows (depth x body), acceptable for the
    per-scale stepwise jits.

    Returns (y, new_cache_k, new_cache_v) with the same tuple structure.
    """
    import os

    from controlvar_tpu.ops.attention import (
        _pallas_available,
        flash_decode_prefix,
    )

    l = x.shape[1]
    cond_act = jax.nn.silu(cond.astype(jnp.float32))
    shared_gss = None
    if cfg.shared_aln:
        shared_gss = cond_act @ shared_lin["kernel"] + shared_lin["bias"]
        shared_gss = shared_gss.reshape(-1, 6, cfg.embed_dim)
    ada_all = _ada_all_layers(bp, cond_act, cfg, shared_gss)

    # CONTROLVAR_DECODE_KERNEL=0: escape hatch to the pure-XLA concat path
    kernels_enabled = os.environ.get("CONTROLVAR_DECODE_KERNEL", "1") != "0"
    use_kernel = _pallas_available() and kernels_enabled
    # CONTROLVAR_ABLATE: TIMING-ONLY ablations for the attention/cache
    # re-attribution campaign (PERF.md §3; outputs are garbage, never set
    # in production). Read at trace time:
    #   no_attn        o = q; no cache ops at all (kernel+read+write+layout)
    #   no_cache_write full attention incl. prefix read, skip the DUS writes
    #   attn_nocache   attend to the current scale only (no prefix read),
    #                  writes kept
    ablate = _ablate_mode()
    scale = 1.0 if cfg.cos_attn else cfg.attn_scale
    h = x
    ck_out = list(cache_k)
    cv_out = list(cache_v)
    for li in range(cfg.depth):
        lp = jax.tree_util.tree_map(lambda a: a[li], bp)

        def attn_fn(q, k, v, li=li):
            if ablate == "no_attn":
                return q
            kp = _pair_heads(k).astype(ck_out[li].dtype)   # (B, H/2, l, 2hd)
            vp = _pair_heads(v).astype(cv_out[li].dtype)
            if pos == 0 or ablate == "attn_nocache":
                o = _mha_decode_paired(
                    q, kp, vp, scale, mask_slice if pos == 0 else None,
                    use_pallas=None if kernels_enabled else False)
            elif use_kernel:
                o = flash_decode_prefix(q, ck_out[li], cv_out[li], kp, vp,
                                        pos, mask=mask_slice, scale=scale)
            else:
                k_all = jnp.concatenate([ck_out[li][:, :, :pos], kp], axis=2)
                v_all = jnp.concatenate([cv_out[li][:, :, :pos], vp], axis=2)
                o = _mha_decode_paired(
                    q, k_all, v_all, scale, mask_slice,
                    use_pallas=None if kernels_enabled else False)
            if ablate != "no_cache_write":
                ck_out[li] = jax.lax.dynamic_update_slice(ck_out[li], kp,
                                                          (0, 0, pos, 0))
                cv_out[li] = jax.lax.dynamic_update_slice(cv_out[li], vp,
                                                          (0, 0, pos, 0))
            return o

        h = _decode_block_body(lp, h, ada_all[li], cfg, attn_fn)
    return h, tuple(ck_out), tuple(cv_out)


def decode_caches(cfg: VARConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16):
    """Decode caches for the stepwise samplers.

    Default: stacked arrays -> scan-based blocks_decode. The per-layer-tuple
    unrolled path (CONTROLVAR_UNROLLED_DECODE=1) eliminates the scan
    carry's dynamic_slice cache-read copies, but on this image's remote
    Mosaic toolchain it compiles pathologically (411 s for a DEPTH-2 step;
    depth 16 crashes the compile helper) and its runtime per layer measured
    no better than the scan path - kept for toolchains where embedding
    pallas calls in large unrolled programs compiles sanely."""
    import os

    unrolled = os.environ.get("CONTROLVAR_UNROLLED_DECODE", "0") == "1"
    if unrolled and kv_layout(cfg) == "paired":
        return init_kv_cache_layers(cfg, batch, max_len, dtype)
    return init_kv_cache(cfg, batch, max_len, dtype)


def blocks_decode_any(bp, x, cond, cfg, cache_k, cache_v, pos,
                      mask_slice=None, shared_lin=None):
    """Dispatch on the cache structure: per-layer tuples -> unrolled path,
    stacked arrays -> xs-scan path (paired layout) or carry-scan fallback.
    CONTROLVAR_XS_DECODE=0 forces the carry-scan path for A/B timing."""
    import os

    if isinstance(cache_k, tuple):
        return blocks_decode_unrolled(bp, x, cond, cfg, cache_k, cache_v,
                                      pos, mask_slice=mask_slice,
                                      shared_lin=shared_lin)
    # invariant-cache decode (attempt 5, see blocks_decode_inv). The
    # ablation hooks live only on the carry path, so an active
    # CONTROLVAR_ABLATE forces the carry route — otherwise every ablation
    # arm would silently run the identical full inv decode and measure
    # nothing (round-5 review finding).
    inv_ok = (os.environ.get("CONTROLVAR_INV_DECODE", "0") == "1"
              and not _ablate_mode())
    if inv_ok and kv_layout(cfg) == "paired" and cache_v.ndim != 1:
        return blocks_decode_inv(bp, x, cond, cfg, cache_k, cache_v, pos,
                                 mask_slice=mask_slice, shared_lin=shared_lin)
    # default OFF: measured 17.1 vs 20.9 img/s on the d16 headline — the xs
    # slices add a full cache read+write per scale step (~160 ms/batch),
    # MORE than the carry path's aliasing-break copies. See PERF.md attempt 3.
    xs_ok = os.environ.get("CONTROLVAR_XS_DECODE", "0") == "1"
    if xs_ok and kv_layout(cfg) == "paired" and cache_v.ndim != 1:
        return blocks_decode_xs(bp, x, cond, cfg, cache_k, cache_v, pos,
                                mask_slice=mask_slice, shared_lin=shared_lin)
    return blocks_decode(bp, x, cond, cfg, cache_k, cache_v, pos,
                         mask_slice=mask_slice, shared_lin=shared_lin)


def init_kv_cache_grow(cfg: VARConfig, batch: int,
                       dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Empty (depth, B, H, hd, 0) growing caches for blocks_decode_grow."""
    shape = (cfg.depth, batch, cfg.num_heads, cfg.head_dim, 0)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def blocks_decode_grow(
    bp: Params,
    x: jnp.ndarray,
    cond: jnp.ndarray,
    cfg: VARConfig,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    mask_slice: Optional[jnp.ndarray] = None,
    shared_lin: Optional[Params] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode step over GROWING caches (exact lengths, no L_max buffer).

    Caches (depth, B, H, hd, cur_prev) grow to cur_prev + l by concat:
    attention reads exactly the live keys and there are no O(L_max)
    dynamic-update-slice copies per layer (measured ~30ms/scale with the
    preallocated cache). Compiling this per scale (eval/stepwise.py) keeps
    each XLA program small; inside ONE fused jit the 10 chained growing
    scans make XLA's compile time pathological — use `blocks_decode` there.
    """
    cond_act = jax.nn.silu(cond.astype(jnp.float32))
    shared_gss = None
    if cfg.shared_aln:
        shared_gss = cond_act @ shared_lin["kernel"] + shared_lin["bias"]
        shared_gss = shared_gss.reshape(-1, 6, cfg.embed_dim)

    def body(h, inputs):
        lp, ck, cv = inputs  # (B, H, hd, cur_prev)
        g1, g2, s1, s2, sh1, sh2 = _adaln(lp, cond_act, shared_gss, cfg)
        hn = layer_norm(h, cfg.norm_eps)
        hn = (hn.astype(jnp.float32) * (s1 + 1.0) + sh1).astype(h.dtype)
        q, k, v = _qkv(lp, hn, cfg)
        kT = k.transpose(0, 1, 3, 2).astype(ck.dtype)
        vT = v.transpose(0, 1, 3, 2).astype(cv.dtype)
        k_all = jnp.concatenate([ck, kT], axis=-1)
        v_all = jnp.concatenate([cv, vT], axis=-1)
        scale = 1.0 if cfg.cos_attn else cfg.attn_scale
        o = _mha_decode(q, k_all, v_all, scale, mask_slice)
        B, H, Lq, hd = o.shape
        o = o.transpose(0, 2, 1, 3).reshape(B, Lq, H * hd)
        o = o @ lp["proj"]["kernel"].astype(o.dtype) + lp["proj"]["bias"].astype(o.dtype)
        h = h + (o.astype(jnp.float32) * g1).astype(h.dtype)
        hn = layer_norm(h, cfg.norm_eps)
        hn = (hn.astype(jnp.float32) * (s2 + 1.0) + sh2).astype(h.dtype)
        f = _ffn(lp, hn)
        h = h + (f.astype(jnp.float32) * g2).astype(h.dtype)
        return h, (k_all, v_all)

    x, (new_k, new_v) = jax.lax.scan(body, x, (bp, cache_k, cache_v))
    return x, new_k, new_v


# ----------------------------------------------------------------------------
# AdaLN-before-head (shared by VAR and ControlVAR)
# ----------------------------------------------------------------------------

def init_head_params(key: jax.Array, cfg: VARConfig, head_vocab: int) -> Params:
    k1, k2 = jax.random.split(key)
    C = cfg.embed_dim
    w = _trunc_normal(k1, (cfg.embed_dim, 2 * C), 0.02) * cfg.aln_init
    return {
        "head_nm": {"ada_lin": {"kernel": w, "bias": jnp.zeros((2 * C,), jnp.float32)}},
        "head": {
            "kernel": _trunc_normal(k2, (C, head_vocab), 0.02),
            "bias": jnp.zeros((head_vocab,), jnp.float32),
        },
    }


def head_logits(p: Params, x: jnp.ndarray, cond: jnp.ndarray,
                cfg: VARConfig) -> jnp.ndarray:
    """AdaLN-modulated LN then vocab projection, fp32
    (reference: models/var.py:294-303 AdaLNBeforeHead + get_logits)."""
    cond_act = jax.nn.silu(cond.astype(jnp.float32))
    ada = cond_act @ p["head_nm"]["ada_lin"]["kernel"] + p["head_nm"]["ada_lin"]["bias"]
    scale, shift = jnp.split(ada.reshape(-1, 2, cfg.embed_dim), 2, axis=1)
    h = layer_norm(x.astype(jnp.float32), cfg.norm_eps)
    h = h * (scale + 1.0) + shift
    return h @ p["head"]["kernel"] + p["head"]["bias"]


def head_logits_cfg(p: Params, x: jnp.ndarray, cond: jnp.ndarray,
                    cfg: VARConfig, weights) -> jnp.ndarray:
    """CFG-combined head logits in ONE reduced matmul.

    x: (R*B, seg, C) final hidden states of the R CFG branches; weights: R
    static floats with sum(weights) == 1 (all reference CFG formulas satisfy
    this: 2-way (1+t, -t), 3-way, 4-way — control_var.py:288-307).
    Because the vocab projection is linear and the CFG combine is a linear
    row mix,  sum_i w_i (h_i @ W + b) == (sum_i w_i h_i) @ W + b.  Only the
    per-branch AdaLN-LN (nonlinear, per-row cond) runs at R*B rows; the
    C x V head matmul and the fp32 logits tensor shrink R-fold — at the d16
    final scale this avoids materializing a (64, 512, V) fp32 tensor.
    Numerics: same operations reassociated; differs from combine-after-head
    by fp32 rounding only (validated <= 2e-3 abs in tests)."""
    assert abs(sum(weights) - 1.0) < 1e-6
    R = len(weights)
    B = x.shape[0] // R
    cond_act = jax.nn.silu(cond.astype(jnp.float32))
    ada = cond_act @ p["head_nm"]["ada_lin"]["kernel"] + p["head_nm"]["ada_lin"]["bias"]
    scale, shift = jnp.split(ada.reshape(-1, 2, cfg.embed_dim), 2, axis=1)
    h = layer_norm(x.astype(jnp.float32), cfg.norm_eps)
    h = h * (scale + 1.0) + shift                       # (R*B, seg, C)
    w = jnp.asarray(weights, jnp.float32)
    hc = jnp.einsum("r,rbsc->bsc", w, h.reshape(R, B, *h.shape[1:]))
    return hc @ p["head"]["kernel"] + p["head"]["bias"]
