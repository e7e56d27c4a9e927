"""Sort-free top-k / top-p sampling: per-row bisection + gumbel-max, Pallas.

The sort path (`ops/sampling.py:filtered_sorted_logits`) pays ~log2(V)^2
bitonic stages of cross-lane permutes per 4096-wide row — measured ~55 ms of
the d16 conditional decode batch. This kernel replaces the order statistics
with per-row BISECTION on the two monotone step functions the filters
actually need:

  top-k :  count(l >= t)            — find the k-th largest value t_k
  top-p :  sum of softmax mass of entries strictly above v — find the
           nucleus boundary value (torch semantics: the crossing token is
           kept; reference models/helpers.py:6-19)

then draws via gumbel-max over the kept set (distribution-identical to a
categorical over the kept logits; noise is a host-side jax.random.gumbel
input — pltpu's in-kernel PRNG has no CPU interpret lowering). Every filter
pass is elementwise+reduce on a VMEM-resident block at full VPU width: no
permutes, no gathers, no HBM round-trips between iterations, exact fp32
keys (the sort path rounds keys to bf16 for K > 64).

Tie semantics: value thresholds keep ALL entries tied at the k-th value /
nucleus boundary, where `lax.top_k` keeps the first K by index. Exact ties
at fp32 resolution are measure-zero for real logits; the deviation class is
the same as the shipped bf16-key sort path and is bounded by the same
distributional tests (tests/test_sampling_stats.py).

Numerical scope: entries more than TAIL_NATS (=80) below the row max are
truncated outright — their softmax mass is < V * e^-80 ~ 1e-31, far below
fp32 resolution of the kept probabilities. This also bounds the bisection
range so `n_iter` steps reach ~80/2^26 ~ 1.2e-6 absolute resolution.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from controlvar_tpu.ops.sampling import NEG_INF  # shared filter sentinel

TAIL_NATS = 80.0


def kept_mask(l: jnp.ndarray, top_k: int, top_p: float,
              n_iter: int) -> jnp.ndarray:
    """The bisection filter itself: bool kept-set for fp32 logits (R, V).
    Shared by the kernel and the exactness tests (the jnp code is identical
    inside and outside `pallas_call`)."""
    V = l.shape[-1]
    m = jnp.max(l, axis=-1, keepdims=True)
    lo0 = m - TAIL_NATS
    kept = l >= lo0
    if 0 < top_k < V:
        def body(_, c):
            lo, hi = c
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum((l >= mid).astype(jnp.float32), axis=-1,
                          keepdims=True)
            ge = cnt >= top_k
            return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)
        # invariant: count(l >= lo) >= k (or lo == lo0: sub-tail k, exact
        # to e^-80 mass), count(l >= hi) < k => final lo in (v_{k+1}, v_k]
        lo, _ = jax.lax.fori_loop(0, n_iter, body, (lo0, m + 1.0))
        kept = l >= lo
    if top_p > 0.0:
        e = jnp.where(kept, jnp.exp(l - m), 0.0)
        pZ = top_p * jnp.sum(e, axis=-1, keepdims=True)
        def body2(_, c):
            lo, hi = c
            mid = 0.5 * (lo + hi)
            gm = jnp.sum(jnp.where(l > mid, e, 0.0), axis=-1, keepdims=True)
            ge = gm >= pZ
            return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)
        # keep x iff strictly-greater kept mass < top_p (the crossing token
        # is kept, exactly the sort path's `cum - p < top_p`)
        lo2, _ = jax.lax.fori_loop(0, n_iter, body2, (lo0, m + 1.0))
        kept = jnp.logical_and(kept, l > lo2)
    return kept


def _sample_kernel(logits_ref, g_ref, out_ref, *, top_k, top_p, n_iter):
    l = logits_ref[...].astype(jnp.float32)          # (R, V)
    kept = kept_mask(l, top_k, top_p, n_iter)
    # gumbel-max draw over the kept set == categorical(softmax(kept logits)).
    # Noise comes in as an input: pltpu.prng_* has no CPU interpret lowering,
    # and a host-side jax.random.gumbel keeps ONE code path + key-determinism.
    z = jnp.where(kept, l + g_ref[...], NEG_INF)
    ids = jnp.argmax(z, axis=-1)[:, None].astype(jnp.int32)
    # broadcast across a full 128-lane block: Mosaic rejects 1-wide outputs
    out_ref[...] = jnp.broadcast_to(ids, (ids.shape[0], 128))


def _sample_kernel_prng(seed_ref, logits_ref, out_ref, *, top_k, top_p,
                        n_iter):
    """TPU-only variant: gumbel noise from the in-kernel PRNG instead of a
    host-side (n, V) input — halves the kernel's HBM traffic. No CPU
    interpret lowering exists for pltpu.prng_*, so the noise-input kernel
    above remains the tested reference; this one is validated on-chip
    (kept-set membership + distribution, tools/campaign logs)."""
    # two well-mixed seed words (threefry output, not raw key data): raw
    # jax keys are sequential ((0, seed)), and seed+program_id offsets of
    # sequential keys would collide across calls, correlating their noise
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0), seed_ref[1])
    l = logits_ref[...].astype(jnp.float32)
    kept = kept_mask(l, top_k, top_p, n_iter)
    bits = pltpu.prng_random_bits(l.shape)
    # Mosaic supports int32->f32 but not uint32->f32: keep 23 random bits
    # (top bit clear, so the int32 view is the same non-negative value)
    x23 = jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.uint32),
                                      jnp.uint32(9))
    u = (pltpu.bitcast(x23, jnp.int32).astype(jnp.float32) + 0.5) * (
        1.0 / (1 << 23))  # u in (0, 1)
    g = -jnp.log(-jnp.log(u))
    z = jnp.where(kept, l + g, NEG_INF)
    ids = jnp.argmax(z, axis=-1)[:, None].astype(jnp.int32)
    out_ref[...] = jnp.broadcast_to(ids, (ids.shape[0], 128))


@functools.partial(
    jax.jit,
    static_argnames=("top_k", "top_p", "block_rows", "n_iter", "interpret",
                     "device_prng"),
)
def sample_top_k_top_p_bisect(
    key: jax.Array,
    logits: jnp.ndarray,       # (..., V)
    top_k: int = 0,
    top_p: float = 0.0,
    block_rows: int = 0,
    n_iter: int = 26,
    interpret: bool = False,
    device_prng: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for `sample_top_k_top_p` (same distribution, a
    different RNG stream: draws are not bitwise-reproducible across the two
    methods for a given key, exactly like torch-vs-JAX sampling)."""
    *lead, V = logits.shape
    n = 1
    for d in lead:
        n *= d
    lf = logits.reshape(n, V).astype(jnp.float32)
    vpad = -(-V // 128) * 128
    if vpad != V:
        lf = jnp.pad(lf, [(0, 0), (0, vpad - V)], constant_values=NEG_INF)
    if block_rows <= 0:
        # VMEM budget ~16 MB scoped: the noise-input kernel streams 2 fp32
        # blocks (logits+gumbel); the prng variant streams 1 but allocates
        # bits/uniform/gumbel temporaries on the kernel stack (measured:
        # 256 rows overflows scoped vmem by 512K on v5e) — 128 for both
        block_rows = 128
    br = min(block_rows, max(8, -(-n // 8) * 8))
    npad = -(-n // br) * br
    if npad != n:
        lf = jnp.pad(lf, [(0, npad - n), (0, 0)])
    if device_prng:
        # derive two WELL-MIXED words from the key (one host-side threefry
        # call); deterministic per key, uncorrelated across sequential keys
        seed = jax.random.bits(key, (2,), jnp.uint32).astype(jnp.int32)
        kernel = functools.partial(_sample_kernel_prng, top_k=top_k,
                                   top_p=top_p, n_iter=n_iter)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((br, vpad), lambda i: (i, 0)),
        ]
        args = (seed, lf)
    else:
        kernel = functools.partial(_sample_kernel, top_k=top_k, top_p=top_p,
                                   n_iter=n_iter)
        g = jax.random.gumbel(key, lf.shape, jnp.float32)
        in_specs = [
            pl.BlockSpec((br, vpad), lambda i: (i, 0)),
            pl.BlockSpec((br, vpad), lambda i: (i, 0)),
        ]
        args = (lf, g)
    out = pl.pallas_call(
        kernel,
        grid=(npad // br,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, 128), jnp.int32),
        interpret=interpret,
    )(*args)
    return out[:n, 0].reshape(lead)
