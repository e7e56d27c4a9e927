"""Token sampling: functional top-k/top-p filtering + categorical draw.

JAX rewrite of the reference's in-place filter + torch.multinomial
(reference: models/helpers.py:6-19) and seeded gumbel-softmax smoothing
(reference: models/helpers.py:22-36). V=4096 makes a full sort cheap on TPU.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30

# "sort" = one descending lax.top_k + categorical over the kept K;
# "bisect" = sort-free Pallas threshold kernel (ops/sample_kernel.py);
# "bisect_prng" = same kernel sourcing gumbel noise from the TPU per-core
# PRNG (halves kernel HBM traffic; falls back to "bisect" off-TPU);
# "auto" (default) = bisect_prng on TPU, sort elsewhere — the measured
# winner per backend (on-chip A/B, PERF.md §7: d16 headline 24.8 vs 22.4
# img/s; the sort path stays the CPU/test default because the interpret-
# mode kernel is pure overhead there).
# Same distribution, different RNG stream. Overridable per-process — but the
# method is read at TRACE time: set it (or CONTROLVAR_SAMPLER / --sampler)
# BEFORE building samplers; already-compiled jits keep their method.
DEFAULT_METHOD = os.environ.get("CONTROLVAR_SAMPLER", "auto")
METHODS = ("auto", "sort", "bisect", "bisect_prng")


def top_k_top_p_filter(
    logits: jnp.ndarray, top_k: int = 0, top_p: float = 0.0
) -> jnp.ndarray:
    """Mask logits outside top-k / nucleus top-p to -inf. logits: (..., V)."""
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p > 0.0:
        # torch semantics (reference: helpers.py:11-15): sort ascending,
        # drop entries whose ascending-cumulative prob <= 1 - top_p,
        # never drop the most-likely token.
        sort_idx = jnp.argsort(logits, axis=-1)  # ascending
        sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
        probs = jax.nn.softmax(sorted_logits.astype(jnp.float32), axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        remove_sorted = cum <= (1.0 - top_p)
        remove_sorted = remove_sorted.at[..., -1].set(False)
        inv = jnp.argsort(sort_idx, axis=-1)
        remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
        logits = jnp.where(remove, NEG_INF, logits)
    return logits


def sample_top_k_top_p(
    key: jax.Array,
    logits: jnp.ndarray,
    top_k: int = 0,
    top_p: float = 0.0,
    method: Optional[str] = None,
) -> jnp.ndarray:
    """Sample token ids (...,) from top-k/top-p filtered logits (..., V).

    TPU-fast path: ONE descending lax.top_k sort; the nucleus (top-p) mask is
    applied in sorted space (keep position j while cum_j - p_j < top_p, never
    dropping position 0 — identical to torch's ascending formulation,
    reference: helpers.py:11-15); the categorical draw happens over the K
    sorted entries and maps back through the sort indices. This avoids the
    full-vocab argsort+inverse-argsort pair, which dominates decode time on
    TPU (measured 1.2s -> 40ms per 512-token scale at V=4096).
    """
    lf = logits.astype(jnp.float32)
    if top_k <= 0 and top_p <= 0.0:
        # unfiltered: a plain categorical needs no sort at all
        return jax.random.categorical(key, lf, axis=-1).astype(jnp.int32)
    m = method or DEFAULT_METHOD
    if m not in METHODS:
        raise ValueError(f"unknown sampling method {m!r}; use one of "
                         f"{METHODS} (check CONTROLVAR_SAMPLER)")
    from controlvar_tpu.ops.attention import _pallas_available

    pallas_ok = _pallas_available()
    if m == "auto":
        m = "bisect_prng" if pallas_ok else "sort"
    if m in ("bisect", "bisect_prng"):
        from controlvar_tpu.ops.sample_kernel import sample_top_k_top_p_bisect

        # TPU: real Mosaic kernel; CPU: interpret mode (tests/dryruns);
        # any other backend: fall through to the sort path (repo convention,
        # attention.py:_pallas_available). The in-kernel PRNG has no CPU
        # interpret lowering, so bisect_prng degrades to host-noise bisect
        # off-TPU (same distribution family, different stream).
        if pallas_ok:
            return sample_top_k_top_p_bisect(key, lf, top_k, top_p,
                                             device_prng=(m == "bisect_prng"))
        if jax.default_backend() == "cpu":
            return sample_top_k_top_p_bisect(key, lf, top_k, top_p,
                                             interpret=True)
    vals, idx = filtered_sorted_logits(logits, top_k, top_p)
    pos = jax.random.categorical(key, vals, axis=-1)
    return jnp.take_along_axis(idx, pos[..., None], axis=-1)[..., 0].astype(jnp.int32)


def filtered_sorted_logits(
    logits: jnp.ndarray, top_k: int = 0, top_p: float = 0.0
) -> tuple:
    """Deterministic filtering half of `sample_top_k_top_p`: returns the
    sorted kept logits (..., K) with dropped nucleus entries at -inf and the
    vocab indices (..., K) of the sorted entries. Exposed separately so the
    bf16-key trade-off can be validated distributionally (tests compute the
    path's exact analytic categorical distribution from this output;
    measured bound: TV distance vs the exact-fp32 path < 1e-2 over
    bf16-value equivalence classes on adversarial tie-heavy logits, < 1e-3
    per-token on realistic peaked logits — see tests/test_sampling_stats.py)."""
    V = logits.shape[-1]
    K = top_k if top_k > 0 else V
    if top_k > 64:
        # Sort on bf16 keys: the top-k sort is bandwidth-bound and
        # half-width keys cut the d16 decode batch by ~26 ms (measured; a
        # follow-up fp32 re-gather of the values costs ~400 ms in TPU
        # gather time and is NOT worth exactness at the nucleus boundary).
        # The categorical draw and nucleus mask see bf16-rounded logits —
        # a <0.4% relative perturbation of the kept tail. Small K (incl.
        # greedy top_k=1) keeps exact fp32 selection: bf16 rounding there
        # changes the argmax itself.
        vals16, idx = jax.lax.top_k(logits.astype(jnp.bfloat16), K)
        vals = vals16.astype(jnp.float32)
    else:
        vals, idx = jax.lax.top_k(logits.astype(jnp.float32), K)  # descending, stable
    if top_p > 0.0:
        probs = jax.nn.softmax(vals, axis=-1)  # non-top-k entries excluded
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < top_p
        keep = keep.at[..., 0].set(True)
        vals = jnp.where(keep, vals, NEG_INF)
    return vals, idx


def gumbel_softmax(
    key: jax.Array, logits: jnp.ndarray, tau: float, hard: bool = False
) -> jnp.ndarray:
    """Gumbel-softmax over the last axis (reference: helpers.py:22-36)."""
    g = jax.random.gumbel(key, logits.shape, jnp.float32)
    y_soft = jax.nn.softmax((logits.astype(jnp.float32) + g) / tau, axis=-1)
    if not hard:
        return y_soft
    idx = jnp.argmax(y_soft, axis=-1)
    y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y_soft.dtype)
    return y_hard + jax.lax.stop_gradient(y_soft) - y_soft  # straight-through
