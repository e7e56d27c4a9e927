"""Sort-free bisection sampler (ops/sample_kernel.py): the kept set must
match the sort path exactly on tie-free logits, and the interpret-mode
kernel's draws must follow the analytic filtered distribution."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlvar_tpu.ops.sample_kernel import (
    kept_mask,
    sample_top_k_top_p_bisect,
)
from controlvar_tpu.ops.sampling import top_k_top_p_filter


def _sort_path_kept(logits, top_k, top_p):
    """Bool kept-set of the fp32-exact sort-based filter. (The fast-path
    `filtered_sorted_logits` rounds keys to bf16 for K > 64, so it is NOT
    a tie-free oracle; `top_k_top_p_filter` shares the bisection path's
    value-threshold tie semantics on fp32 keys.)"""
    out = np.asarray(top_k_top_p_filter(
        jnp.asarray(logits, jnp.float32), top_k, top_p))
    return out > -1e29


@pytest.mark.parametrize("top_k,top_p", [(8, 0.0), (0, 0.9), (8, 0.9),
                                         (900, 0.96)])
def test_kept_set_matches_sort_path(top_k, top_p):
    rng = np.random.default_rng(0)
    V = 4096 if top_k == 900 else 64
    # well-separated logits: no two values within the bisection resolution
    base = rng.permutation(V).astype(np.float32) * (8.0 / V)
    l = np.stack([base, base[::-1].copy(), rng.permutation(base)])
    l = l + rng.normal(0, 1e-3, l.shape).astype(np.float32)
    kept = np.asarray(kept_mask(jnp.asarray(l), top_k, top_p, n_iter=26))
    ref = _sort_path_kept(l, top_k if 0 < top_k < V else 0, top_p)
    np.testing.assert_array_equal(kept, ref)


def test_kept_set_real_shapes_random_logits():
    """The headline shape's filter: (rows, 4096), k=900, p=0.96, normal
    logits with a peaked head (realistic post-CFG logits)."""
    rng = np.random.default_rng(1)
    l = rng.normal(0, 4.0, (16, 4096)).astype(np.float32)
    l[:, :8] += 12.0  # peaked head
    kept = np.asarray(kept_mask(jnp.asarray(l), 900, 0.96, n_iter=26))
    ref = _sort_path_kept(l, 900, 0.96)
    # fp32 normals can collide within the 80/2^26 bisection resolution in
    # at most a boundary-tie entry or two per row
    mismatch = (kept != ref).sum(axis=-1)
    assert mismatch.max() <= 2, mismatch
    assert (mismatch == 0).mean() >= 0.8


def test_kernel_draws_within_kept_set_and_distribution():
    """Interpret-mode kernel: every draw lands in the kept set; empirical
    distribution matches the analytic filtered softmax (TV < 3%)."""
    rng = np.random.default_rng(2)
    V, top_k, top_p = 64, 8, 0.9
    row = rng.normal(0, 2.0, V).astype(np.float32)
    kept = np.asarray(kept_mask(jnp.asarray(row[None]), top_k, top_p, 26))[0]
    e = np.where(kept, np.exp(row - row.max()), 0.0)
    target = e / e.sum()

    n = 20000
    l = jnp.asarray(np.tile(row, (n, 1)))
    draws = np.asarray(sample_top_k_top_p_bisect(
        jax.random.key(0), l, top_k, top_p, interpret=True))
    assert kept[draws].all(), "draw outside the kept set"
    emp = np.bincount(draws, minlength=V) / n
    tv = 0.5 * np.abs(emp - target).sum()
    assert tv < 0.03, tv


def test_kernel_shapes_padding_and_determinism():
    """Leading batch dims, V not a lane multiple (separator head 4114),
    row padding; same key => same draws, different keys => different."""
    rng = np.random.default_rng(3)
    l = jnp.asarray(rng.normal(0, 3.0, (2, 5, 4114)).astype(np.float32))
    a = sample_top_k_top_p_bisect(jax.random.key(7), l, 900, 0.96,
                                  interpret=True)
    b = sample_top_k_top_p_bisect(jax.random.key(7), l, 900, 0.96,
                                  interpret=True)
    c = sample_top_k_top_p_bisect(jax.random.key(8), l, 900, 0.96,
                                  interpret=True)
    assert a.shape == (2, 5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (np.asarray(a) != np.asarray(c)).any()
    assert int(jnp.max(a)) < 4114


def test_dispatch_method_bisect():
    """sample_top_k_top_p(method='bisect') routes to the kernel (interpret
    on CPU) and produces in-vocab ids."""
    from controlvar_tpu.ops.sampling import sample_top_k_top_p

    rng = np.random.default_rng(4)
    l = jnp.asarray(rng.normal(0, 3.0, (3, 7, 256)).astype(np.float32))
    ids = sample_top_k_top_p(jax.random.key(0), l, 32, 0.9, method="bisect")
    assert ids.shape == (3, 7)
    assert int(jnp.min(ids)) >= 0 and int(jnp.max(ids)) < 256


def test_dispatch_method_bisect_prng_cpu_fallback():
    """'bisect_prng' has no CPU interpret lowering for the in-kernel PRNG;
    off-TPU it must degrade to the host-noise bisect kernel (same kept-set
    math), not error. On-chip validation: membership/determinism/
    key-sensitivity measured in tools/sampler_ab.py (PERF.md §7)."""
    from controlvar_tpu.ops.sampling import sample_top_k_top_p

    rng = np.random.default_rng(5)
    l = jnp.asarray(rng.normal(0, 3.0, (4, 256)).astype(np.float32))
    ids = sample_top_k_top_p(jax.random.key(1), l, 16, 0.9,
                             method="bisect_prng")
    assert ids.shape == (4,)
    assert int(jnp.min(ids)) >= 0 and int(jnp.max(ids)) < 256
