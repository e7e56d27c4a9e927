"""Layout-preserving GroupNorm for TPU (VQVAE epilogue hot path).

The textbook GroupNorm (models/vae.py:group_norm, mirroring the reference's
``torch.nn.GroupNorm(32, C)`` — reference: models/vae_modules.py:18-19)
reshapes NHWC to (B, H, W, G, C/G) to reduce per group. At the released
tokenizer width ch=160 that puts a 5-wide minor dimension on the TPU's
128-lane axis for the reduce and the normalize — the lanes run at <4%
occupancy and XLA inserts full-tensor relayouts on both sides at 256^2.

``group_norm_matmul`` computes identical statistics WITHOUT leaving the
(B, H, W, C) layout:

  * one fused spatial pass produces per-channel sum and sum-of-squares
    (B, C) — x and x*x share the input read;
  * a (C, G) 0/1 group-membership matmul folds channels into group sums
    (tiny: C x G), giving E[x] and E[x^2] per group;
  * the inverse matmul (G, C) broadcasts mean/rstd back to channels, the
    affine folds in, and one fused multiply-add normalizes in-layout.

Statistics are fp32 end-to-end like the textbook path; the only numerical
difference is the var = E[x^2] - E[x]^2 form (one-pass) vs the two-pass
E[(x-mu)^2] — post-GN activations are O(1) so the cancellation term is
benign (parity-tested to ~1e-5 in fp32, tests/test_vae.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _group_matrix(C: int, G: int, phases: int = 1) -> np.ndarray:
    """(phases*C, G) 0/1 membership: column g selects channels
    [g*C/G, (g+1)*C/G) in every phase copy. phases>1 covers packed layouts
    (ops/packed_conv): packed channel q*C+c belongs to channel c's group,
    so the membership tiles along the channel axis."""
    assert C % G == 0, (C, G)
    M = np.kron(np.eye(G, dtype=np.float32),
                np.ones((C // G, 1), np.float32))
    return np.tile(M, (phases, 1)) if phases > 1 else M


def group_norm_matmul(p, x: jnp.ndarray, num_groups: int = 32,
                      eps: float = 1e-6, phases: int = 1) -> jnp.ndarray:
    """Drop-in for models/vae.group_norm: NHWC GroupNorm, fp32 stats,
    group reduction via (C, G) matmul instead of a minor-dim reshape.

    phases>1: x is phase-packed (ops/packed_conv.wpack layout) with
    phases*C channels; statistics are computed over each REAL channel
    group exactly as unpacked (same values, same counts — positions moved
    from the width axis to the channel axis)."""
    dtype = x.dtype
    B, H, W, Cp = x.shape
    C = Cp // phases
    M = jnp.asarray(_group_matrix(C, num_groups, phases))  # (phases*C, G)
    n = H * W * phases * (C // num_groups)
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))                     # (B, pC) — one pass,
    s2 = jnp.sum(xf * xf, axis=(1, 2))                # fused with s1 by XLA
    g1 = (s1 @ M) / n                                 # (B, G) E[x]
    g2 = (s2 @ M) / n                                 # (B, G) E[x^2]
    rstd = jax.lax.rsqrt(jnp.maximum(g2 - g1 * g1, 0.0) + eps)
    mean_c = g1 @ M.T                                 # (B, pC)
    rstd_c = rstd @ M.T
    pscale = jnp.tile(p["scale"].astype(jnp.float32), phases)
    pbias = jnp.tile(p["bias"].astype(jnp.float32), phases)
    scale = rstd_c * pscale                           # fold the affine:
    bias = pbias - mean_c * scale                     # y = x*scale + bias
    y = xf * scale[:, None, None, :] + bias[:, None, None, :]
    return y.astype(dtype)
