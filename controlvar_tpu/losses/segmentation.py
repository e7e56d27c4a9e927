"""Dice / BCE segmentation losses (reference: losses/dice.py:3-13,
losses/segmentation.py:5-22 — present in the reference but unused by any
trainer; kept for API completeness)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_loss(logits: jnp.ndarray, targets: jnp.ndarray,
              smooth: float = 1.0) -> jnp.ndarray:
    """Soft dice over flattened predictions. logits/targets: (B, ...)."""
    probs = jax.nn.sigmoid(logits).reshape(logits.shape[0], -1)
    t = targets.reshape(targets.shape[0], -1)
    inter = jnp.sum(probs * t, axis=1)
    denom = jnp.sum(probs, axis=1) + jnp.sum(t, axis=1)
    return jnp.mean(1.0 - (2.0 * inter + smooth) / (denom + smooth))


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def bce_dice_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                  bce_weight: float = 0.5) -> jnp.ndarray:
    return bce_weight * bce_with_logits(logits, targets) + (1 - bce_weight) * dice_loss(
        logits, targets
    )
