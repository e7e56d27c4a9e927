"""Standalone class-conditioning embedder with cond-drop.

API-parity port of the reference ClassEmbedder (reference:
models/class_embedder.py:5-19). Note: the reference instantiates this in its
trainers but never consumes its output (VAR/ControlVAR embed classes
internally); kept for interface completeness.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict


def init_params(key: jax.Array, num_classes: int, embed_dim: int) -> Params:
    return {
        "embedding": 0.02
        * jax.random.truncated_normal(key, -2, 2, (num_classes + 1, embed_dim))
    }


def apply(
    params: Params,
    labels: jnp.ndarray,
    num_classes: int,
    cond_drop_rate: float = 0.1,
    key: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """labels (B,) -> embeddings (B, C); drops to the null class when training."""
    if train and key is not None and cond_drop_rate > 0:
        drop = jax.random.uniform(key, labels.shape) < cond_drop_rate
        labels = jnp.where(drop, num_classes, labels)
    return jnp.take(params["embedding"], labels, axis=0)
