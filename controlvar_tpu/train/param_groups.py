"""Weight-decay masking over param pytrees.

Replicates the reference's decay/no-decay split (reference:
utils/lr_control.py:67-101 + nowd_keys at train_control_var_hpu.py:609-615):
no decay for 1-D params, biases, and a keyword list covering positional /
level / class embeddings, AdaLN gammas, and cos-attn scales.
"""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np

NOWD_KEYWORDS = (
    "pos_1LC", "pos_start", "lvl_embed", "class_emb", "cond_embed",
    "type_embed", "special_embed", "ada_gss", "scale_mul", "gamma", "beta",
    "bias", "q_bias", "v_bias",
)


def weight_decay_mask(params: Dict) -> Dict:
    """Pytree of bools: True where weight decay applies.

    Note: stacked block params have a leading depth axis, so the reference's
    `ndim == 1` test becomes `ndim <= 1 after removing the stack axis` for
    block leaves; we instead key off names + per-leaf trailing shape.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)

    def decide(path, leaf) -> bool:
        names = [getattr(p, "key", getattr(p, "idx", "")) for p in path]
        name_str = "/".join(str(n) for n in names)
        if any(k in name_str for k in NOWD_KEYWORDS):
            return False
        in_blocks = "blocks" in name_str
        eff_ndim = leaf.ndim - (1 if in_blocks else 0)
        if eff_ndim <= 1:
            return False
        return True

    leaves, treedef = flat
    mask_leaves = [decide(path, leaf) for path, leaf in leaves]
    return jax.tree_util.tree_unflatten(treedef, mask_leaves)
