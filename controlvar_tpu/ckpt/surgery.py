"""VAR -> ControlVAR checkpoint surgery.

Initializes a ControlVAR from a pretrained plain-VAR checkpoint
(reference: train_control_var_hpu.py:472-534): the L=680 positional table is
expanded to the interleaved L=1360(+sep) layout, the head is padded for
separator vocab, per-scale-new leaves (pos_start, cond/type/special embeds)
keep their fresh init, and every other weight transfers unchanged.
"""
from __future__ import annotations

from typing import Dict, Literal

import jax
import jax.numpy as jnp
import numpy as np

from controlvar_tpu.config import ControlVARConfig

Params = Dict


def expand_pos_1LC(
    pos: jnp.ndarray,
    cfg: ControlVARConfig,
    mode: Literal["concat", "interpos"] = "concat",
    mpos: bool = False,
    key: jax.Array = None,
) -> jnp.ndarray:
    """(1, 680, C) VAR positions -> (1, L, C) ControlVAR positions.

    mode='concat': whole-sequence duplication [pos; pos] (the reference's
    default path, train_control_var_hpu.py:524). mode='interpos': per-scale
    duplication [pos_k, pos_k] per scale (reference :495-505). With
    cfg.separator, separator slots are freshly initialized and the second
    copy is negated when mpos (reference :507-521).
    """
    C = pos.shape[-1]
    init_std = float(np.sqrt(1.0 / C / 3.0))
    if not cfg.separator and mode == "concat":
        return jnp.concatenate([pos, pos], axis=1)
    key = key if key is not None else jax.random.key(0)
    parts = []
    L = 0
    for i, pn in enumerate(cfg.patch_nums):
        l = pn * pn
        num_sp = 1 if (i != 0 and cfg.separator) else 0
        seg = (l + num_sp) * cfg.mask_factor
        key, k = jax.random.split(key)
        pe = init_std * jax.random.truncated_normal(k, -2, 2, (seg, C), jnp.float32)
        src = pos[0, L : L + l]
        pe = pe.at[:l].set(src)
        second = src * (-1.0 if (cfg.separator and mpos) else 1.0)
        pe = pe.at[l + num_sp : 2 * l + num_sp].set(second)
        parts.append(pe)
        L += l
    return jnp.concatenate(parts, axis=0)[None]


def pad_head_for_separators(head: Params, cfg: ControlVARConfig,
                            key: jax.Array) -> Params:
    """Pad the vocab projection with rows for the 2*(S-1) separator classes
    (reference: train_control_var_hpu.py:526-534)."""
    if cfg.num_sep_tokens == 0:
        return head
    C, V = head["kernel"].shape
    extra = cfg.num_sep_tokens
    kw, _ = jax.random.split(key)
    new_w = 0.02 * (
        float(np.sqrt(1.0 / C / 3.0))
        * jax.random.truncated_normal(kw, -2, 2, (C, extra), jnp.float32)
    )
    return {
        "kernel": jnp.concatenate([head["kernel"], new_w], axis=1),
        "bias": jnp.concatenate([head["bias"], jnp.zeros((extra,), jnp.float32)]),
    }


def var_to_control_var(
    var_params: Params,
    fresh_control_params: Params,
    cfg: ControlVARConfig,
    mode: Literal["concat", "interpos"] = "concat",
    mpos: bool = False,
    seed: int = 0,
) -> Params:
    """Merge a converted VAR checkpoint into a fresh ControlVAR param tree."""
    assert cfg.mask_factor == 2, "surgery defined for interleave_append"
    key = jax.random.key(seed)
    k_pos, k_head = jax.random.split(key)
    out = dict(fresh_control_params)
    for name in ("word_embed", "class_emb", "lvl_embed", "blocks", "head_nm"):
        out[name] = var_params[name]
    out["pos_1LC"] = expand_pos_1LC(
        jnp.asarray(var_params["pos_1LC"]), cfg, mode, mpos, k_pos
    )
    out["head"] = pad_head_for_separators(
        {"kernel": jnp.asarray(var_params["head"]["kernel"]),
         "bias": jnp.asarray(var_params["head"]["bias"])},
        cfg, k_head,
    )
    # pos_start / cond_embed / type_embed / special_embed stay freshly
    # initialized (reference drops pos_start from the state dict, :486)
    return out
