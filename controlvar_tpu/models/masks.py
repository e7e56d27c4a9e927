"""Attention masks and index tables for scale-pyramid transformers.

Pure numpy constructions (gold-testable, computed once at trace time):
  * block-causal scale mask: token of scale i attends all scales <= i
    (reference: models/var.py:118-125)
  * ControlVAR variants with interleaved (control, image) segments per scale,
    incl. `separate_decoding` and `indep` intra-scale masking
    (reference: models/control_var.py:156-198)
  * level-index, type-index tables (reference: control_var.py:99-117,162-166)

Masks are boolean (True = may attend); the attention op turns them into
additive -inf bias.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

from controlvar_tpu.config import ControlVARConfig, VARConfig


def _seg_lens(patch_nums: Tuple[int, ...], mask_factor: int, separator: bool):
    """Per-scale segment length of ONE interleaved part (pn^2 + sep slot)."""
    out = []
    for i, pn in enumerate(patch_nums):
        num_sp = 1 if (i != 0 and separator) else 0
        out.append(pn * pn + num_sp)
    return out


@functools.lru_cache(maxsize=None)
def level_index_1L(patch_nums: Tuple[int, ...], mask_factor: int = 1,
                   separator: bool = False) -> np.ndarray:
    """(L,) int32: scale index of every token."""
    segs = _seg_lens(patch_nums, mask_factor, separator)
    return np.concatenate(
        [np.full(seg * mask_factor, i, np.int32) for i, seg in enumerate(segs)]
    )


@functools.lru_cache(maxsize=None)
def type_index_1L(patch_nums: Tuple[int, ...], separator: bool = False,
                  mask_first: bool = True) -> np.ndarray:
    """(L,) int32 control/image type id per token (mask_factor=2 only).

    mask_first=True  -> pattern (1, 0) per scale (reference: control_var.py:104-110)
    mask_first=False -> pattern (0, 1)
    """
    segs = _seg_lens(patch_nums, 2, separator)
    a, b = (1, 0) if mask_first else (0, 1)
    parts = []
    for seg in segs:
        parts.append(np.full(seg, a, np.int32))
        parts.append(np.full(seg, b, np.int32))
    return np.concatenate(parts)


@functools.lru_cache(maxsize=None)
def block_causal_mask(patch_nums: Tuple[int, ...], mask_factor: int = 1,
                      separator: bool = False) -> np.ndarray:
    """(L, L) bool: query of scale i attends keys of scales <= i."""
    lvl = level_index_1L(patch_nums, mask_factor, separator)
    return lvl[:, None] >= lvl[None, :]


@functools.lru_cache(maxsize=None)
def separate_decoding_mask(patch_nums: Tuple[int, ...], separator: bool = False,
                           indep: bool = False) -> np.ndarray:
    """(L, L) bool mask for ControlVAR `separate_decoding`.

    Control tokens of scale i may not see image tokens of scale i; with
    `indep` additionally image tokens of scale i may not see control tokens
    of the same scale (both segments only see completed earlier scales plus
    themselves). Built exactly as the reference's two interval maskings
    (reference: control_var.py:170-191).
    """
    segs = _seg_lens(patch_nums, 2, separator)
    d, dT = [], []
    for i, seg in enumerate(segs):
        d.extend([np.full(seg, 1 + 4 * i), np.full(seg, 3 + 4 * i)])
        dT.extend([np.full(seg, 1 + 4 * i), np.full(seg, 2 + 4 * i)])
    d = np.concatenate(d)[:, None]
    dT = np.concatenate(dT)[None, :]
    mask = d >= dT
    if indep:
        d2, dT2 = [], []
        for i, seg in enumerate(segs):
            d2.extend([np.full(seg, 3 + 4 * i), np.full(seg, 1 + 4 * i)])
            dT2.extend([np.full(seg, 2 + 4 * i), np.full(seg, 0 + 4 * i)])
        d2 = np.concatenate(d2)[:, None]
        dT2 = np.concatenate(dT2)[None, :]
        mask = mask & (d2 >= dT2)
    return mask


def attn_mask_for_config(cfg) -> np.ndarray:
    """The (L, L) training attention mask the config calls for."""
    if isinstance(cfg, ControlVARConfig):
        if cfg.separate_decoding:
            return separate_decoding_mask(cfg.patch_nums, cfg.separator, cfg.indep)
        return block_causal_mask(cfg.patch_nums, cfg.mask_factor, cfg.separator)
    return block_causal_mask(cfg.patch_nums, 1, False)
