"""VAR: class-conditional next-scale autoregressive transformer.

TPU-native re-design of the reference VAR (reference: models/var.py:20-291):
  * `forward_train`: teacher-forced full-sequence forward with block-causal
    masking and 10% class-drop -> (B, L, V) logits.
  * `sample_cfg`: the entire 10-scale CFG decode is ONE jitted program — the
    scale loop is unrolled over static patch_nums, every step has static
    shapes, and the KV cache is a preallocated (depth, 2B, H, L, hd) buffer
    (vs. the reference's per-scale python loop with torch.cat caches,
    reference: var.py:143-207).

Params pytree: word_embed{kernel,bias}, class_emb (K+1, C), pos_start,
pos_1LC, lvl_embed (S, C), blocks{...stacked...}, head_nm, head.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from controlvar_tpu.config import VARConfig
from controlvar_tpu.models import transformer as tfm
from controlvar_tpu.models.masks import block_causal_mask, level_index_1L
from controlvar_tpu.models.quantizer import MultiScaleQuantizer
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.ops.sampling import gumbel_softmax, sample_top_k_top_p

Params = Dict


@dataclasses.dataclass(frozen=True)
class VARModel:
    cfg: VARConfig

    # ---- construction ------------------------------------------------------

    def init_params(self, key: jax.Array) -> Params:
        cfg = self.cfg
        C = cfg.embed_dim
        init_std = float(np.sqrt(1.0 / C / 3.0))
        ks = jax.random.split(key, 8)
        p: Params = {
            "word_embed": {
                "kernel": tfm._trunc_normal(ks[0], (cfg.cvae, C), 0.02),
                "bias": jnp.zeros((C,), jnp.float32),
            },
            "class_emb": tfm._trunc_normal(ks[1], (cfg.num_classes + 1, C), init_std),
            "pos_start": tfm._trunc_normal(ks[2], (1, cfg.first_l, C), init_std),
            "pos_1LC": tfm._trunc_normal(ks[3], (1, cfg.seq_len, C), init_std),
            "lvl_embed": tfm._trunc_normal(ks[4], (cfg.num_scales, C), init_std),
            "blocks": tfm.init_block_params(ks[5], cfg),
        }
        p.update(tfm.init_head_params(ks[6], cfg, cfg.vocab_size))
        if cfg.shared_aln:
            p["shared_ada_lin"] = {
                "kernel": tfm._trunc_normal(ks[7], (C, 6 * C), 0.02),
                "bias": jnp.zeros((6 * C,), jnp.float32),
            }
        return p

    # ---- shared helpers ----------------------------------------------------

    def _lvl_pos(self, params: Params) -> jnp.ndarray:
        """lvl_embed[lvl_1L] + pos_1LC -> (1, L, C) fp32."""
        lvl = jnp.asarray(level_index_1L(self.cfg.patch_nums))
        return jnp.take(params["lvl_embed"], lvl, axis=0)[None] + params["pos_1LC"]

    def _word_embed(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return x.astype(jnp.float32) @ params["word_embed"]["kernel"] + params["word_embed"]["bias"]

    # ---- training forward --------------------------------------------------

    def forward_train(
        self,
        params: Params,
        labels: jnp.ndarray,            # (B,) int32
        x_tf: jnp.ndarray,              # (B, L - first_l, Cvae) teacher forcing
        key: Optional[jax.Array] = None,
        train: bool = True,
        compute_dtype=jnp.bfloat16,
        use_flash: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced logits (B, L, V) fp32 (reference: var.py:209-253)."""
        cfg = self.cfg
        B = x_tf.shape[0]
        if train and key is not None:
            k_drop, k_dp = jax.random.split(key)
            drop = jax.random.uniform(k_drop, (B,)) < cfg.cond_drop_rate
            labels = jnp.where(drop, cfg.num_classes, labels)
        else:
            k_dp = None
        cond = jnp.take(params["class_emb"], labels, axis=0)      # (B, C) fp32
        sos = cond[:, None, :] + params["pos_start"]              # (B, first_l, C)
        x = jnp.concatenate([sos, self._word_embed(params, x_tf)], axis=1)
        x = x + self._lvl_pos(params)
        mask = jnp.asarray(block_causal_mask(cfg.patch_nums))
        x = tfm.blocks_forward(
            params["blocks"], x.astype(compute_dtype), cond, cfg, mask,
            train=train, key=k_dp, use_flash=use_flash,
            shared_lin=params.get("shared_ada_lin"),
        )
        return tfm.head_logits(params, x, cond, cfg)

    # ---- CFG sampling -------------------------------------------------------

    def sample_cfg(
        self,
        params: Params,
        vqvae: VQVAE,
        vq_params: Params,
        labels: jnp.ndarray,            # (B,) int32
        key: jax.Array,
        cfg_scale: float = 1.5,
        top_k: int = 0,
        top_p: float = 0.0,
        compute_dtype=jnp.bfloat16,
        decode_img: bool = True,
        more_smooth: bool = False,
    ):
        """Class-conditional CFG decode (reference: var.py:143-207).
        more_smooth: gumbel-softmax token embeddings for visualization
        (reference: var.py:193-197) instead of hard lookups.

        Returns images (B, 256, 256, 3) in [0, 1] if decode_img, else the
        final latent canvas f_hat (B, 16, 16, Cvae).
        """
        cfg = self.cfg
        quant = MultiScaleQuantizer(vqvae.cfg)
        B = labels.shape[0]
        pns = cfg.patch_nums
        SN = cfg.num_scales

        labels2 = jnp.concatenate(
            [labels, jnp.full_like(labels, cfg.num_classes)], axis=0
        )
        cond = jnp.take(params["class_emb"], labels2, axis=0)     # (2B, C)
        lvl_pos = self._lvl_pos(params)                            # (1, L, C)
        next_map = (
            cond[:, None, :] + params["pos_start"] + lvl_pos[:, : cfg.first_l]
        )

        cache_k, cache_v = tfm.init_kv_cache(cfg, 2 * B, cfg.seq_len, compute_dtype)
        f_hat = jnp.zeros((B, pns[-1], pns[-1], vqvae.cfg.z_channels), jnp.float32)
        step_keys = jax.random.split(key, SN)
        cur = 0
        for si, pn in enumerate(pns):
            l = pn * pn
            x = next_map.astype(compute_dtype)
            x, cache_k, cache_v = tfm.blocks_decode(
                params["blocks"], x, cond, cfg, cache_k, cache_v, cur,
                shared_lin=params.get("shared_ada_lin"),
            )
            t = cfg_scale * si / (SN - 1)
            # CFG combined BEFORE the head matmul (weights sum to 1)
            logits = tfm.head_logits_cfg(params, x, cond, cfg, (1.0 + t, -t))
            k_sample, k_gumbel = jax.random.split(step_keys[si])
            ids = sample_top_k_top_p(k_sample, logits, top_k, top_p)    # (B, l)
            if more_smooth:
                ratio = si / (SN - 1)
                gum_t = max(0.27 * (1 - ratio * 0.95), 0.005)
                soft = gumbel_softmax(k_gumbel, logits * (1 + ratio), tau=gum_t)
                h = (soft @ vq_params["quantize"]["embedding"]).reshape(B, pn, pn, -1)
            else:
                h = quant.embed(vq_params["quantize"], ids).reshape(B, pn, pn, -1)
            f_hat, next_in = quant.next_ar_input(vq_params["quantize"], si, f_hat, h)
            cur += l
            if si != SN - 1:
                nm = self._word_embed(params, next_in.reshape(B, -1, vqvae.cfg.z_channels))
                nm = nm + lvl_pos[:, cur : cur + pns[si + 1] ** 2]
                next_map = jnp.tile(nm, (2, 1, 1))
        if not decode_img:
            return f_hat
        img = vqvae.fhat_to_img(vq_params, f_hat, compute_dtype)
        return (img + 1.0) * 0.5
