"""ControlVAR: joint control+image next-scale AR transformer.

The core novel model of the reference (reference: models/control_var.py:23-689):
every scale holds an interleaved pair (control_k, image_k), the first scale is
the pair (cond-type embedding, class embedding), and the model learns the
joint distribution p(control, image | class, cond_type). At inference the
control tokens can be teacher-forced per scale for control-conditional image
generation (and vice versa).

TPU-native re-design mirrors models/var.py: scan-stacked blocks, one jitted
unrolled decode over static patch_nums, preallocated KV caches, dual f_hat
canvases kept as separate arrays (vs. the reference's stacked-on-H canvas,
reference: control_var.py:333-347).

Supported surface:
  forward_train       all flag combos (multi_cond / bidirectional / separator /
                      type_pos / separate_decoding / indep masks)
  sample_joint_cfg    joint (control, image) generation with 2B CFG
                      (reference: control_var.py:356-565, multi_cond path)
  sample_cond_cfg     teacher-forced conditional generation with 4B
                      multi-scale CFG (reference: control_var.py:223-354)
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from controlvar_tpu.config import ControlVARConfig, COND_UNCOND_ID
from controlvar_tpu.models import transformer as tfm
from controlvar_tpu.models.masks import (
    attn_mask_for_config,
    level_index_1L,
    type_index_1L,
)
from controlvar_tpu.models.quantizer import MultiScaleQuantizer
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.ops.sampling import gumbel_softmax, sample_top_k_top_p

Params = Dict


def separator_mapping(mask_first: bool) -> List[int]:
    """Separator-token id order (reference: control_var.py:476,544,604)."""
    if mask_first:
        return list(range(18))
    return [i + 1 if i % 2 == 0 else i - 1 for i in range(18)]


@dataclasses.dataclass(frozen=True)
class ControlVARModel:
    cfg: ControlVARConfig

    # ---- construction ------------------------------------------------------

    def init_params(self, key: jax.Array) -> Params:
        cfg = self.cfg
        C = cfg.embed_dim
        init_std = float(np.sqrt(1.0 / C / 3.0))
        ks = jax.random.split(key, 12)
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
        p.update(tfm.init_head_params(ks[6], cfg, cfg.head_vocab))
        if cfg.multi_cond:
            p["cond_embed"] = tfm._trunc_normal(ks[7], (cfg.num_cond_types, C), init_std)
        if cfg.type_pos:
            p["type_embed"] = tfm._trunc_normal(ks[8], (cfg.mask_factor, C), init_std)
        if cfg.separator:
            p["special_embed"] = tfm._trunc_normal(
                ks[9], ((cfg.num_scales - 1) * cfg.mask_factor, C), init_std
            )
        if cfg.shared_aln:
            p["shared_ada_lin"] = {
                "kernel": tfm._trunc_normal(ks[10], (C, 6 * C), 0.02),
                "bias": jnp.zeros((6 * C,), jnp.float32),
            }
        return p

    # ---- shared helpers ----------------------------------------------------

    def _lvl_pos(self, params: Params) -> jnp.ndarray:
        cfg = self.cfg
        lvl = jnp.asarray(level_index_1L(cfg.patch_nums, cfg.mask_factor, cfg.separator))
        return jnp.take(params["lvl_embed"], lvl, axis=0)[None] + params["pos_1LC"]

    def _type_pos(self, params: Params, mask_first: bool) -> jnp.ndarray:
        cfg = self.cfg
        t = jnp.asarray(type_index_1L(cfg.patch_nums, cfg.separator, mask_first))
        return jnp.take(params["type_embed"], t, axis=0)[None]

    def _word_embed(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return (
            x.astype(jnp.float32) @ params["word_embed"]["kernel"]
            + params["word_embed"]["bias"]
        )

    def _sos(self, params: Params, labels: jnp.ndarray,
             cond_type: Optional[jnp.ndarray], mask_first: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (cond_BD (N, C), sos (N, first_l, C)) WITHOUT pos_start.

        multi_cond + mask_factor 2: pair [cond_type_embed, class_embed]
        (reference: control_var.py:581-588); plain: class embedding expanded,
        with the bidirectional sign trick when enabled (reference:
        control_var.py:591-598).
        """
        cfg = self.cfg
        cond = jnp.take(params["class_emb"], labels, axis=0)
        if cfg.multi_cond and cfg.mask_factor == 2:
            ct = jnp.take(params["cond_embed"], cond_type, axis=0)
            pair = (
                jnp.stack([ct, cond], axis=1)
                if mask_first
                else jnp.stack([cond, ct], axis=1)
            )
            return cond, pair
        sos = jnp.broadcast_to(cond[:, None, :], (cond.shape[0], cfg.first_l, cond.shape[-1]))
        if cfg.bidirectional and cfg.mask_factor == 2:
            # reference applies the sign AFTER adding pos_start
            # (control_var.py:592-596); pos_start is folded in here, so the
            # caller must NOT add it again for this branch.
            sign = -1.0 if mask_first else 1.0
            half = cfg.first_l // 2
            ch = jnp.concatenate(
                [jnp.full((half,), sign), jnp.full((half,), -sign)]
            )[None, :, None]
            return cond, (sos + params["pos_start"]) * ch
        return cond, sos

    def _splice_separators(self, params: Params, sos: jnp.ndarray,
                           x_embed: jnp.ndarray, mask_first: bool) -> jnp.ndarray:
        """Insert learned separator embeddings after each segment
        (reference: control_var.py:603-618)."""
        cfg = self.cfg
        B = x_embed.shape[0]
        mapping = separator_mapping(mask_first)
        parts = [sos]
        cur = 0
        for si, pn in enumerate(cfg.patch_nums[1:]):
            l = pn * pn
            sp1 = params["special_embed"][mapping[2 * si]][None, None, :]
            sp2 = params["special_embed"][mapping[2 * si + 1]][None, None, :]
            x1 = x_embed[:, cur : cur + l]
            x2 = x_embed[:, cur + l : cur + 2 * l]
            parts.extend([
                x1, jnp.broadcast_to(sp1, (B, 1, sp1.shape[-1])),
                x2, jnp.broadcast_to(sp2, (B, 1, sp2.shape[-1])),
            ])
            cur += 2 * l
        return jnp.concatenate(parts, axis=1)

    # ---- training forward --------------------------------------------------

    def forward_train(
        self,
        params: Params,
        labels: jnp.ndarray,              # (B,) int32
        x_tf: jnp.ndarray,                # (B, 2*(L_img - 1), Cvae) interleaved
        cond_type: Optional[jnp.ndarray] = None,   # (B,) int32
        mask_first: bool = True,
        key: Optional[jax.Array] = None,
        train: bool = True,
        compute_dtype=jnp.bfloat16,
        use_flash: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced logits (B, L, head_vocab) fp32
        (reference: control_var.py:568-651)."""
        cfg = self.cfg
        B = x_tf.shape[0]
        k_dp = None
        if train and key is not None:
            k_cls, k_ct, k_dp = jax.random.split(key, 3)
            drop = jax.random.uniform(k_cls, (B,)) < cfg.cond_drop_rate
            labels = jnp.where(drop, cfg.num_classes, labels)
            if cfg.multi_cond and cond_type is not None:
                drop_ct = jax.random.uniform(k_ct, (B,)) < cfg.cond_drop_rate
                cond_type = jnp.where(drop_ct, COND_UNCOND_ID, cond_type)
        cond, sos = self._sos(params, labels, cond_type, mask_first)
        if cfg.multi_cond and cfg.mask_factor == 2:
            sos = sos + params["pos_start"]
        elif not (cfg.bidirectional and cfg.mask_factor == 2):
            sos = sos + params["pos_start"]
        # (bidirectional already folded pos_start in _sos)

        x_embed = self._word_embed(params, x_tf)
        if cfg.separator:
            x = self._splice_separators(params, sos, x_embed, mask_first)
        else:
            x = jnp.concatenate([sos, x_embed], axis=1)
        x = x + self._lvl_pos(params)
        if cfg.type_pos:
            x = x + self._type_pos(params, mask_first)
        mask = jnp.asarray(attn_mask_for_config(cfg))
        x = tfm.blocks_forward(
            params["blocks"], x.astype(compute_dtype), cond, cfg, mask,
            train=train, key=k_dp, use_flash=use_flash,
            shared_lin=params.get("shared_ada_lin"),
        )
        return tfm.head_logits(params, x, cond, cfg)

    # ---- joint sampling (control + image generated together) ----------------

    def sample_joint_cfg(
        self,
        params: Params,
        vqvae: VQVAE,
        vq_params: Params,
        labels: jnp.ndarray,              # (B,)
        cond_type: jnp.ndarray,           # (B,)
        key: jax.Array,
        cfg_scale: float = 4.0,
        top_k: int = 900,
        top_p: float = 0.96,
        compute_dtype=jnp.bfloat16,
        decode_img: bool = True,
        more_smooth: bool = False,
    ):
        """Joint (control, image) CFG generation, multi_cond path
        (reference: control_var.py:356-565 with indep-aware bias slices).

        Returns (control_img, image_img) each (B, 256, 256, 3) in [0, 1] when
        decode_img, else the two latent canvases.
        """
        cfg = self.cfg
        assert cfg.mask_factor == 2, "joint sampling needs interleave_append"
        quant = MultiScaleQuantizer(vqvae.cfg)
        B = labels.shape[0]
        pns = cfg.patch_nums
        SN = cfg.num_scales

        labels2 = jnp.concatenate([labels, jnp.full_like(labels, cfg.num_classes)])
        cond = jnp.take(params["class_emb"], labels2, axis=0)      # (2B, C)
        ct2 = jnp.concatenate([cond_type, jnp.full_like(cond_type, COND_UNCOND_ID)])
        lvl_pos = self._lvl_pos(params)

        if cfg.multi_cond:
            ct_tok = jnp.take(params["cond_embed"], ct2, axis=0)
            pair = jnp.stack([ct_tok, cond], axis=1)               # (2B, 2, C)
            next_map = pair + params["pos_start"] + lvl_pos[:, : cfg.first_l]
        else:
            next_map = (
                cond[:, None, :] + params["pos_start"] + lvl_pos[:, : cfg.first_l]
            )

        full_mask = (
            jnp.asarray(attn_mask_for_config(cfg)) if cfg.indep else None
        )
        cache_k, cache_v = tfm.init_kv_cache(cfg, 2 * B, cfg.seq_len, compute_dtype)
        z = vqvae.cfg.z_channels
        fh_c = jnp.zeros((B, pns[-1], pns[-1], z), jnp.float32)
        fh_i = jnp.zeros((B, pns[-1], pns[-1], z), jnp.float32)
        step_keys = jax.random.split(key, SN)
        cur = 0
        for si, pn in enumerate(pns):
            seg = cfg.scale_seg_len(si)                            # 2*pn^2 (+sep)
            x = next_map.astype(compute_dtype)
            mask_slice = (
                full_mask[cur : cur + seg, : cur + seg] if cfg.indep else None
            )
            x, cache_k, cache_v = tfm.blocks_decode(
                params["blocks"], x, cond, cfg, cache_k, cache_v, cur,
                mask_slice=mask_slice,
                shared_lin=params.get("shared_ada_lin"),
            )
            logits = tfm.head_logits(params, x, cond, cfg)
            t = cfg_scale * si / (SN - 1)
            logits = (1.0 + t) * logits[:B] - t * logits[B:]
            logits = logits[:, :, : cfg.vocab_size]                # drop separators
            ids = sample_top_k_top_p(step_keys[si], logits, top_k, top_p)    # (B, seg)
            l = pn * pn
            ids_c = ids[:, :l]
            ids_i = ids[:, seg - l : seg]                          # skips sep slot
            if more_smooth:  # gumbel-softmax embeddings (reference: :513-515)
                ratio = si / (SN - 1)
                gum_t = max(0.27 * (1 - ratio * 0.95), 0.005)
                soft = gumbel_softmax(step_keys[si], logits * (1 + ratio), tau=gum_t)
                h_all = soft @ vq_params["quantize"]["embedding"]
                h_c = h_all[:, :l].reshape(B, pn, pn, z)
                h_i = h_all[:, seg - l : seg].reshape(B, pn, pn, z)
            else:
                h_c = quant.embed(vq_params["quantize"], ids_c).reshape(B, pn, pn, z)
                h_i = quant.embed(vq_params["quantize"], ids_i).reshape(B, pn, pn, z)
            fh_c, nxt_c = quant.next_ar_input(vq_params["quantize"], si, fh_c, h_c)
            fh_i, nxt_i = quant.next_ar_input(vq_params["quantize"], si, fh_i, h_i)
            cur += seg
            if si != SN - 1:
                nl = pns[si + 1] ** 2
                nm_c = self._word_embed(params, nxt_c.reshape(B, nl, z))
                nm_i = self._word_embed(params, nxt_i.reshape(B, nl, z))
                if cfg.separator:
                    mapping = separator_mapping(True)
                    sp1 = params["special_embed"][mapping[2 * si]][None, None, :]
                    sp2 = params["special_embed"][mapping[2 * si + 1]][None, None, :]
                    nm = jnp.concatenate(
                        [
                            nm_c, jnp.broadcast_to(sp1, (B, 1, sp1.shape[-1])),
                            nm_i, jnp.broadcast_to(sp2, (B, 1, sp2.shape[-1])),
                        ],
                        axis=1,
                    )
                else:
                    nm = jnp.concatenate([nm_c, nm_i], axis=1)
                nm = nm + lvl_pos[:, cur : cur + cfg.scale_seg_len(si + 1)]
                if cfg.type_pos:
                    tp = self._type_pos(params, True)
                    nm = nm + tp[:, cur : cur + cfg.scale_seg_len(si + 1)]
                next_map = jnp.tile(nm, (2, 1, 1))
        if not decode_img:
            return fh_c, fh_i
        # one batched decoder pass over both canvases (better MXU utilization
        # than two half-batch decodes)
        both = vqvae.fhat_to_img(
            vq_params, jnp.concatenate([fh_c, fh_i], axis=0), compute_dtype
        )
        img_c, img_i = (both[:B] + 1.0) * 0.5, (both[B:] + 1.0) * 0.5
        return img_c, img_i

    # ---- teacher-forced conditional sampling ---------------------------------

    def sample_cond_cfg(
        self,
        params: Params,
        vqvae: VQVAE,
        vq_params: Params,
        labels: jnp.ndarray,               # (B,)
        cond_type: jnp.ndarray,            # (B,)
        key: jax.Array,
        cfg_scales: Tuple[float, float, float] = (4.0, 4.0, 4.0),
        c_mask: Optional[Sequence[jnp.ndarray]] = None,  # per-scale (B, pn^2) gt control ids
        c_img: Optional[Sequence[jnp.ndarray]] = None,   # per-scale (B, pn^2) gt image ids
        top_k: int = 900,
        top_p: float = 0.96,
        compute_dtype=jnp.bfloat16,
        decode_img: bool = True,
    ):
        """Control(or image)-conditional generation with 4-way multi-scale CFG
        and per-scale teacher forcing (reference: control_var.py:223-354).

        The 4B batch is [full | drop-class | drop-class | uncond] with
        cond_type [c, c, 4, 4]; combined logits
        (1+t1)*a + (t2-t1)*b + (t3-t2)*c - t3*d ramped per scale; sampled ids
        of the conditioned 3 copies are overwritten with the ground-truth
        control ids (c_mask) or image ids (c_img).
        """
        cfg = self.cfg
        assert cfg.mask_factor == 2
        quant = MultiScaleQuantizer(vqvae.cfg)
        B = labels.shape[0]
        R = 4
        pns = cfg.patch_nums
        SN = cfg.num_scales
        z = vqvae.cfg.z_channels

        null = jnp.full_like(labels, cfg.num_classes)
        labels4 = jnp.concatenate([labels, null, null, null])
        unc = jnp.full_like(cond_type, COND_UNCOND_ID)
        ct4 = jnp.concatenate([cond_type, cond_type, unc, unc])
        cond = jnp.take(params["class_emb"], labels4, axis=0)       # (4B, C)
        ct_tok = jnp.take(params["cond_embed"], ct4, axis=0)
        lvl_pos = self._lvl_pos(params)
        next_map = (
            jnp.stack([ct_tok, cond], axis=1)
            + params["pos_start"]
            + lvl_pos[:, : cfg.first_l]
        )

        full_mask = jnp.asarray(attn_mask_for_config(cfg)) if cfg.indep else None
        cache_k, cache_v = tfm.init_kv_cache(cfg, R * B, cfg.seq_len, compute_dtype)
        fh_c = jnp.zeros((R * B, pns[-1], pns[-1], z), jnp.float32)
        fh_i = jnp.zeros((R * B, pns[-1], pns[-1], z), jnp.float32)
        step_keys = jax.random.split(key, SN)
        cur = 0
        for si, pn in enumerate(pns):
            seg = cfg.scale_seg_len(si)
            l = pn * pn
            x = next_map.astype(compute_dtype)
            mask_slice = (
                full_mask[cur : cur + seg, : cur + seg] if cfg.indep else None
            )
            x, cache_k, cache_v = tfm.blocks_decode(
                params["blocks"], x, cond, cfg, cache_k, cache_v, cur,
                mask_slice=mask_slice,
                shared_lin=params.get("shared_ada_lin"),
            )
            logits = tfm.head_logits(params, x, cond, cfg)          # (4B, seg, V+)
            t1 = cfg_scales[0] * si / (SN - 1)
            t2 = cfg_scales[1] * si / (SN - 1)
            t3 = cfg_scales[2] * si / (SN - 1)
            combined = (
                (1.0 + t1) * logits[:B]
                + (t2 - t1) * logits[B : 2 * B]
                + (t3 - t2) * logits[2 * B : 3 * B]
                - t3 * logits[3 * B :]
            )
            combined = combined[:, :, : cfg.vocab_size]
            # reference repeats combined logits to 4B and samples each row
            # independently (control_var.py:306-307)
            ids = sample_top_k_top_p(
                step_keys[si], jnp.tile(combined, (R, 1, 1)), top_k, top_p
            )                                                        # (4B, seg)
            if c_mask is not None:
                gt = jnp.tile(c_mask[si], (R, 1))
                force = (jnp.arange(R * B) < 3 * B)[:, None]
                ids = ids.at[:, :l].set(jnp.where(force, gt, ids[:, :l]))
            if c_img is not None:
                gt = jnp.tile(c_img[si], (R, 1))
                force = (jnp.arange(R * B) < 3 * B)[:, None]
                ids = ids.at[:, seg - l :].set(jnp.where(force, gt, ids[:, seg - l :]))
            ids_c = ids[:, :l]
            ids_i = ids[:, seg - l :]
            h_c = quant.embed(vq_params["quantize"], ids_c).reshape(R * B, pn, pn, z)
            h_i = quant.embed(vq_params["quantize"], ids_i).reshape(R * B, pn, pn, z)
            fh_c, nxt_c = quant.next_ar_input(vq_params["quantize"], si, fh_c, h_c)
            fh_i, nxt_i = quant.next_ar_input(vq_params["quantize"], si, fh_i, h_i)
            cur += seg
            if si != SN - 1:
                nl = pns[si + 1] ** 2
                nm_c = self._word_embed(params, nxt_c.reshape(R * B, nl, z))
                nm_i = self._word_embed(params, nxt_i.reshape(R * B, nl, z))
                nm = jnp.concatenate([nm_c, nm_i], axis=1)
                next_map = nm + lvl_pos[:, cur : cur + cfg.scale_seg_len(si + 1)]
        fh_c, fh_i = fh_c[:B], fh_i[:B]
        if not decode_img:
            return fh_c, fh_i
        both = vqvae.fhat_to_img(
            vq_params, jnp.concatenate([fh_c, fh_i], axis=0), compute_dtype
        )
        return (both[:B] + 1.0) * 0.5, (both[B:] + 1.0) * 0.5
