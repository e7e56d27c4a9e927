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
        mask_first: bool = True,
    ):
        """Joint (control, image) CFG generation, multi_cond path
        (reference: control_var.py:356-565 with indep-aware bias slices).

        mask_first: stream order (bidirectional models flip it at random on
        the host per call, reference: control_var.py:403-420). For
        bidirectional non-multi_cond models we follow the TRAINING-side sign
        convention of `_sos` (sign applied to sos+pos_start, -1 when
        mask_first) — the reference's inference uses the opposite sign and
        excludes pos_start (control_var.py:412-417 vs 591-596), a train/infer
        mismatch we deliberately do not replicate.

        Returns (control_img, image_img) each (B, 256, 256, 3) in [0, 1] when
        decode_img, else the two latent canvases. mask_factor==1 ("replace")
        models dispatch to the single-stream sampler and return ONE image
        (resp. one canvas).
        """
        cfg = self.cfg
        if cfg.mask_factor == 1:
            return self._sample_replace_cfg(
                params, vqvae, vq_params, labels, key, cfg_scale, top_k,
                top_p, compute_dtype, decode_img, more_smooth,
            )
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
            pair = (
                jnp.stack([ct_tok, cond], axis=1)                  # (2B, 2, C)
                if mask_first
                else jnp.stack([cond, ct_tok], axis=1)
            )
            next_map = pair + params["pos_start"] + lvl_pos[:, : cfg.first_l]
        else:
            sos = cond[:, None, :] + params["pos_start"]
            if cfg.bidirectional and cfg.mask_factor == 2:
                sign = -1.0 if mask_first else 1.0
                half = cfg.first_l // 2
                ch = jnp.concatenate(
                    [jnp.full((half,), sign), jnp.full((half,), -sign)]
                )[None, :, None]
                sos = sos * ch
            next_map = sos + lvl_pos[:, : cfg.first_l]

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
            t = cfg_scale * si / (SN - 1)
            # CFG weights sum to 1 -> combine BEFORE the head matmul
            # (tfm.head_logits_cfg): R-fold smaller vocab projection + logits
            logits = tfm.head_logits_cfg(params, x, cond, cfg, (1.0 + t, -t))
            logits = logits[:, :, : cfg.vocab_size]                # drop separators
            k_sample, k_gumbel = jax.random.split(step_keys[si])
            ids = sample_top_k_top_p(k_sample, logits, top_k, top_p)    # (B, seg)
            l = pn * pn
            # segment layout: [control(l), sep?, image(l), sep?] — image tokens
            # sit at [l+num_sp, 2l+num_sp) (reference: control_var.py:508)
            num_sp = 1 if (cfg.separator and si > 0) else 0
            ids_c = ids[:, :l]
            ids_i = ids[:, l + num_sp : 2 * l + num_sp]
            if more_smooth:  # gumbel-softmax embeddings (reference: :513-515)
                ratio = si / (SN - 1)
                gum_t = max(0.27 * (1 - ratio * 0.95), 0.005)
                soft = gumbel_softmax(k_gumbel, logits * (1 + ratio), tau=gum_t)
                h_all = soft @ vq_params["quantize"]["embedding"]
                h_c = h_all[:, :l].reshape(B, pn, pn, z)
                h_i = h_all[:, l + num_sp : 2 * l + num_sp].reshape(B, pn, pn, z)
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
                    mapping = separator_mapping(mask_first)
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
                    tp = self._type_pos(params, mask_first)
                    nm = nm + tp[:, cur : cur + cfg.scale_seg_len(si + 1)]
                next_map = jnp.tile(nm, (2, 1, 1))
        if not mask_first:  # first stream was the image: swap back
            fh_c, fh_i = fh_i, fh_c
        if not decode_img:
            return fh_c, fh_i
        # one batched decoder pass over both canvases (better MXU utilization
        # than two half-batch decodes)
        both = vqvae.fhat_to_img(
            vq_params, jnp.concatenate([fh_c, fh_i], axis=0), compute_dtype
        )
        img_c, img_i = (both[:B] + 1.0) * 0.5, (both[B:] + 1.0) * 0.5
        return img_c, img_i

    # ---- replace-mode (mask_factor == 1) sampling ----------------------------

    def _sample_replace_cfg(
        self,
        params: Params,
        vqvae: VQVAE,
        vq_params: Params,
        labels: jnp.ndarray,              # (B,)
        key: jax.Array,
        cfg_scale: float = 4.0,
        top_k: int = 900,
        top_p: float = 0.96,
        compute_dtype=jnp.bfloat16,
        decode_img: bool = True,
        more_smooth: bool = False,
    ):
        """mask_factor==1 ("replace") CFG sampling: ONE token stream and ONE
        latent canvas per sample, per-scale segments of pn^2 tokens
        (reference: models/control_var.py:493-541, the `self.mask_factor == 1`
        arm of `autoregressive_infer_cfg`). Deliberate deviations from the
        reference, both documented defects there:
          - the reference's epilogue decodes `f_hat_1`/`f_hat_2`, which are
            never assigned on the m==1 branch (control_var.py:563-565 raises
            NameError) — we decode the single canvas;
          - separator stripping on this branch indexes the m==2 segment
            layout (control_var.py:510-512) — separator models are rejected.
        The sos is the plain class embedding (first_l == 1): the reference's
        multi_cond pair construction assumes first_l == 2 and would shape-
        mismatch pos_start at m==1 (control_var.py:400-408 vs :62).

        Returns one image (B, 256, 256, 3) in [0, 1] when decode_img, else
        the latent canvas.
        """
        cfg = self.cfg
        assert cfg.mask_factor == 1
        assert not cfg.separator, "separator is m==2-only in the reference"
        quant = MultiScaleQuantizer(vqvae.cfg)
        B = labels.shape[0]
        pns = cfg.patch_nums
        SN = cfg.num_scales
        z = vqvae.cfg.z_channels

        labels2 = jnp.concatenate([labels, jnp.full_like(labels, cfg.num_classes)])
        cond = jnp.take(params["class_emb"], labels2, axis=0)      # (2B, C)
        lvl_pos = self._lvl_pos(params)
        sos = cond[:, None, :] + params["pos_start"]               # first_l == 1
        next_map = sos + lvl_pos[:, : cfg.first_l]

        full_mask = jnp.asarray(attn_mask_for_config(cfg)) if cfg.indep else None
        cache_k, cache_v = tfm.init_kv_cache(cfg, 2 * B, cfg.seq_len, compute_dtype)
        fh = jnp.zeros((B, pns[-1], pns[-1], z), jnp.float32)
        step_keys = jax.random.split(key, SN)
        cur = 0
        for si, pn in enumerate(pns):
            seg = cfg.scale_seg_len(si)                            # pn^2
            x = next_map.astype(compute_dtype)
            mask_slice = (
                full_mask[cur : cur + seg, : cur + seg] if cfg.indep else None
            )
            x, cache_k, cache_v = tfm.blocks_decode(
                params["blocks"], x, cond, cfg, cache_k, cache_v, cur,
                mask_slice=mask_slice,
                shared_lin=params.get("shared_ada_lin"),
            )
            t = cfg_scale * si / (SN - 1)
            # CFG weights sum to 1 -> combine BEFORE the head matmul
            # (tfm.head_logits_cfg): R-fold smaller vocab projection + logits
            logits = tfm.head_logits_cfg(params, x, cond, cfg, (1.0 + t, -t))
            logits = logits[:, :, : cfg.vocab_size]
            k_sample, k_gumbel = jax.random.split(step_keys[si])
            ids = sample_top_k_top_p(k_sample, logits, top_k, top_p)  # (B, seg)
            if more_smooth:
                ratio = si / (SN - 1)
                gum_t = max(0.27 * (1 - ratio * 0.95), 0.005)
                soft = gumbel_softmax(k_gumbel, logits * (1 + ratio), tau=gum_t)
                h = (soft @ vq_params["quantize"]["embedding"]).reshape(B, pn, pn, z)
            else:
                h = quant.embed(vq_params["quantize"], ids).reshape(B, pn, pn, z)
            fh, nxt = quant.next_ar_input(vq_params["quantize"], si, fh, h)
            cur += seg
            if si != SN - 1:
                nl = pns[si + 1] ** 2
                nm = self._word_embed(params, nxt.reshape(B, nl, z))
                nm = nm + lvl_pos[:, cur : cur + cfg.scale_seg_len(si + 1)]
                next_map = jnp.tile(nm, (2, 1, 1))
        if not decode_img:
            return fh
        img = vqvae.fhat_to_img(vq_params, fh, compute_dtype)
        return (img + 1.0) * 0.5

    # ---- separate-decoding joint sampling (sequential per-segment) -----------

    def sample_joint_separate(
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
        mask_first: bool = True,
    ):
        """`separate_decoding` (non-indep) joint generation: the control and
        image segments of each scale are decoded SEQUENTIALLY — 2S transformer
        calls instead of S (reference: control_var.py:430-485).

        Per scale k: the control segment is sampled first and updates canvas
        fh_1; the image segment's input is fh_1 area-resized to the SAME
        scale (cross-stream conditioning); the image segment updates fh_2,
        whose area-downsample feeds scale k+1's control segment.

        type_pos is rejected: the reference's separate-decoding type_pos slice
        is length-mismatched and would raise (control_var.py:483-484).
        """
        cfg = self.cfg
        assert cfg.separate_decoding and not cfg.indep
        assert cfg.mask_factor == 2 and cfg.multi_cond
        assert not cfg.type_pos, "broken in the reference (control_var.py:483-484)"
        quant = MultiScaleQuantizer(vqvae.cfg)
        from controlvar_tpu.ops.resize import resize_area

        B = labels.shape[0]
        pns = cfg.patch_nums
        SN = cfg.num_scales
        z = vqvae.cfg.z_channels

        labels2 = jnp.concatenate([labels, jnp.full_like(labels, cfg.num_classes)])
        cond = jnp.take(params["class_emb"], labels2, axis=0)
        ct2 = jnp.concatenate([cond_type, jnp.full_like(cond_type, COND_UNCOND_ID)])
        lvl_pos = self._lvl_pos(params)
        ct_tok = jnp.take(params["cond_embed"], ct2, axis=0)
        pair = (
            jnp.stack([ct_tok, cond], axis=1)
            if mask_first
            else jnp.stack([cond, ct_tok], axis=1)
        )
        first = pair + params["pos_start"] + lvl_pos[:, : cfg.first_l]
        nm_1, nm_2 = first[:, : pns[0] ** 2], first[:, pns[0] ** 2 :]

        cache_k, cache_v = tfm.init_kv_cache(cfg, 2 * B, cfg.seq_len, compute_dtype)
        fh_1 = jnp.zeros((B, pns[-1], pns[-1], z), jnp.float32)
        fh_2 = jnp.zeros((B, pns[-1], pns[-1], z), jnp.float32)
        iter_pns = [pn for pn in pns for _ in range(2)]
        step_keys = jax.random.split(key, 2 * SN)
        mapping = separator_mapping(mask_first)
        cur = 0
        num_sp = 0
        x_next = None
        for si, pn in enumerate(iter_pns):
            sc = si // 2
            ratio = sc / (SN - 1)
            l = pn * pn
            seg = l + num_sp
            x = nm_1 if si == 0 else (nm_2 if si == 1 else x_next)
            x, cache_k, cache_v = tfm.blocks_decode(
                params["blocks"], x.astype(compute_dtype), cond, cfg,
                cache_k, cache_v, cur,
                shared_lin=params.get("shared_ada_lin"),
            )
            t = cfg_scale * ratio
            logits = tfm.head_logits_cfg(params, x, cond, cfg, (1.0 + t, -t))
            logits = logits[:, :, : cfg.vocab_size]
            k_sample, k_gumbel = jax.random.split(step_keys[si])
            ids = sample_top_k_top_p(k_sample, logits, top_k, top_p)  # (B, seg)
            if num_sp:  # discard the trailing separator slot (reference: :456-458)
                ids = ids[:, :l]
            if more_smooth:
                gum_t = max(0.27 * (1 - ratio * 0.95), 0.005)
                soft = gumbel_softmax(k_gumbel, logits[:, :l] * (1 + ratio), tau=gum_t)
                h = (soft @ vq_params["quantize"]["embedding"]).reshape(B, pn, pn, z)
            else:
                h = quant.embed(vq_params["quantize"], ids).reshape(B, pn, pn, z)
            cur += seg
            if si % 2 == 0:   # control segment -> image input at the SAME scale
                fh_1, _ = quant.next_ar_input(vq_params["quantize"], sc, fh_1, h)
                nxt = resize_area(fh_1, iter_pns[si + 1], iter_pns[si + 1])
            else:             # image segment -> next scale's control input
                fh_2, nxt = quant.next_ar_input(vq_params["quantize"], sc, fh_2, h)
            if si == 2 * SN - 1:
                break
            if si >= 1:
                nl = iter_pns[si + 1] ** 2
                nm = self._word_embed(params, nxt.reshape(B, nl, z))
                if cfg.separator:
                    sp = params["special_embed"][mapping[si - 1]][None, None, :]
                    nm = jnp.concatenate(
                        [nm, jnp.broadcast_to(sp, (B, 1, sp.shape[-1]))], axis=1
                    )
                    num_sp = 1
                nm = nm + lvl_pos[:, cur : cur + nl + num_sp]
                x_next = jnp.tile(nm, (2, 1, 1))
        if not mask_first:
            fh_1, fh_2 = fh_2, fh_1
        if not decode_img:
            return fh_1, fh_2
        both = vqvae.fhat_to_img(
            vq_params, jnp.concatenate([fh_1, fh_2], axis=0), compute_dtype
        )
        return (both[:B] + 1.0) * 0.5, (both[B:] + 1.0) * 0.5

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
        repeat_num: int = 4,
        more_smooth: bool = False,
    ):
        """Control(or image)-conditional generation with multi-scale CFG
        and per-scale teacher forcing (reference: control_var.py:223-354).

        repeat_num=4: batch [full | drop-class | drop-class+type | uncond]
        with cond_type [c, c, 4, 4]; combined logits
        (1+t1)*a + (t2-t1)*b + (t3-t2)*c - t3*d ramped per scale
        (reference: control_var.py:294-300). repeat_num=3 drops the third
        copy: (1+t1)*a + (t2-t1)*b - t2*c (reference: control_var.py:301-307).

        TPU redesign of the token bookkeeping: the reference tiles the
        combined logits to R*B rows and samples/updates R*B canvases, of which
        only row block 0 is ever output (control_var.py:306-324). All R-1
        conditioned copies are teacher-forced with the same ground truth, so
        their token streams — and thus next-scale inputs — are interchangeable.
        We keep TWO token-stream groups (forced, uncond): quantizer updates,
        codebook embeds and word embeds run at 2B instead of R*B, and the
        forced group's next-map is tiled to the R-1 conditioned rows. The
        transformer still runs all R CFG branches. Identical to the reference
        under greedy sampling; under stochastic sampling the conditioned
        guidance branches share one sampled stream (standard CFG practice)
        instead of the reference's independently-resampled prefixes.

        more_smooth: canvases built from gumbel-softmax soft embeddings of the
        combined logits instead of sampled-token embeddings (reference:
        control_var.py:326-331; as in the reference, teacher forcing then only
        affects the returned ids, not the canvases — visualization mode).
        """
        cfg = self.cfg
        assert cfg.mask_factor == 2
        assert not cfg.separator and not cfg.type_pos, (
            "the reference conditional_infer_cfg does not support "
            "separator/type_pos models (control_var.py:223-354 never splices "
            "separators nor adds type positions)"
        )
        assert repeat_num in (3, 4)
        quant = MultiScaleQuantizer(vqvae.cfg)
        B = labels.shape[0]
        R = repeat_num
        pns = cfg.patch_nums
        SN = cfg.num_scales
        z = vqvae.cfg.z_channels

        null = jnp.full_like(labels, cfg.num_classes)
        labels_r = jnp.concatenate([labels] + [null] * (R - 1))
        unc = jnp.full_like(cond_type, COND_UNCOND_ID)
        ct_r = jnp.concatenate([cond_type, cond_type] + [unc] * (R - 2))
        cond = jnp.take(params["class_emb"], labels_r, axis=0)       # (RB, C)
        ct_tok = jnp.take(params["cond_embed"], ct_r, axis=0)
        lvl_pos = self._lvl_pos(params)
        next_map = (
            jnp.stack([ct_tok, cond], axis=1)
            + params["pos_start"]
            + lvl_pos[:, : cfg.first_l]
        )

        full_mask = jnp.asarray(attn_mask_for_config(cfg)) if cfg.indep else None
        cache_k, cache_v = tfm.init_kv_cache(cfg, R * B, cfg.seq_len, compute_dtype)
        # 2 token-stream groups: [forced copies (B) | uncond copy (B)]
        fh_c = jnp.zeros((2 * B, pns[-1], pns[-1], z), jnp.float32)
        fh_i = jnp.zeros((2 * B, pns[-1], pns[-1], z), jnp.float32)
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
            t1 = cfg_scales[0] * si / (SN - 1)
            t2 = cfg_scales[1] * si / (SN - 1)
            t3 = cfg_scales[2] * si / (SN - 1)
            # multi-scale CFG combined BEFORE the head matmul (weights sum
            # to 1, reference formula: control_var.py:288-307)
            w = ((1.0 + t1, t2 - t1, t3 - t2, -t3) if R == 4
                 else (1.0 + t1, t2 - t1, -t2))
            combined = tfm.head_logits_cfg(params, x, cond, cfg, w)
            combined = combined[:, :, : cfg.vocab_size]
            k_sample, k_gumbel = jax.random.split(step_keys[si])
            # Draw only token positions that are consumed: the forced group's
            # teacher-forced half is overwritten anyway, so sample
            # [forced-group's needed half | uncond-group full] columns in one
            # call instead of tiling to 2B full rows (25% less top-k work).
            parts = []
            if c_mask is None:
                parts.append(combined[:, :l])
            if c_img is None:
                parts.append(combined[:, l:])
            na = sum(p.shape[1] for p in parts)
            out = sample_top_k_top_p(
                k_sample, jnp.concatenate(parts + [combined], axis=1),
                top_k, top_p,
            )                                                  # (B, na + seg)
            a_sampled, b_ids = out[:, :na], out[:, na:]
            a_ctrl = c_mask[si] if c_mask is not None else a_sampled[:, :l]
            a_img = c_img[si] if c_img is not None else a_sampled[:, na - l:]
            ids = jnp.concatenate(
                [jnp.concatenate([a_ctrl, a_img], axis=1), b_ids], axis=0
            )                                                  # (2B, seg)
            if more_smooth:
                ratio = si / (SN - 1)
                gum_t = max(0.27 * (1 - ratio * 0.95), 0.005)
                soft = gumbel_softmax(
                    k_gumbel, jnp.tile(combined, (2, 1, 1)) * (1 + ratio), tau=gum_t
                )
                h_all = soft @ vq_params["quantize"]["embedding"]
                h_c = h_all[:, :l].reshape(2 * B, pn, pn, z)
                h_i = h_all[:, l:].reshape(2 * B, pn, pn, z)
            else:
                h_c = quant.embed(vq_params["quantize"], ids[:, :l]).reshape(2 * B, pn, pn, z)
                h_i = quant.embed(vq_params["quantize"], ids[:, l:]).reshape(2 * B, pn, pn, z)
            fh_c, nxt_c = quant.next_ar_input(vq_params["quantize"], si, fh_c, h_c)
            fh_i, nxt_i = quant.next_ar_input(vq_params["quantize"], si, fh_i, h_i)
            cur += seg
            if si != SN - 1:
                nl = pns[si + 1] ** 2
                nm_c = self._word_embed(params, nxt_c.reshape(2 * B, nl, z))
                nm_i = self._word_embed(params, nxt_i.reshape(2 * B, nl, z))
                nm = jnp.concatenate([nm_c, nm_i], axis=1)
                nm = nm + lvl_pos[:, cur : cur + cfg.scale_seg_len(si + 1)]
                next_map = jnp.concatenate(
                    [jnp.tile(nm[:B], (R - 1, 1, 1)), nm[B:]], axis=0
                )
        fh_c, fh_i = fh_c[:B], fh_i[:B]
        if not decode_img:
            return fh_c, fh_i
        both = vqvae.fhat_to_img(
            vq_params, jnp.concatenate([fh_c, fh_i], axis=0), compute_dtype
        )
        return (both[:B] + 1.0) * 0.5, (both[B:] + 1.0) * 0.5
