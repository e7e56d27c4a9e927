"""Step-wise compiled samplers.

The monolithic one-jit 10-scale decode produces a single huge XLA program
whose compile time grows superlinearly (observed 90s -> 40+min as the graph
evolved). This module compiles ONE SMALL JIT PER SCALE instead — each step
compiles in seconds — and chains them through on-device buffers: no host
round-trip between steps, so the async dispatch pipeline keeps the chip as
busy as the fused version.

Same math as ControlVARModel.sample_joint_cfg / sample_cond_cfg.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from controlvar_tpu.config import COND_UNCOND_ID, ControlVARConfig
from controlvar_tpu.models import transformer as tfm
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.masks import attn_mask_for_config
from controlvar_tpu.models.quantizer import MultiScaleQuantizer
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.models.control_var import separator_mapping
from controlvar_tpu.ops.sampling import gumbel_softmax, sample_top_k_top_p

Params = Dict



def _windowed_segs(segs_k, segs_v, w):
    """Scale-aware KV window over per-scale cache segments: keep the FIRST
    segment (SOS + scale-0 tokens — the attention sink every later scale
    leans on) and the last `w` scale segments, dropping the middle. Opt-in
    lossy acceleration in the spirit of the VAR KV-compression line
    (AMS-KV, scale-aware KV cache compression — PAPERS.md); identity while
    the prefix is short. Static shapes: the kept set depends only on the
    scale index, so each per-scale jit compiles a fixed smaller prefix."""
    if w is None or len(segs_k) <= w + 1:
        return segs_k, segs_v
    return segs_k[:1] + segs_k[-w:], segs_v[:1] + segs_v[-w:]


class _PrepareParamsMixin:
    compute_dtype = jnp.bfloat16

    def prepare_params(self, params: Params) -> Params:
        """Cast block weights to bf16 once (halves weight HBM reads per decode
        step and removes per-step fp32->bf16 converts). Embeddings/head stay
        fp32 — matching the reference's autocast boundary."""
        out = dict(params)
        out["blocks"] = jax.tree_util.tree_map(
            lambda a: a.astype(self.compute_dtype)
            if a.dtype == jnp.float32 else a,
            params["blocks"],
        )
        return out


@dataclasses.dataclass
class StepwiseJointSampler(_PrepareParamsMixin):
    """Joint (control, image) CFG generation, one jit per scale.

    mask_first: stream order for bidirectional models (host-side coin flip
    per call in the reference, control_var.py:403-420). Returned canvases are
    always (control, image) regardless of order."""

    model: ControlVARModel
    vqvae: VQVAE
    cfg_scale: float = 4.0
    top_k: int = 900
    top_p: float = 0.96
    groups: Optional[Tuple[Tuple[int, ...], ...]] = None
    mask_first: bool = True
    more_smooth: bool = False
    cache_mode: str = "stacked"  # "seg": per-scale segments (blocks_decode_seg)
    kv_window: Optional[int] = None  # scale-aware KV window (seg mode only)
    compute_dtype = jnp.bfloat16

    def __post_init__(self):
        cfg = self.model.cfg
        assert cfg.mask_factor == 2
        self.quant = MultiScaleQuantizer(self.vqvae.cfg)
        self._full_mask = attn_mask_for_config(cfg) if cfg.indep else None

        if self.groups is None:
            # cheap early scales fused into one jit; big scales individual:
            # balances compile time (each sub-graph small) against per-call
            # dispatch latency on the remote-tunnel runtime
            n = cfg.num_scales
            head = tuple(range(max(0, n - 3)))
            self.groups = (head,) + tuple((si,) for si in range(len(head), n))
        if self.cache_mode == "seg" and tfm.kv_layout(cfg) != "paired":
            self.cache_mode = "stacked"
        if self.kv_window is not None:
            if self.cache_mode != "seg":
                raise ValueError("kv_window requires cache_mode='seg' "
                                 "(paired KV layout)")
            if self._full_mask is not None:
                raise ValueError("kv_window is unsupported with indep "
                                 "masking (mask columns index the full "
                                 "prefix)")
        donate = (6, 7) if self.cache_mode == "seg" else (4, 5, 6, 7)
        self._prologue = jax.jit(self._prologue_fn)
        # donate caches + canvases: the returned buffers alias the inputs,
        # halving live cache memory and skipping a copy per step
        self._group_fns = [
            jax.jit(functools.partial(self._group_fn, grp),
                    donate_argnums=donate)
            for grp in self.groups
        ]
        self._epilogue = jax.jit(self._epilogue_fn)

    # -- pieces ---------------------------------------------------------------

    def _prologue_fn(self, params, labels, cond_type):
        cfg = self.model.cfg
        labels2 = jnp.concatenate([labels, jnp.full_like(labels, cfg.num_classes)])
        cond = jnp.take(params["class_emb"], labels2, axis=0)
        ct2 = jnp.concatenate(
            [cond_type, jnp.full_like(cond_type, COND_UNCOND_ID)]
        )
        lvl_pos = self.model._lvl_pos(params)
        if cfg.multi_cond:
            ct_tok = jnp.take(params["cond_embed"], ct2, axis=0)
            pair = (
                jnp.stack([ct_tok, cond], axis=1)
                if self.mask_first
                else jnp.stack([cond, ct_tok], axis=1)
            )
            next_map = pair + params["pos_start"] + lvl_pos[:, : cfg.first_l]
        else:
            sos = cond[:, None, :] + params["pos_start"]
            if cfg.bidirectional and cfg.mask_factor == 2:
                # training-side sign convention (see ControlVARModel._sos)
                sign = -1.0 if self.mask_first else 1.0
                half = cfg.first_l // 2
                ch = jnp.concatenate(
                    [jnp.full((half,), sign), jnp.full((half,), -sign)]
                )[None, :, None]
                sos = sos * ch
            next_map = sos + lvl_pos[:, : cfg.first_l]
        return cond, next_map

    def _step_fn(self, si, params, vq_params, cond, next_map,
                 cache_k, cache_v, fh_c, fh_i, key):
        cfg = self.model.cfg
        pns = cfg.patch_nums
        SN = cfg.num_scales
        pn = pns[si]
        seg = cfg.scale_seg_len(si)
        cur = cfg.begin_ends[si][0]
        B2 = next_map.shape[0]
        B = B2 // 2
        z = self.vqvae.cfg.z_channels

        mask_slice = None
        if self._full_mask is not None:
            mask_slice = jnp.asarray(
                self._full_mask[cur : cur + seg, : cur + seg]
            )
        x = next_map.astype(self.compute_dtype)
        # carry-based preallocated cache: measured faster than the growing
        # variant (595ms vs 677ms per B=16 batch) — concat rewrites the whole
        # cache per layer while DUS writes only the new columns
        if self.cache_mode == "seg":
            sk, sv = _windowed_segs(cache_k, cache_v, self.kv_window)
            x, k_new, v_new = tfm.blocks_decode_seg(
                params["blocks"], x, cond, cfg, sk, sv,
                mask_slice=mask_slice, shared_lin=params.get("shared_ada_lin"),
            )
            cache_k = cache_k + (k_new,)
            cache_v = cache_v + (v_new,)
        else:
            x, cache_k, cache_v = tfm.blocks_decode_any(
                params["blocks"], x, cond, cfg, cache_k, cache_v, cur,
                mask_slice=mask_slice, shared_lin=params.get("shared_ada_lin"),
            )
        t = self.cfg_scale * si / (SN - 1)
        # CFG combined BEFORE the head matmul (weights sum to 1): 2x smaller
        # vocab projection and fp32 logits tensor (tfm.head_logits_cfg)
        logits = tfm.head_logits_cfg(params, x, cond, cfg, (1.0 + t, -t))
        logits = logits[:, :, : cfg.vocab_size]
        k_sample, k_gumbel = jax.random.split(key)
        ids = sample_top_k_top_p(k_sample, logits, self.top_k, self.top_p)
        l = pn * pn
        # image tokens at [l+num_sp, 2l+num_sp) (reference: control_var.py:508)
        num_sp = 1 if (cfg.separator and si > 0) else 0
        ids_c, ids_i = ids[:, :l], ids[:, l + num_sp : 2 * l + num_sp]
        if self.more_smooth:  # gumbel soft embeds (reference: :513-515)
            ratio = si / (SN - 1)
            gum_t = max(0.27 * (1 - ratio * 0.95), 0.005)
            soft = gumbel_softmax(k_gumbel, logits * (1 + ratio), tau=gum_t)
            h_all = soft @ vq_params["quantize"]["embedding"]
            h_c = h_all[:, :l].reshape(B, pn, pn, z)
            h_i = h_all[:, l + num_sp : 2 * l + num_sp].reshape(B, pn, pn, z)
        else:
            h_c = self.quant.embed(vq_params["quantize"], ids_c).reshape(B, pn, pn, z)
            h_i = self.quant.embed(vq_params["quantize"], ids_i).reshape(B, pn, pn, z)
        fh_c, nxt_c = self.quant.next_ar_input(vq_params["quantize"], si, fh_c, h_c)
        fh_i, nxt_i = self.quant.next_ar_input(vq_params["quantize"], si, fh_i, h_i)
        if si != SN - 1:
            nl = pns[si + 1] ** 2
            lvl_pos = self.model._lvl_pos(params)
            nm_c = self.model._word_embed(params, nxt_c.reshape(B, nl, z))
            nm_i = self.model._word_embed(params, nxt_i.reshape(B, nl, z))
            if cfg.separator:
                mapping = separator_mapping(self.mask_first)
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
            nxt_cur = cfg.begin_ends[si + 1][0]
            nxt_seg = cfg.scale_seg_len(si + 1)
            nm = nm + lvl_pos[:, nxt_cur : nxt_cur + nxt_seg]
            if cfg.type_pos:
                tp = self.model._type_pos(params, self.mask_first)
                nm = nm + tp[:, nxt_cur : nxt_cur + nxt_seg]
            next_map = jnp.tile(nm, (2, 1, 1))
        return next_map, cache_k, cache_v, fh_c, fh_i

    def _group_fn(self, si_list, params, vq_params, cond, next_map,
                  cache_k, cache_v, fh_c, fh_i, keys):
        for j, si in enumerate(si_list):
            next_map, cache_k, cache_v, fh_c, fh_i = self._step_fn(
                si, params, vq_params, cond, next_map, cache_k, cache_v,
                fh_c, fh_i, keys[j],
            )
        return next_map, cache_k, cache_v, fh_c, fh_i

    def _epilogue_fn(self, vq_params, fh_c, fh_i):
        B = fh_c.shape[0]
        both = self.vqvae.fhat_to_img(
            vq_params, jnp.concatenate([fh_c, fh_i], axis=0), self.compute_dtype
        )
        return (both[:B] + 1.0) * 0.5, (both[B:] + 1.0) * 0.5

    # -- run -------------------------------------------------------------------

    def __call__(self, params, vq_params, labels, cond_type, key,
                 decode_img: bool = True):
        cfg = self.model.cfg
        B = labels.shape[0]
        pns = cfg.patch_nums
        z = self.vqvae.cfg.z_channels
        cond, next_map = self._prologue(params, labels, cond_type)
        if self.cache_mode == "seg":
            cache_k, cache_v = (), ()
        else:
            cache_k, cache_v = tfm.decode_caches(cfg, 2 * B, cfg.seq_len,
                                                 self.compute_dtype)
        fh_c = jnp.zeros((B, pns[-1], pns[-1], z), jnp.float32)
        fh_i = jnp.zeros((B, pns[-1], pns[-1], z), jnp.float32)
        keys = jax.random.split(key, cfg.num_scales)
        off = 0
        for grp, fn in zip(self.groups, self._group_fns):
            next_map, cache_k, cache_v, fh_c, fh_i = fn(
                params, vq_params, cond, next_map, cache_k, cache_v,
                fh_c, fh_i, keys[off : off + len(grp)],
            )
            off += len(grp)
        if not self.mask_first:  # first stream was the image: swap back
            fh_c, fh_i = fh_i, fh_c
        if not decode_img:
            return fh_c, fh_i
        return self._epilogue(vq_params, fh_c, fh_i)


@dataclasses.dataclass
class StepwiseVARSampler(_PrepareParamsMixin):
    """Plain-VAR class-conditional CFG sampler, one jit per scale group
    (same math as VARModel.sample_cfg; bit-identical key schedule)."""

    model: "object"  # VARModel
    vqvae: VQVAE
    cfg_scale: float = 1.5
    top_k: int = 900
    top_p: float = 0.96
    groups: Optional[Tuple[Tuple[int, ...], ...]] = None
    cache_mode: str = "stacked"  # "seg": per-scale segments (blocks_decode_seg)
    kv_window: Optional[int] = None  # scale-aware KV window (seg mode only)
    compute_dtype = jnp.bfloat16

    def __post_init__(self):
        cfg = self.model.cfg
        self.quant = MultiScaleQuantizer(self.vqvae.cfg)
        self._full_mask = None  # plain VAR has no indep masking
        if self.groups is None:
            n = cfg.num_scales
            head = tuple(range(max(0, n - 3)))
            self.groups = (head,) + tuple((si,) for si in range(len(head), n))
        if self.cache_mode == "seg" and tfm.kv_layout(cfg) != "paired":
            self.cache_mode = "stacked"
        if self.kv_window is not None:
            if self.cache_mode != "seg":
                raise ValueError("kv_window requires cache_mode='seg' "
                                 "(paired KV layout)")
            if self._full_mask is not None:
                raise ValueError("kv_window is unsupported with indep "
                                 "masking (mask columns index the full "
                                 "prefix)")
        donate = (6,) if self.cache_mode == "seg" else (4, 5, 6)
        self._prologue = jax.jit(self._prologue_fn)
        self._group_fns = [
            jax.jit(functools.partial(self._group_fn, grp),
                    donate_argnums=donate)
            for grp in self.groups
        ]
        self._epilogue = jax.jit(
            lambda vp, fh: (self.vqvae.fhat_to_img(vp, fh, self.compute_dtype) + 1.0) * 0.5
        )

    def _prologue_fn(self, params, labels):
        cfg = self.model.cfg
        labels2 = jnp.concatenate([labels, jnp.full_like(labels, cfg.num_classes)])
        cond = jnp.take(params["class_emb"], labels2, axis=0)
        lvl_pos = self.model._lvl_pos(params)
        next_map = cond[:, None, :] + params["pos_start"] + lvl_pos[:, : cfg.first_l]
        return cond, next_map

    def _group_fn(self, si_list, params, vq_params, cond, next_map,
                  cache_k, cache_v, f_hat, keys):
        for j, si in enumerate(si_list):
            next_map, cache_k, cache_v, f_hat = self._step_fn(
                si, params, vq_params, cond, next_map, cache_k, cache_v,
                f_hat, keys[j],
            )
        return next_map, cache_k, cache_v, f_hat

    def _step_fn(self, si, params, vq_params, cond, next_map,
                 cache_k, cache_v, f_hat, key):
        cfg = self.model.cfg
        pns = cfg.patch_nums
        SN = cfg.num_scales
        pn = pns[si]
        l = pn * pn
        cur = sum(p * p for p in pns[:si])
        B = next_map.shape[0] // 2
        z = self.vqvae.cfg.z_channels
        x = next_map.astype(self.compute_dtype)
        if self.cache_mode == "seg":
            sk, sv = _windowed_segs(cache_k, cache_v, self.kv_window)
            x, k_new, v_new = tfm.blocks_decode_seg(
                params["blocks"], x, cond, cfg, sk, sv,
                shared_lin=params.get("shared_ada_lin"),
            )
            cache_k = cache_k + (k_new,)
            cache_v = cache_v + (v_new,)
        else:
            x, cache_k, cache_v = tfm.blocks_decode_any(
                params["blocks"], x, cond, cfg, cache_k, cache_v, cur,
                shared_lin=params.get("shared_ada_lin"),
            )
        t = self.cfg_scale * si / (SN - 1)
        logits = tfm.head_logits_cfg(params, x, cond, cfg, (1.0 + t, -t))
        k_sample, _ = jax.random.split(key)  # keep key schedule == fused sampler
        ids = sample_top_k_top_p(k_sample, logits, self.top_k, self.top_p)
        h = self.quant.embed(vq_params["quantize"], ids).reshape(B, pn, pn, z)
        f_hat, nxt = self.quant.next_ar_input(vq_params["quantize"], si, f_hat, h)
        if si != SN - 1:
            nl = pns[si + 1] ** 2
            lvl_pos = self.model._lvl_pos(params)
            nm = self.model._word_embed(params, nxt.reshape(B, nl, z))
            nm = nm + lvl_pos[:, cur + l : cur + l + nl]
            next_map = jnp.tile(nm, (2, 1, 1))
        return next_map, cache_k, cache_v, f_hat

    def __call__(self, params, vq_params, labels, key, decode_img: bool = True):
        cfg = self.model.cfg
        B = labels.shape[0]
        pns = cfg.patch_nums
        z = self.vqvae.cfg.z_channels
        cond, next_map = self._prologue(params, labels)
        if self.cache_mode == "seg":
            cache_k, cache_v = (), ()
        else:
            cache_k, cache_v = tfm.decode_caches(cfg, 2 * B, cfg.seq_len,
                                                 self.compute_dtype)
        f_hat = jnp.zeros((B, pns[-1], pns[-1], z), jnp.float32)
        keys = jax.random.split(key, cfg.num_scales)
        off = 0
        for grp, fn in zip(self.groups, self._group_fns):
            next_map, cache_k, cache_v, f_hat = fn(
                params, vq_params, cond, next_map, cache_k, cache_v,
                f_hat, keys[off : off + len(grp)],
            )
            off += len(grp)
        if not decode_img:
            return f_hat
        return self._epilogue(vq_params, f_hat)


@dataclasses.dataclass
class StepwiseCondSampler(_PrepareParamsMixin):
    """Teacher-forced conditional sampler (multi-scale CFG), one jit per
    scale group — same math as ControlVARModel.sample_cond_cfg, including its
    2-token-stream-group bookkeeping (forced copies share one stream; only
    the transformer runs all `repeat_num` CFG branches)."""

    model: ControlVARModel
    vqvae: VQVAE
    cfg_scales: Tuple[float, float, float] = (4.0, 4.0, 4.0)
    top_k: int = 900
    top_p: float = 0.96
    force: str = "control"  # teacher-force "control" (c_mask) or "image" (c_img)
    groups: Optional[Tuple[Tuple[int, ...], ...]] = None
    repeat_num: int = 4     # CFG branches: 4 or 3 (reference: control_var.py:294-307)
    more_smooth: bool = False
    decode: str = "both"    # "both" = reference semantics (stacked control+image
                            # pixels); "image" decodes only the generated image
                            # canvas — in conditional mode the control stream is
                            # an INPUT, so this halves the VQVAE decode cost
    kv_window: Optional[int] = None  # scale-aware KV window (seg mode only)
    cache_mode: str = "stacked"  # "seg": per-scale cache segments (ys-only,
                                 # no DUS/carry aliasing — see
                                 # tfm.blocks_decode_seg); "stacked": carried
                                 # preallocated cache (blocks_decode)
    compute_dtype = jnp.bfloat16

    def __post_init__(self):
        cfg = self.model.cfg
        assert cfg.mask_factor == 2
        assert not cfg.separator and not cfg.type_pos, (
            "conditional sampling does not support separator/type_pos "
            "(unsupported in the reference conditional_infer_cfg too)"
        )
        assert self.repeat_num in (3, 4)
        self.quant = MultiScaleQuantizer(self.vqvae.cfg)
        self._full_mask = attn_mask_for_config(cfg) if cfg.indep else None
        if self.groups is None:
            n = cfg.num_scales
            head = tuple(range(max(0, n - 3)))
            self.groups = (head,) + tuple((si,) for si in range(len(head), n))
        if self.cache_mode == "seg" and tfm.kv_layout(cfg) != "paired":
            self.cache_mode = "stacked"
        if self.kv_window is not None:
            if self.cache_mode != "seg":
                raise ValueError("kv_window requires cache_mode='seg' "
                                 "(paired KV layout)")
            if self._full_mask is not None:
                raise ValueError("kv_window is unsupported with indep "
                                 "masking (mask columns index the full "
                                 "prefix)")
        donate = (6, 7) if self.cache_mode == "seg" else (4, 5, 6, 7)
        self._prologue = jax.jit(self._prologue_fn)
        self._group_fns = [
            jax.jit(functools.partial(self._group_fn, grp),
                    donate_argnums=donate)
            for grp in self.groups
        ]
        self._epilogue = jax.jit(self._epilogue_fn)

    def _prologue_fn(self, params, labels, cond_type):
        cfg = self.model.cfg
        R = self.repeat_num
        null = jnp.full_like(labels, cfg.num_classes)
        labels_r = jnp.concatenate([labels] + [null] * (R - 1))
        unc = jnp.full_like(cond_type, COND_UNCOND_ID)
        ct_r = jnp.concatenate([cond_type, cond_type] + [unc] * (R - 2))
        cond = jnp.take(params["class_emb"], labels_r, axis=0)
        ct_tok = jnp.take(params["cond_embed"], ct_r, axis=0)
        lvl_pos = self.model._lvl_pos(params)
        next_map = (
            jnp.stack([ct_tok, cond], axis=1)
            + params["pos_start"]
            + lvl_pos[:, : cfg.first_l]
        )
        return cond, next_map

    def _group_fn(self, si_list, params, vq_params, cond, next_map,
                  cache_k, cache_v, fh_c, fh_i, keys, forced_ids):
        for j, si in enumerate(si_list):
            next_map, cache_k, cache_v, fh_c, fh_i = self._step_fn(
                si, params, vq_params, cond, next_map, cache_k, cache_v,
                fh_c, fh_i, keys[j], forced_ids[si],
            )
        return next_map, cache_k, cache_v, fh_c, fh_i

    def _step_fn(self, si, params, vq_params, cond, next_map,
                 cache_k, cache_v, fh_c, fh_i, key, forced):
        cfg = self.model.cfg
        pns = cfg.patch_nums
        SN = cfg.num_scales
        pn = pns[si]
        seg = cfg.scale_seg_len(si)
        cur = cfg.begin_ends[si][0]
        R = self.repeat_num
        B = next_map.shape[0] // R
        z = self.vqvae.cfg.z_channels

        mask_slice = None
        if self._full_mask is not None:
            mask_slice = jnp.asarray(self._full_mask[cur : cur + seg, : cur + seg])
        x = next_map.astype(self.compute_dtype)
        if self.cache_mode == "seg":
            sk, sv = _windowed_segs(cache_k, cache_v, self.kv_window)
            x, k_new, v_new = tfm.blocks_decode_seg(
                params["blocks"], x, cond, cfg, sk, sv,
                mask_slice=mask_slice, shared_lin=params.get("shared_ada_lin"),
            )
            cache_k = cache_k + (k_new,)
            cache_v = cache_v + (v_new,)
        else:
            x, cache_k, cache_v = tfm.blocks_decode_any(
                params["blocks"], x, cond, cfg, cache_k, cache_v, cur,
                mask_slice=mask_slice, shared_lin=params.get("shared_ada_lin"),
            )
        t1 = self.cfg_scales[0] * si / (SN - 1)
        t2 = self.cfg_scales[1] * si / (SN - 1)
        t3 = self.cfg_scales[2] * si / (SN - 1)
        # multi-scale CFG combined BEFORE the head matmul: the R x C x V
        # projection and (R*B, seg, V) fp32 logits shrink to one B-row matmul
        w = ((1.0 + t1, t2 - t1, t3 - t2, -t3) if R == 4
             else (1.0 + t1, t2 - t1, -t2))
        combined = tfm.head_logits_cfg(params, x, cond, cfg, w)[:, :, : cfg.vocab_size]
        k_sample, k_gumbel = jax.random.split(key)
        l = pn * pn
        # 2 token-stream groups: [forced (B) | uncond (B)]. The forced
        # group's teacher-forced half is overwritten anyway, so draw only
        # [forced-group's needed half | uncond-group full] columns — same
        # construction as ControlVARModel.sample_cond_cfg (equality-tested).
        if self.force == "control":
            sample_in = jnp.concatenate([combined[:, l:], combined], axis=1)
        else:
            sample_in = jnp.concatenate([combined[:, :l], combined], axis=1)
        out = sample_top_k_top_p(k_sample, sample_in, self.top_k, self.top_p)
        a_sampled, b_ids = out[:, :l], out[:, l:]
        if self.force == "control":
            ids_a = jnp.concatenate([forced, a_sampled], axis=1)
        else:
            ids_a = jnp.concatenate([a_sampled, forced], axis=1)
        ids = jnp.concatenate([ids_a, b_ids], axis=0)
        if self.more_smooth:
            ratio = si / (SN - 1)
            gum_t = max(0.27 * (1 - ratio * 0.95), 0.005)
            soft = gumbel_softmax(
                k_gumbel, jnp.tile(combined, (2, 1, 1)) * (1 + ratio), tau=gum_t
            )
            h_all = soft @ vq_params["quantize"]["embedding"]
            h_c = h_all[:, :l].reshape(2 * B, pn, pn, z)
            h_i = h_all[:, l:].reshape(2 * B, pn, pn, z)
        else:
            h_c = self.quant.embed(vq_params["quantize"], ids[:, :l]).reshape(2 * B, pn, pn, z)
            h_i = self.quant.embed(vq_params["quantize"], ids[:, l:]).reshape(2 * B, pn, pn, z)
        fh_c, nxt_c = self.quant.next_ar_input(vq_params["quantize"], si, fh_c, h_c)
        fh_i, nxt_i = self.quant.next_ar_input(vq_params["quantize"], si, fh_i, h_i)
        if si != SN - 1:
            nl = pns[si + 1] ** 2
            lvl_pos = self.model._lvl_pos(params)
            nm_c = self.model._word_embed(params, nxt_c.reshape(2 * B, nl, z))
            nm_i = self.model._word_embed(params, nxt_i.reshape(2 * B, nl, z))
            nm = jnp.concatenate([nm_c, nm_i], axis=1)
            nxt_cur = cfg.begin_ends[si + 1][0]
            nm = nm + lvl_pos[:, nxt_cur : nxt_cur + cfg.scale_seg_len(si + 1)]
            next_map = jnp.concatenate(
                [jnp.tile(nm[:B], (R - 1, 1, 1)), nm[B:]], axis=0
            )
        return next_map, cache_k, cache_v, fh_c, fh_i

    def _epilogue_fn(self, vq_params, fh_c, fh_i):
        B = fh_c.shape[0] // 2
        if self.decode == "image":
            img = self.vqvae.fhat_to_img(vq_params, fh_i[:B], self.compute_dtype)
            return fh_c[:B], (img + 1.0) * 0.5
        if self.decode == "control":
            # force="image" production mode: only the generated control
            # prediction is an output; the image stream is the caller's input
            img = self.vqvae.fhat_to_img(vq_params, fh_c[:B], self.compute_dtype)
            return (img + 1.0) * 0.5, fh_i[:B]
        both = self.vqvae.fhat_to_img(
            vq_params,
            jnp.concatenate([fh_c[:B], fh_i[:B]], axis=0),
            self.compute_dtype,
        )
        return (both[:B] + 1.0) * 0.5, (both[B:] + 1.0) * 0.5

    def __call__(self, params, vq_params, labels, cond_type, key,
                 forced_ids, decode_img: bool = True):
        """forced_ids: per-scale (B, pn^2) ground-truth ids of the forced
        stream (control when force='control', image when force='image')."""
        cfg = self.model.cfg
        B = labels.shape[0]
        pns = cfg.patch_nums
        z = self.vqvae.cfg.z_channels
        cond, next_map = self._prologue(params, labels, cond_type)
        if self.cache_mode == "seg":
            cache_k, cache_v = (), ()
        else:
            cache_k, cache_v = tfm.decode_caches(
                cfg, self.repeat_num * B, cfg.seq_len, self.compute_dtype
            )
        fh_c = jnp.zeros((2 * B, pns[-1], pns[-1], z), jnp.float32)
        fh_i = jnp.zeros((2 * B, pns[-1], pns[-1], z), jnp.float32)
        keys = jax.random.split(key, cfg.num_scales)
        off = 0
        for grp, fn in zip(self.groups, self._group_fns):
            next_map, cache_k, cache_v, fh_c, fh_i = fn(
                params, vq_params, cond, next_map, cache_k, cache_v,
                fh_c, fh_i, keys[off : off + len(grp)], forced_ids,
            )
            off += len(grp)
        if not decode_img:
            return fh_c[:B], fh_i[:B]
        return self._epilogue(vq_params, fh_c, fh_i)
