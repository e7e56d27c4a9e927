"""Evaluation / generation harness.

Covers the reference's two validation modes (reference:
train_control_var_hpu.py:282-410):
  * class-conditional FID-protocol generation: 50 images x 1000 classes,
    class ranges sharded across workers, saved as PNGs;
  * pixel-conditional generation: teacher-force control (or image) tokens
    from a dataloader batch, optional Gibbs refinement alternating
    control-forced and image-forced passes.

Everything device-side is one jitted program per (B, mode) pair; PNG IO is
host-side.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from controlvar_tpu.config import SampleConfig
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.vqvae import VQVAE


def class_shard(num_classes: int, shard_id: int, num_shards: int) -> List[int]:
    """Class-range sharding, last shard takes the remainder
    (reference: train_control_var_hpu.py:366-368)."""
    per = num_classes // num_shards
    lo = per * shard_id
    hi = num_classes if shard_id == num_shards - 1 else per * (shard_id + 1)
    return list(range(lo, hi))


def _to_uint8(img: jnp.ndarray) -> np.ndarray:
    return np.asarray(jnp.clip(img * 255.0, 0, 255)).astype(np.uint8)


@dataclasses.dataclass
class SamplingHarness:
    model: ControlVARModel
    vqvae: VQVAE
    sample_cfg: SampleConfig = SampleConfig()
    # production mode for conditional generation: decode ONLY the generated
    # canvas (the forced stream is the caller's own input — decoding it is
    # pure overhead, ~half the VQVAE epilogue). The non-generated member of
    # the returned pair is then the raw f_hat, NOT pixels — incompatible
    # with gibbs_refine, which consumes both canvases as pixels.
    decode_generated_only: bool = False
    compute_dtype = jnp.bfloat16

    def __post_init__(self):
        # step-wise samplers: bit-identical to the fused jits but compile in
        # seconds per scale group (the monolithic programs compile
        # pathologically slowly at real depths on this runtime)
        from controlvar_tpu.eval.stepwise import (
            StepwiseCondSampler,
            StepwiseJointSampler,
        )

        sc = self.sample_cfg
        # the lossy KV window requires the seg cache layout
        kw = ({"cache_mode": "seg", "kv_window": sc.kv_window}
              if sc.kv_window is not None else {})
        self._joint = StepwiseJointSampler(
            self.model, self.vqvae, cfg_scale=sc.cfg[0],
            top_k=sc.top_k, top_p=sc.top_p, **kw,
        )
        self._cond_mask = StepwiseCondSampler(
            self.model, self.vqvae, cfg_scales=sc.cfg,
            top_k=sc.top_k, top_p=sc.top_p, force="control",
            decode="image" if self.decode_generated_only else "both", **kw,
        )
        self._cond_img = StepwiseCondSampler(
            self.model, self.vqvae, cfg_scales=sc.cfg,
            top_k=sc.top_k, top_p=sc.top_p, force="image",
            decode="control" if self.decode_generated_only else "both", **kw,
        )
        for s in (self._joint, self._cond_mask, self._cond_img):
            s.compute_dtype = self.compute_dtype
        self._tokenize = jax.jit(
            lambda vp, img: self.vqvae.img_to_ids(
                vp, img, compute_dtype=self.compute_dtype
            )
        )

    def prepare_params(self, params):
        """Pre-cast block weights to the compute dtype once (see
        stepwise._PrepareParamsMixin) — call before a generation run."""
        return self._joint.prepare_params(params)

    # ---- modes -------------------------------------------------------------

    def joint(self, params, vq_params, labels, cond_type, key):
        """Joint (control, image) generation -> two (B,256,256,3) [0,1]."""
        return self._joint(params, vq_params, labels, cond_type, key)

    def control_conditioned(self, params, vq_params, labels, cond_type, key,
                            control_imgs):
        """Teacher-force the control stream from control images [-1,1]."""
        c_mask = self._tokenize(vq_params, control_imgs)
        return self._cond_mask(params, vq_params, labels, cond_type, key, c_mask)

    def image_conditioned(self, params, vq_params, labels, cond_type, key, imgs):
        """Teacher-force the image stream (control prediction mode)."""
        c_img = self._tokenize(vq_params, imgs)
        return self._cond_img(params, vq_params, labels, cond_type, key, c_img)

    def gibbs_refine(self, params, vq_params, labels, cond_type, key,
                     img_c, img_i, steps: int = 1):
        """Alternating control-forced / image-forced refinement
        (reference: train_control_var_hpu.py:380-393). Images in [0,1]."""
        assert not self.decode_generated_only, (
            "gibbs_refine consumes BOTH canvases as pixels; construct the "
            "harness with decode_generated_only=False")
        for _ in range(steps):
            key, k1, k2 = jax.random.split(key, 3)
            img_c, img_i = self.control_conditioned(
                params, vq_params, labels, cond_type, k1, img_c * 2.0 - 1.0
            )
            img_c, img_i = self.image_conditioned(
                params, vq_params, labels, cond_type, k2, img_i * 2.0 - 1.0
            )
        return img_c, img_i

    # ---- FID-protocol generation --------------------------------------------

    def generate_fid_set(
        self,
        params,
        vq_params,
        out_dir: str,
        batch_size: int = 25,
        images_per_class: int = 50,
        num_classes: int = 1000,
        shard_id: int = 0,
        num_shards: int = 1,
        cond_type_id: int = 2,  # 'depth' (reference: :374)
        seed: int = 42,
        gibbs: int = 0,
    ) -> int:
        """Writes {out_dir}/{cls}/{i}.png; returns image count.

        Batches run through `pipelined_map` (eval/serving.py): PNG encoding
        of batch i overlaps device execution of batches i+1..i+2 instead of
        serializing with it."""
        from PIL import Image

        from controlvar_tpu.eval.serving import pipelined_map

        def work_items():
            for cls in class_shard(num_classes, shard_id, num_shards):
                os.makedirs(os.path.join(out_dir, str(cls)), exist_ok=True)
                made = 0
                while made < images_per_class:
                    B = min(batch_size, images_per_class - made)
                    yield (cls, made, B)
                    made += B

        def generate(item):
            cls, made, B = item
            labels = jnp.full((B,), cls, jnp.int32)
            ct = jnp.full((B,), cond_type_id, jnp.int32)
            key = jax.random.key(seed + cls * 1000 + made)
            img_c, img_i = self.joint(params, vq_params, labels, ct, key)
            if gibbs:
                img_c, img_i = self.gibbs_refine(
                    params, vq_params, labels, ct, key, img_c, img_i, gibbs
                )
            return img_i

        count = 0
        for (cls, made, B), img_i in pipelined_map(generate, work_items()):
            arr = _to_uint8(img_i)
            cls_dir = os.path.join(out_dir, str(cls))
            for b in range(B):
                Image.fromarray(arr[b]).save(
                    os.path.join(cls_dir, f"{made + b}.png")
                )
            count += B
        return count
