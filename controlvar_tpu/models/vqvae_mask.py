"""Dual-codebook mask VQVAE: joint image+mask tokenization.

Variant used only by the tokenizer-training scripts (reference:
models/vqvae_mask.py:16-80, train_vqvae.py:24): two VectorQuantizer2
codebooks (`mask_quantize`, `quantize`) share one encoder/decoder; the image
latent is first explained by the mask codebook, a `filter` conv cleans the
residual, and the pixel codebook quantizes what remains. The mask branch is
no-grad.

Params pytree = VQVAE params plus {"mask_quantize": {...}, "filter": conv}.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from controlvar_tpu.config import VQVAEConfig
from controlvar_tpu.models import vae as vae_mod
from controlvar_tpu.models.quantizer import MultiScaleQuantizer
from controlvar_tpu.models.vqvae import VQVAE

Params = Dict


@dataclasses.dataclass(frozen=True)
class MaskVQVAE(VQVAE):
    """Extends VQVAE with the second codebook + filter conv."""

    def init_params(self, key: jax.Array) -> Params:
        k_base, k_mq, k_f = jax.random.split(key, 3)
        p = super().init_params(k_base)
        p["mask_quantize"] = self.quantizer.init_params(k_mq)
        ks = self.cfg.quant_conv_ks
        p["filter"] = vae_mod._init_conv(k_f, ks, ks, self.cfg.z_channels, self.cfg.z_channels)
        return p

    def _filter(self, params: Params, x: jnp.ndarray, compute_dtype=jnp.float32):
        precision = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
        return vae_mod._conv(params["filter"], x.astype(compute_dtype),
                             precision=precision).astype(jnp.float32)

    def forward_train_joint(
        self, params: Params, img: jnp.ndarray, msk: jnp.ndarray,
        compute_dtype=jnp.float32,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(recon_img, recon_msk, usage, mask_vq_loss, vq_loss) mirroring
        MaskVQVAE.forward (reference: vqvae_mask.py:67-80); usage =
        (pixel_hits (S, V), mask_hits (S, V)) per-scale codebook hit counts."""
        quant = self.quantizer
        latent_img = self.encode_f(params, img, compute_dtype)
        latent_msk = jax.lax.stop_gradient(self.encode_f(params, msk, compute_dtype))

        # mask branch (no grad into its inputs; codebook still learns)
        mh, mvq_loss, m_hits = quant.quantize_train(params["mask_quantize"], latent_msk)
        # image latent explained by the mask codebook first
        h1, _, _ = quant.quantize_train(params["mask_quantize"], latent_img)
        latent_pixel = self._filter(params, latent_img - h1, compute_dtype)
        h2, vq_loss, hits = quant.quantize_train(params["quantize"], latent_pixel)
        usage = (hits, m_hits)

        recon_msk = jax.lax.stop_gradient(
            self.decode_raw(params, self._filter(params, mh, compute_dtype), compute_dtype)
        )
        recon_img = self.decode_raw(
            params, self._filter(params, h1, compute_dtype) + h2, compute_dtype
        )
        return recon_img, recon_msk, usage, mvq_loss, vq_loss
