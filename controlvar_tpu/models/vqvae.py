"""Full multi-scale VQVAE tokenizer: encoder + quant_conv + residual VQ +
post_quant_conv + decoder (reference: models/vqvae.py:16-109).

Frozen in all VAR/ControlVAR training; also trainable end-to-end via
`quantize_train` for tokenizer training (reference: train_vqvae*.py).
Functional API over a params pytree:

  {"encoder": ..., "decoder": ..., "quant_conv": {kernel,bias},
   "post_quant_conv": {kernel,bias}, "quantize": {embedding, phi}}
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from controlvar_tpu.config import VQVAEConfig
from controlvar_tpu.models.quantizer import MultiScaleQuantizer
from controlvar_tpu.models import vae as vae_mod

Params = Dict


@dataclasses.dataclass(frozen=True)
class VQVAE:
    cfg: VQVAEConfig

    @property
    def quantizer(self) -> MultiScaleQuantizer:
        return MultiScaleQuantizer(self.cfg)

    # ---- construction ------------------------------------------------------

    def init_params(self, key: jax.Array) -> Params:
        k_enc, k_dec, k_q, k_qc, k_pqc = jax.random.split(key, 5)
        ks = self.cfg.quant_conv_ks
        return {
            "encoder": vae_mod.init_encoder_params(k_enc, self.cfg),
            "decoder": vae_mod.init_decoder_params(k_dec, self.cfg),
            "quantize": self.quantizer.init_params(k_q),
            "quant_conv": vae_mod._init_conv(k_qc, ks, ks, self.cfg.z_channels, self.cfg.z_channels),
            "post_quant_conv": vae_mod._init_conv(k_pqc, ks, ks, self.cfg.z_channels, self.cfg.z_channels),
        }

    # ---- encode/decode pipeline ---------------------------------------------

    def encode_f(self, params: Params, img: jnp.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
        """img (B, H, W, 3) in [-1, 1] -> pre-quant feature (B, H/16, W/16, Cvae)."""
        precision = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
        f = vae_mod.encoder_apply(params["encoder"], img, self.cfg, compute_dtype)
        f = vae_mod._conv(params["quant_conv"], f, precision=precision)
        return f.astype(jnp.float32)

    def img_to_ids(self, params: Params, img: jnp.ndarray,
                   patch_nums: Optional[Sequence[int]] = None,
                   compute_dtype=jnp.float32) -> List[jnp.ndarray]:
        """Tokenize (reference: models/vqvae.py:73-75 img_to_idxBl)."""
        f = self.encode_f(params, img, compute_dtype)
        return self.quantizer.encode_ids(params["quantize"], f, patch_nums)

    def ids_to_var_input(self, params: Params, ms_ids: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        """Teacher-forcing features (reference: models/vqvae.py:77-78 idxBl_to_h)."""
        return self.quantizer.ids_to_var_input(params["quantize"], ms_ids)

    def decode_raw(self, params: Params, f_hat: jnp.ndarray,
                   compute_dtype=jnp.float32) -> jnp.ndarray:
        """post_quant_conv + decoder, unclamped (reference: vqvae.py:84-86)."""
        precision = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
        h = vae_mod._conv(params["post_quant_conv"], f_hat.astype(compute_dtype),
                          precision=precision)
        img = vae_mod.decoder_apply(params["decoder"], h, self.cfg, compute_dtype)
        return img.astype(jnp.float32)

    def fhat_to_img(self, params: Params, f_hat: jnp.ndarray,
                    compute_dtype=jnp.float32) -> jnp.ndarray:
        """f_hat (B, h, w, Cvae) -> image (B, 16h, 16w, 3) clamped to [-1, 1]
        (reference: vqvae.py:88-89)."""
        return jnp.clip(self.decode_raw(params, f_hat, compute_dtype), -1.0, 1.0)

    def ids_to_img(self, params: Params, ms_ids: Sequence[jnp.ndarray],
                   compute_dtype=jnp.float32) -> jnp.ndarray:
        """Decode per-scale ids to a final image (reference: vqvae.py:97-104)."""
        f_hat = self.quantizer.ids_to_fhat(params["quantize"], ms_ids)
        return self.fhat_to_img(params, f_hat, compute_dtype)

    def img_to_recon(self, params: Params, img: jnp.ndarray,
                     compute_dtype=jnp.float32) -> jnp.ndarray:
        """Full encode->quantize->decode round trip, unclamped
        (reference: vqvae.py:80-86, last_one=True)."""
        f = self.encode_f(params, img, compute_dtype)
        fhats = self.quantizer.encode_fhat(params["quantize"], f)
        return self.decode_raw(params, fhats[-1], compute_dtype)

    def img_to_ms_recon(self, params: Params, img: jnp.ndarray,
                        compute_dtype=jnp.float32) -> List[jnp.ndarray]:
        """Per-scale cumulative reconstructions (visual check harness,
        reference: infer_vae.py:97-121)."""
        f = self.encode_f(params, img, compute_dtype)
        fhats = self.quantizer.encode_fhat(params["quantize"], f)
        return [self.decode_raw(params, fh, compute_dtype) for fh in fhats]

    # ---- training forward (tokenizer training) -------------------------------

    def forward_train(self, params: Params, img: jnp.ndarray,
                      compute_dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (recon, vq_loss, codebook_usage_counts).

        Mirrors VQVAE.forward (reference: models/vqvae.py:56-59).
        """
        f = self.encode_f(params, img, compute_dtype)
        f_hat, vq_loss, usage = self.quantizer.quantize_train(params["quantize"], f)
        precision = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
        h = vae_mod._conv(params["post_quant_conv"], f_hat.astype(compute_dtype),
                          precision=precision)
        recon = vae_mod.decoder_apply(params["decoder"], h, self.cfg, compute_dtype)
        return recon.astype(jnp.float32), vq_loss, usage
