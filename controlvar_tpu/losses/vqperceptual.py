"""Composite VQVAE training loss: L1 + LPIPS + adversarial with adaptive weight.

JAX port of the taming-style VQLPIPSWithDiscriminator (reference:
losses/vqperceptual.py:34-137): generator loss = L1 rec + perceptual +
codebook + disc_factor * adaptive_weight * (-E[D(fake)]); discriminator loss =
hinge (or vanilla) on real/fake patch logits; the adaptive weight is
||grad(nll, last_layer)|| / ||grad(g_loss, last_layer)|| clamped to 1e4
(reference: vqperceptual.py:63-74), with a warm-up step gate on the
adversarial term (reference: vqperceptual.py:14-17).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from controlvar_tpu.losses import discriminator as disc_mod
from controlvar_tpu.losses.lpips import lpips_distance

Params = Dict


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - logits_real))
        + jnp.mean(jax.nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


@dataclasses.dataclass(frozen=True)
class VQLPIPSWithDiscriminator:
    disc_start: int = 0
    codebook_weight: float = 1.0
    pixel_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_factor: float = 1.0
    disc_weight: float = 0.8
    disc_loss: str = "hinge"  # or "vanilla"

    def adaptive_weight(
        self, nll_grad_norm: jnp.ndarray, g_grad_norm: jnp.ndarray
    ) -> jnp.ndarray:
        w = nll_grad_norm / (g_grad_norm + 1e-4)
        return jnp.clip(w, 0.0, 1e4) * self.disc_weight

    def generator_loss(
        self,
        lpips_params: Params,
        disc_params: Params,
        inputs: jnp.ndarray,        # (B, H, W, 3) targets in [-1, 1]
        recons: jnp.ndarray,        # (B, H, W, 3)
        codebook_loss: jnp.ndarray,
        global_step: jnp.ndarray,
        last_layer_grads: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        """Returns (loss, metrics). `last_layer_grads` = (||dnll/dw||, ||dg/dw||)
        for the decoder's output conv; None disables the adaptive weight
        (weight = disc_weight)."""
        rec = jnp.abs(inputs - recons)
        p = lpips_distance(lpips_params, inputs, recons)
        nll = jnp.mean(rec) * self.pixel_weight + self.perceptual_weight * jnp.mean(p)
        logits_fake = disc_mod.apply(disc_params, recons)
        g_loss = -jnp.mean(logits_fake)
        if last_layer_grads is not None:
            d_weight = self.adaptive_weight(*last_layer_grads)
        else:
            d_weight = jnp.asarray(self.disc_weight)
        disc_factor = jnp.where(global_step >= self.disc_start, self.disc_factor, 0.0)
        loss = nll + d_weight * disc_factor * g_loss + self.codebook_weight * codebook_loss
        return loss, {
            "nll": nll, "g_loss": g_loss, "d_weight": d_weight,
            "codebook": codebook_loss, "perceptual": jnp.mean(p),
            "rec_l1": jnp.mean(rec),
        }

    def generator_loss_dual(
        self,
        lpips_params: Params,
        disc_params: Params,
        images: jnp.ndarray,            # (B, H, W, 3) in [-1, 1]
        masks: jnp.ndarray,
        recon_img: jnp.ndarray,
        recon_msk: jnp.ndarray,
        codebook_loss: jnp.ndarray,     # pixel codebook
        m_codebook_loss: jnp.ndarray,   # mask codebook
        global_step: jnp.ndarray,
        last_layer_grads: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        """Dual-codebook generator loss: rec/LPIPS/GAN terms averaged over the
        image and mask branches, codebook term averaged over the two books
        (reference: losses/vqperceptual.py:78-119)."""
        rec = 0.5 * (
            jnp.mean(jnp.abs(images - recon_img)) + jnp.mean(jnp.abs(masks - recon_msk))
        )
        p = 0.5 * (
            jnp.mean(lpips_distance(lpips_params, images, recon_img))
            + jnp.mean(lpips_distance(lpips_params, masks, recon_msk))
        )
        nll = rec * self.pixel_weight + self.perceptual_weight * p
        logits_fake = 0.5 * (
            disc_mod.apply(disc_params, recon_img) + disc_mod.apply(disc_params, recon_msk)
        )
        g_loss = -jnp.mean(logits_fake)
        if last_layer_grads is not None:
            d_weight = self.adaptive_weight(*last_layer_grads)
        else:
            d_weight = jnp.asarray(self.disc_weight)
        disc_factor = jnp.where(global_step >= self.disc_start, self.disc_factor, 0.0)
        cb = 0.5 * (codebook_loss + m_codebook_loss)
        loss = nll + d_weight * disc_factor * g_loss + self.codebook_weight * cb
        return loss, {
            "nll": nll, "g_loss": g_loss, "d_weight": d_weight,
            "codebook": codebook_loss, "mask_codebook": m_codebook_loss,
            "perceptual": p, "rec_l1": rec,
        }

    def discriminator_loss_dual(
        self,
        disc_params: Params,
        images: jnp.ndarray,
        masks: jnp.ndarray,
        recon_img: jnp.ndarray,
        recon_msk: jnp.ndarray,
        global_step: jnp.ndarray,
    ):
        """Hinge D loss with real/fake patch logits averaged over both
        branches (reference: losses/vqperceptual.py:121-137)."""
        sg = jax.lax.stop_gradient
        logits_real = 0.5 * (
            disc_mod.apply(disc_params, sg(images)) + disc_mod.apply(disc_params, sg(masks))
        )
        logits_fake = 0.5 * (
            disc_mod.apply(disc_params, sg(recon_img))
            + disc_mod.apply(disc_params, sg(recon_msk))
        )
        loss_fn = hinge_d_loss if self.disc_loss == "hinge" else vanilla_d_loss
        disc_factor = jnp.where(global_step >= self.disc_start, self.disc_factor, 0.0)
        d_loss = disc_factor * loss_fn(logits_real, logits_fake)
        return d_loss, {
            "d_loss": d_loss,
            "logits_real": jnp.mean(logits_real),
            "logits_fake": jnp.mean(logits_fake),
        }

    def discriminator_loss(
        self,
        disc_params: Params,
        inputs: jnp.ndarray,
        recons: jnp.ndarray,
        global_step: jnp.ndarray,
    ):
        logits_real = disc_mod.apply(disc_params, inputs)
        logits_fake = disc_mod.apply(disc_params, jax.lax.stop_gradient(recons))
        loss_fn = hinge_d_loss if self.disc_loss == "hinge" else vanilla_d_loss
        disc_factor = jnp.where(global_step >= self.disc_start, self.disc_factor, 0.0)
        d_loss = disc_factor * loss_fn(logits_real, logits_fake)
        return d_loss, {
            "d_loss": d_loss,
            "logits_real": jnp.mean(logits_real),
            "logits_fake": jnp.mean(logits_fake),
        }
