"""VQVAE (tokenizer) training: two-optimizer GAN loop.

Mirrors the reference's G/D alternation (reference: train_vqvae.py:105-158):
  G step: L1 + LPIPS + adaptive-weight * hinge-G + codebook losses
  D step: hinge on real/fake patch logits (disc warm-up via disc_start)
Adam β=(0.5, 0.9) for both (reference: train_vqvae.py:258-259). The adaptive
weight takes gradient norms at the decoder's output conv kernel
(reference: losses/vqperceptual.py:63-74).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from controlvar_tpu.losses import discriminator as disc_mod
from controlvar_tpu.losses.lpips import lpips_distance
from controlvar_tpu.losses.vqperceptual import VQLPIPSWithDiscriminator
from controlvar_tpu.models.vqvae import VQVAE

Params = Dict


class GANTrainState(NamedTuple):
    vq_params: Params
    disc_params: Params
    vq_opt: optax.OptState
    disc_opt: optax.OptState
    step: jnp.ndarray
    usage: Params  # codebook EMA usage state (reference: models/quant.py:75-101)


@dataclasses.dataclass(frozen=True)
class VQVAETrainStep:
    vqvae: VQVAE
    loss: VQLPIPSWithDiscriminator
    lr: float = 1e-4

    def make_optimizers(self, vq_params, disc_params):
        tx = optax.adam(self.lr, b1=0.5, b2=0.9)
        return tx, tx.init(vq_params), tx.init(disc_params)

    def init_state(self, key: jax.Array, lpips_key=None) -> Tuple[GANTrainState, Params]:
        from controlvar_tpu.losses import lpips as lpips_mod

        k1, k2, k3 = jax.random.split(key, 3)
        vq_params = self.vqvae.init_params(k1)
        disc_params = disc_mod.init_params(k2)
        lpips_params = lpips_mod.init_params(lpips_key if lpips_key is not None else k3)
        self_tx, vq_opt, disc_opt = self.make_optimizers(vq_params, disc_params)
        state = GANTrainState(vq_params, disc_params, vq_opt, disc_opt,
                              jnp.zeros((), jnp.int32),
                              self.vqvae.quantizer.init_usage_state())
        return state, lpips_params

    def _recon(self, vq_params, images, compute_dtype=jnp.float32):
        return self.vqvae.forward_train(vq_params, images, compute_dtype)

    def g_step(self, tx, state: GANTrainState, lpips_params, images):
        """One generator update. images: (B, H, W, 3) in [-1, 1]."""

        def nll_only(p):
            recon, _, _ = self._recon(p, images)
            rec = jnp.mean(jnp.abs(images - recon)) * self.loss.pixel_weight
            per = jnp.mean(lpips_distance(lpips_params, images, recon))
            return rec + self.loss.perceptual_weight * per

        def gan_only(p):
            recon, _, _ = self._recon(p, images)
            return -jnp.mean(disc_mod.apply(state.disc_params, recon))

        last = ("decoder", "conv_out", "kernel")

        def leaf(tree):
            node = tree
            for k in last:
                node = node[k]
            return node

        g_nll = leaf(jax.grad(nll_only)(state.vq_params))
        g_gan = leaf(jax.grad(gan_only)(state.vq_params))
        grads_norms = (jnp.linalg.norm(g_nll), jnp.linalg.norm(g_gan))

        def total_loss(p):
            recon, vq_loss, hits = self._recon(p, images)
            loss, metrics = self.loss.generator_loss(
                lpips_params, state.disc_params, images, recon, vq_loss,
                state.step, last_layer_grads=grads_norms,
            )
            return loss, (metrics, hits)

        (loss, (metrics, hits)), grads = jax.value_and_grad(total_loss, has_aux=True)(
            state.vq_params
        )
        updates, vq_opt = tx.update(grads, state.vq_opt, state.vq_params)
        vq_params = optax.apply_updates(state.vq_params, updates)
        # codebook-usage EMA + vocab percentage, as the reference's quantizer
        # tracks during VAE training (reference: models/quant.py:75-101)
        q = self.vqvae.quantizer
        usage = q.update_usage(state.usage, hits)
        tok = images.shape[0] * self.vqvae.cfg.patch_nums[-1] ** 2
        metrics = dict(
            metrics,
            usage_pct=jnp.mean(q.usage_percent(usage, tok)),
            entropy_reg=q.entropy_loss(usage),
        )
        return state._replace(vq_params=vq_params, vq_opt=vq_opt, usage=usage), metrics

    def d_step(self, tx, state: GANTrainState, images):
        recon, _, _ = self._recon(state.vq_params, images)

        def d_loss_fn(dp):
            return self.loss.discriminator_loss(dp, images, recon, state.step)

        (loss, metrics), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.disc_params
        )
        updates, disc_opt = tx.update(grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, updates)
        return state._replace(
            disc_params=disc_params, disc_opt=disc_opt, step=state.step + 1
        ), metrics


class DualGANTrainState(NamedTuple):
    vq_params: Params
    disc_params: Params
    vq_opt: optax.OptState
    disc_opt: optax.OptState
    step: jnp.ndarray
    usage: Params       # pixel-codebook EMA usage state
    mask_usage: Params  # mask-codebook EMA usage state


@dataclasses.dataclass(frozen=True)
class MaskVQVAETrainStep:
    """Dual-codebook (MaskVQVAE) tokenizer training — the reference's PRIMARY
    train_vqvae.py loop (reference: train_vqvae.py:105-158): joint image+mask
    reconstruction with L1/LPIPS/GAN terms averaged over both branches and
    the codebook loss averaged over the two books. Tracks per-codebook usage
    EMA and exposes the entropy regularizer (reference: models/quant.py:75-109).
    """

    vqvae: "object"  # MaskVQVAE
    loss: VQLPIPSWithDiscriminator
    lr: float = 1e-4
    entropy_weight: float = 0.0  # >0 adds -beta*H(usage) (defined but unused
                                 # by the reference trainers too)

    def make_optimizers(self, vq_params, disc_params):
        tx = optax.adam(self.lr, b1=0.5, b2=0.9)
        return tx, tx.init(vq_params), tx.init(disc_params)

    def init_state(self, key: jax.Array, lpips_key=None) -> Tuple[DualGANTrainState, Params]:
        from controlvar_tpu.losses import lpips as lpips_mod

        k1, k2, k3 = jax.random.split(key, 3)
        vq_params = self.vqvae.init_params(k1)
        disc_params = disc_mod.init_params(k2)
        lpips_params = lpips_mod.init_params(lpips_key if lpips_key is not None else k3)
        _, vq_opt, disc_opt = self.make_optimizers(vq_params, disc_params)
        q = self.vqvae.quantizer
        state = DualGANTrainState(
            vq_params, disc_params, vq_opt, disc_opt, jnp.zeros((), jnp.int32),
            q.init_usage_state(), q.init_usage_state(),
        )
        return state, lpips_params

    def g_step(self, tx, state: DualGANTrainState, lpips_params, images, masks):
        """One generator update over the joint forward. images/masks:
        (B, H, W, 3) in [-1, 1]."""

        def nll_only(p):
            ri, rm, _, _, _ = self.vqvae.forward_train_joint(p, images, masks)
            rec = 0.5 * (jnp.mean(jnp.abs(images - ri)) + jnp.mean(jnp.abs(masks - rm)))
            per = 0.5 * (
                jnp.mean(lpips_distance(lpips_params, images, ri))
                + jnp.mean(lpips_distance(lpips_params, masks, rm))
            )
            return rec * self.loss.pixel_weight + self.loss.perceptual_weight * per

        def gan_only(p):
            ri, rm, _, _, _ = self.vqvae.forward_train_joint(p, images, masks)
            fake = 0.5 * (
                disc_mod.apply(state.disc_params, ri)
                + disc_mod.apply(state.disc_params, rm)
            )
            return -jnp.mean(fake)

        last = ("decoder", "conv_out", "kernel")

        def leaf(tree):
            node = tree
            for k in last:
                node = node[k]
            return node

        g_nll = leaf(jax.grad(nll_only)(state.vq_params))
        g_gan = leaf(jax.grad(gan_only)(state.vq_params))
        grad_norms = (jnp.linalg.norm(g_nll), jnp.linalg.norm(g_gan))

        def total_loss(p):
            ri, rm, (hits, m_hits), mvq, vq = self.vqvae.forward_train_joint(
                p, images, masks
            )
            loss, metrics = self.loss.generator_loss_dual(
                lpips_params, state.disc_params, images, masks, ri, rm,
                vq, mvq, state.step, last_layer_grads=grad_norms,
            )
            if self.entropy_weight > 0:
                q = self.vqvae.quantizer
                ent = q.entropy_loss(q.update_usage(state.usage, hits))
                loss = loss - self.entropy_weight * ent
                metrics = dict(metrics, entropy=ent)
            return loss, (metrics, hits, m_hits, ri, rm)

        (loss, (metrics, hits, m_hits, ri, rm)), grads = jax.value_and_grad(
            total_loss, has_aux=True
        )(state.vq_params)
        updates, vq_opt = tx.update(grads, state.vq_opt, state.vq_params)
        vq_params = optax.apply_updates(state.vq_params, updates)
        q = self.vqvae.quantizer
        usage = q.update_usage(state.usage, hits)
        mask_usage = q.update_usage(state.mask_usage, m_hits)
        tok = images.shape[0] * self.vqvae.cfg.patch_nums[-1] ** 2
        metrics = dict(
            metrics,
            usage_pct=jnp.mean(q.usage_percent(usage, tok)),
            mask_usage_pct=jnp.mean(q.usage_percent(mask_usage, tok)),
            entropy_reg=q.entropy_loss(usage),
        )
        return state._replace(
            vq_params=vq_params, vq_opt=vq_opt, usage=usage, mask_usage=mask_usage
        ), metrics, (ri, rm)

    def d_step(self, tx, state: DualGANTrainState, images, masks, recon_img, recon_msk):
        def d_loss_fn(dp):
            return self.loss.discriminator_loss_dual(
                dp, images, masks, recon_img, recon_msk, state.step
            )

        (loss, metrics), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.disc_params
        )
        updates, disc_opt = tx.update(grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, updates)
        return state._replace(
            disc_params=disc_params, disc_opt=disc_opt, step=state.step + 1
        ), metrics
