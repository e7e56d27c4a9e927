"""Loss package tests: LPIPS structure vs torch VGG16 oracle, PatchGAN
discriminator shapes vs reference, hinge losses, adaptive-weight GAN step."""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from controlvar_tpu.config import VQVAEConfig
from controlvar_tpu.losses import discriminator as disc_mod
from controlvar_tpu.losses import lpips as lpips_mod
from controlvar_tpu.losses.vqperceptual import (
    VQLPIPSWithDiscriminator,
    hinge_d_loss,
    vanilla_d_loss,
)
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.train.train_vqvae import VQVAETrainStep

sys.path.insert(0, "/root/reference")


def test_vgg_feature_shapes(rng):
    params = lpips_mod.init_params(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    feats = lpips_mod.vgg_features(params, x)
    shapes = [tuple(f.shape) for f in feats]
    assert shapes == [
        (1, 64, 64, 64), (1, 32, 32, 128), (1, 16, 16, 256),
        (1, 8, 8, 512), (1, 4, 4, 512),
    ]


def test_lpips_zero_for_identical(rng):
    params = lpips_mod.init_params(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    d = lpips_mod.lpips_distance(params, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    d2 = lpips_mod.lpips_distance(params, x, x + 0.5)
    assert float(d2.min()) > 0.0


def test_discriminator_patch_shapes_match_reference(rng):
    # load the reference module file directly: the reference losses package
    # __init__ pulls in torchvision (absent here)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_disc", "/root/reference/losses/discriminator.py"
    )
    ref_disc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_disc)
    NLayerDiscriminator = ref_disc.NLayerDiscriminator

    torch.manual_seed(0)
    ref = NLayerDiscriminator(input_nc=3, ndf=64, n_layers=3)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    params = disc_mod.init_params(jax.random.key(0))
    out = disc_mod.apply(params, jnp.asarray(x))
    assert out.shape == (2, ref_out.shape[2], ref_out.shape[3], 1)


def test_hinge_and_vanilla_losses():
    real = jnp.asarray([2.0, -0.5])
    fake = jnp.asarray([-2.0, 0.5])
    h = float(hinge_d_loss(real, fake))
    # 0.5*(mean(relu(1-[2,-.5])) + mean(relu(1+[-2,.5]))) = .5*(.75 + .75)
    np.testing.assert_allclose(h, 0.75, rtol=1e-6)
    assert float(vanilla_d_loss(real, fake)) > 0.0


def test_gan_training_steps(rng):
    vq_cfg = VQVAEConfig(ch=32, patch_nums=(1, 2, 4), vocab_size=64)
    vqvae = VQVAE(vq_cfg)
    stepper = VQVAETrainStep(vqvae, VQLPIPSWithDiscriminator(disc_start=0), lr=1e-4)
    state, lpips_params = stepper.init_state(jax.random.key(0))
    tx, _, _ = stepper.make_optimizers(state.vq_params, state.disc_params)
    images = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32) * 2 - 1)
    g_step = jax.jit(lambda s, lp, im: stepper.g_step(tx, s, lp, im))
    d_step = jax.jit(lambda s, im: stepper.d_step(tx, s, im))
    state, gm = g_step(state, lpips_params, images)
    state, dm = d_step(state, images)
    for v in list(gm.values()) + list(dm.values()):
        assert np.isfinite(float(v)), (gm, dm)
    assert float(gm["d_weight"]) >= 0.0
    assert int(state.step) == 1


def test_dual_codebook_training_loss_decreases(rng):
    """Dual-codebook MaskVQVAE G/D loop (reference: train_vqvae.py:105-158):
    generator nll decreases on a fixed synthetic batch; usage/entropy metrics
    are tracked (reference: models/quant.py:75-109)."""
    from controlvar_tpu.models.vqvae_mask import MaskVQVAE
    from controlvar_tpu.train.train_vqvae import MaskVQVAETrainStep

    vq_cfg = VQVAEConfig(ch=32, patch_nums=(1, 2, 4), vocab_size=64)
    vqvae = MaskVQVAE(vq_cfg)
    stepper = MaskVQVAETrainStep(
        vqvae, VQLPIPSWithDiscriminator(disc_start=1000), lr=3e-4
    )
    state, lpips_params = stepper.init_state(jax.random.key(0))
    tx, _, _ = stepper.make_optimizers(state.vq_params, state.disc_params)
    images = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32) * 2 - 1)
    masks = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32) * 2 - 1)
    g_step = jax.jit(lambda s, lp: stepper.g_step(tx, s, lp, images, masks))
    d_step = jax.jit(lambda s, ri, rm: stepper.d_step(tx, s, images, masks, ri, rm))
    nlls = []
    for _ in range(6):
        state, gm, (ri, rm) = g_step(state, lpips_params)
        state, dm = d_step(state, ri, rm)
        nlls.append(float(gm["nll"]))
    assert all(np.isfinite(nlls))
    assert nlls[-1] < nlls[0], f"no learning: {nlls}"
    assert np.isfinite(float(gm["usage_pct"]))
    assert np.isfinite(float(gm["mask_usage_pct"]))
    assert float(gm["entropy_reg"]) >= 0.0
    assert int(state.usage["record_hit"]) == 6


def test_usage_ema_schedule():
    """EMA warm-up: copy on first update, 0.1 for <100, 0.01 after
    (reference: models/quant.py:88-92)."""
    from controlvar_tpu.models.quantizer import MultiScaleQuantizer

    q = MultiScaleQuantizer(VQVAEConfig(ch=32, patch_nums=(1, 2), vocab_size=8))
    st = q.init_usage_state()
    hits = jnp.ones((2, 8), jnp.float32)
    st = q.update_usage(st, hits)
    np.testing.assert_allclose(np.asarray(st["ema_hits"]), 1.0)
    st = q.update_usage(st, hits * 11.0)
    np.testing.assert_allclose(np.asarray(st["ema_hits"]), 2.0)  # 0.9*1 + 0.1*11
    st = st | {"record_hit": jnp.asarray(200, jnp.int32)}
    st = q.update_usage(st, hits * 102.0)
    np.testing.assert_allclose(np.asarray(st["ema_hits"]), 3.0)  # .99*2+.01*102
    # entropy of a uniform distribution = log(S*V) scaled by beta
    ent = float(q.entropy_loss(st))
    np.testing.assert_allclose(ent, 0.25 * np.log(16.0), rtol=1e-4)
