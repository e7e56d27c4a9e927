"""Sampling-harness tests: FID-protocol generation, conditional modes,
Gibbs refinement (small config, real PNG outputs)."""
import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlvar_tpu.config import ControlVARConfig, SampleConfig, VQVAEConfig
from controlvar_tpu.eval.harness import SamplingHarness
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.vqvae import VQVAE

VQ_CFG = VQVAEConfig(ch=32, patch_nums=(1, 2, 4), vocab_size=64)
CFG = ControlVARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 4),
    vocab_size=64, cvae=32, num_classes=6, mask_factor=2, multi_cond=True,
)


@pytest.fixture(scope="module")
def setup():
    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(CFG)
    params = model.init_params(jax.random.key(1))
    h = SamplingHarness(model, vqvae, SampleConfig(cfg=(2.0, 2.0, 2.0), top_k=8, top_p=0.9))
    h.compute_dtype = jnp.float32
    return h, params, vq_params


def test_fid_generation_sharded(setup, tmp_path):
    h, params, vq_params = setup
    total = 0
    for shard in range(2):
        total += h.generate_fid_set(
            params, vq_params, str(tmp_path), batch_size=3, images_per_class=5,
            num_classes=4, shard_id=shard, num_shards=2,
        )
    assert total == 4 * 5
    pngs = glob.glob(os.path.join(str(tmp_path), "*", "*.png"))
    assert len(pngs) == 20
    assert sorted(os.listdir(tmp_path)) == ["0", "1", "2", "3"]


def test_conditional_modes_and_gibbs(setup, rng):
    h, params, vq_params = setup
    labels = jnp.asarray([1, 2], jnp.int32)
    ct = jnp.asarray([0, 0], jnp.int32)
    key = jax.random.key(5)
    ctrl_img = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32) * 2 - 1)
    c_out, i_out = h.control_conditioned(params, vq_params, labels, ct, key, ctrl_img)
    assert c_out.shape == (2, 64, 64, 3)
    c2, i2 = h.image_conditioned(params, vq_params, labels, ct, key, ctrl_img)
    assert i2.shape == (2, 64, 64, 3)
    gc, gi = h.gibbs_refine(params, vq_params, labels, ct, key, c_out, i_out, steps=1)
    assert gi.shape == (2, 64, 64, 3)
    assert bool(jnp.isfinite(gi).all())


def test_decode_generated_only_matches_both(setup, rng):
    """The production harness mode (decode_generated_only=True — the
    eval-cond default) must produce the SAME generated canvas as the
    reference-semantics dual-canvas decode: identical tokens, only the
    forced canvas's decode is skipped."""
    h0, params, vq_params = setup
    h = SamplingHarness(h0.model, h0.vqvae, h0.sample_cfg)
    hg = SamplingHarness(h0.model, h0.vqvae, h0.sample_cfg,
                         decode_generated_only=True)
    for hh in (h, hg):
        for s in (hh._joint, hh._cond_mask, hh._cond_img):
            s.compute_dtype = jnp.float32
    labels = jnp.asarray([1, 2], jnp.int32)
    ct = jnp.asarray([0, 0], jnp.int32)
    key = jax.random.key(7)
    ctrl_img = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32) * 2 - 1)

    _, img_both = h.control_conditioned(params, vq_params, labels, ct, key, ctrl_img)
    _, img_gen = hg.control_conditioned(params, vq_params, labels, ct, key, ctrl_img)
    np.testing.assert_allclose(np.asarray(img_gen), np.asarray(img_both),
                               atol=2e-5, rtol=2e-5)

    ctl_both, _ = h.image_conditioned(params, vq_params, labels, ct, key, ctrl_img)
    ctl_gen, _ = hg.image_conditioned(params, vq_params, labels, ct, key, ctrl_img)
    np.testing.assert_allclose(np.asarray(ctl_gen), np.asarray(ctl_both),
                               atol=2e-5, rtol=2e-5)

    with pytest.raises(AssertionError):
        hg.gibbs_refine(params, vq_params, labels, ct, key,
                        jnp.zeros((2, 64, 64, 3)), jnp.zeros((2, 64, 64, 3)))
