"""Step-wise sampler must produce exactly the same samples as the fused
one-jit sampler (same keys, same math, different compilation granularity)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlvar_tpu.config import ControlVARConfig, VQVAEConfig
from controlvar_tpu.eval.stepwise import StepwiseJointSampler
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.vqvae import VQVAE

VQ_CFG = VQVAEConfig(ch=32, patch_nums=(1, 2, 4), vocab_size=64)
CFG = ControlVARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 4),
    vocab_size=64, cvae=32, num_classes=8, mask_factor=2, multi_cond=True,
)


@pytest.mark.parametrize("cache_mode", ["stacked", "seg"])
def test_stepwise_matches_fused(cache_mode):
    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(CFG)
    params = model.init_params(jax.random.key(1))
    labels = jnp.asarray([1, 5], jnp.int32)
    ct = jnp.asarray([0, 2], jnp.int32)

    sampler = StepwiseJointSampler(
        model, vqvae, cfg_scale=2.0, top_k=10, top_p=0.9,
        cache_mode=cache_mode,
    )
    sampler.compute_dtype = jnp.float32

    # fused reference path with the same per-scale key schedule
    def fused(params, vq_params, labels, ct, key):
        return model.sample_joint_cfg(
            params, vqvae, vq_params, labels, ct, key,
            cfg_scale=2.0, top_k=10, top_p=0.9, compute_dtype=jnp.float32,
        )

    # determinism of the stepwise path
    c1, i1 = sampler(params, vq_params, labels, ct, jax.random.key(7))
    c2, i2 = sampler(params, vq_params, labels, ct, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    assert c1.shape == (2, 64, 64, 3)
    assert bool(jnp.isfinite(i1).all())

    # both samplers pre-split keys per scale -> bit-identical outputs
    fc, fi = jax.jit(fused)(params, vq_params, labels, ct, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(fc), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(i1))


@pytest.mark.parametrize("cache_mode", ["stacked", "seg"])
def test_stepwise_var_matches_fused(rng, cache_mode):
    from controlvar_tpu.config import VARConfig
    from controlvar_tpu.eval.stepwise import StepwiseVARSampler
    from controlvar_tpu.models.var import VARModel

    var_cfg = VARConfig(depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 4),
                        vocab_size=64, cvae=32, num_classes=8)
    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = VARModel(var_cfg)
    params = model.init_params(jax.random.key(1))
    labels = jnp.asarray([2, 4], jnp.int32)

    sampler = StepwiseVARSampler(model, vqvae, cfg_scale=1.5, top_k=10, top_p=0.9,
                                 cache_mode=cache_mode)
    sampler.compute_dtype = jnp.float32
    img_s = sampler(params, vq_params, labels, jax.random.key(3))
    img_f = jax.jit(
        lambda p, vp, l, k: model.sample_cfg(
            p, vqvae, vp, l, k, cfg_scale=1.5, top_k=10, top_p=0.9,
            compute_dtype=jnp.float32,
        )
    )(params, vq_params, labels, jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(img_s), np.asarray(img_f))


@pytest.mark.parametrize("cache_mode", ["stacked", "seg"])
def test_stepwise_cond_matches_fused(rng, cache_mode):
    from controlvar_tpu.eval.stepwise import StepwiseCondSampler

    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(CFG)
    params = model.init_params(jax.random.key(1))
    labels = jnp.asarray([1, 5], jnp.int32)
    ct = jnp.asarray([0, 2], jnp.int32)
    c_mask = [
        jnp.asarray(rng.integers(0, CFG.vocab_size, (2, pn * pn)).astype(np.int32))
        for pn in CFG.patch_nums
    ]

    sampler = StepwiseCondSampler(
        model, vqvae, cfg_scales=(2.0, 2.0, 2.0), top_k=10, top_p=0.9,
        force="control", cache_mode=cache_mode,
    )
    sampler.compute_dtype = jnp.float32
    sc, si_ = sampler(params, vq_params, labels, ct, jax.random.key(9), c_mask)

    fc, fi = jax.jit(
        lambda p, vp, l, c, k, cm: model.sample_cond_cfg(
            p, vqvae, vp, l, c, k, cfg_scales=(2.0, 2.0, 2.0),
            c_mask=cm, top_k=10, top_p=0.9, compute_dtype=jnp.float32,
        )
    )(params, vq_params, labels, ct, jax.random.key(9), c_mask)
    np.testing.assert_array_equal(np.asarray(fc), np.asarray(sc))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(si_))


def test_cond_image_only_epilogue_matches(rng):
    """The bench's production-mode metric decodes only the image canvas via
    decode_img=False + a single-canvas epilogue; same tokens, same decoder —
    only the decode batch differs (B vs 2B stacked canvases), so outputs
    agree to conv-algorithm numerical noise."""
    from controlvar_tpu.eval.stepwise import StepwiseCondSampler

    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(CFG)
    params = model.init_params(jax.random.key(1))
    labels = jnp.asarray([1, 5], jnp.int32)
    ct = jnp.asarray([0, 2], jnp.int32)
    c_mask = [
        jnp.asarray(rng.integers(0, CFG.vocab_size, (2, pn * pn)).astype(np.int32))
        for pn in CFG.patch_nums
    ]
    sampler = StepwiseCondSampler(
        model, vqvae, cfg_scales=(2.0, 2.0, 2.0), top_k=10, top_p=0.9,
        force="control",
    )
    sampler.compute_dtype = jnp.float32
    params = sampler.prepare_params(params)
    _, img_i = sampler(params, vq_params, labels, ct, jax.random.key(9), c_mask)

    @jax.jit
    def img_epilogue(vp, fh_i):
        img = vqvae.fhat_to_img(vp, fh_i, sampler.compute_dtype)
        return (img + 1.0) * 0.5

    _, fh_i = sampler(params, vq_params, labels, ct, jax.random.key(9), c_mask,
                      decode_img=False)
    np.testing.assert_allclose(np.asarray(img_i),
                               np.asarray(img_epilogue(vq_params, fh_i)),
                               atol=1e-5, rtol=1e-5)


def test_stepwise_matches_fused_separator_type_pos():
    """Separator + type_pos config: stepwise next-map construction must splice
    separator embeds and add type positions exactly like the fused sampler
    (reference: control_var.py:544-560,104-117)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, separator=True, type_pos=True)
    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(cfg)
    params = model.init_params(jax.random.key(1))
    labels = jnp.asarray([1, 5], jnp.int32)
    ct = jnp.asarray([0, 2], jnp.int32)

    sampler = StepwiseJointSampler(model, vqvae, cfg_scale=2.0, top_k=10, top_p=0.9)
    sampler.compute_dtype = jnp.float32
    sc, si_ = sampler(params, vq_params, labels, ct, jax.random.key(7),
                      decode_img=False)
    fc, fi = jax.jit(
        lambda p, vp, l, c, k: model.sample_joint_cfg(
            p, vqvae, vp, l, c, k, cfg_scale=2.0, top_k=10, top_p=0.9,
            compute_dtype=jnp.float32, decode_img=False,
        )
    )(params, vq_params, labels, ct, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(fc), np.asarray(sc))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(si_))


def test_stepwise_cond_repeat3_matches_fused(rng):
    from controlvar_tpu.eval.stepwise import StepwiseCondSampler

    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(CFG)
    params = model.init_params(jax.random.key(1))
    labels = jnp.asarray([1, 5], jnp.int32)
    ct = jnp.asarray([0, 2], jnp.int32)
    c_img = [
        jnp.asarray(rng.integers(0, CFG.vocab_size, (2, pn * pn)).astype(np.int32))
        for pn in CFG.patch_nums
    ]
    sampler = StepwiseCondSampler(
        model, vqvae, cfg_scales=(2.0, 1.0, 0.0), top_k=10, top_p=0.9,
        force="image", repeat_num=3,
    )
    sampler.compute_dtype = jnp.float32
    sc, si_ = sampler(params, vq_params, labels, ct, jax.random.key(9), c_img,
                      decode_img=False)
    fc, fi = jax.jit(
        lambda p, vp, l, c, k, ci: model.sample_cond_cfg(
            p, vqvae, vp, l, c, k, cfg_scales=(2.0, 1.0, 0.0),
            c_img=ci, top_k=10, top_p=0.9, compute_dtype=jnp.float32,
            decode_img=False, repeat_num=3,
        )
    )(params, vq_params, labels, ct, jax.random.key(9), c_img)
    np.testing.assert_array_equal(np.asarray(fc), np.asarray(sc))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(si_))


def test_greedy_decode_identical_across_sampler_methods(monkeypatch):
    """With top_k=1 the draw is deterministic, so the sort and bisect
    methods must produce bit-identical pipelines end to end (the only
    difference between methods is the RNG stream of the stochastic draw)."""
    import controlvar_tpu.ops.sampling as sm

    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(CFG)
    params = model.init_params(jax.random.key(1))
    labels = jnp.asarray([1, 5], jnp.int32)
    ct = jnp.asarray([0, 2], jnp.int32)

    outs = {}
    # bisect_prng exercises the off-TPU fallback (aliases host-noise bisect
    # on CPU); the on-chip variant is additionally A/B'd by tools/sampler_ab.py
    for method in ("sort", "bisect", "bisect_prng"):
        monkeypatch.setattr(sm, "DEFAULT_METHOD", method)
        sampler = StepwiseJointSampler(model, vqvae, cfg_scale=2.0,
                                       top_k=1, top_p=0.0)
        sampler.compute_dtype = jnp.float32
        outs[method] = sampler(params, vq_params, labels, ct,
                               jax.random.key(7))
    for other in ("bisect", "bisect_prng"):
        for a, b in zip(outs["sort"], outs[other]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kv_window_covering_equals_full_prefix(monkeypatch):
    """kv_window >= num_scales-1 keeps every segment -> bit-identical to the
    plain seg decode; a small window provably DROPS middle segments while
    still decoding finite deterministic images (scale-aware KV compression
    opt-in, PAPERS.md). Output equality under window=1 is possible at tiny
    depth (the logit shift need not flip any sampled token), so the drop is
    asserted structurally."""
    import controlvar_tpu.eval.stepwise as sw

    calls = []
    orig = sw._windowed_segs

    def spy(sk, sv, w):
        out = orig(sk, sv, w)
        calls.append((len(sk), len(out[0])))
        return out

    monkeypatch.setattr(sw, "_windowed_segs", spy)
    pns = (1, 2, 3, 4, 5)  # enough scales that window=1 actually drops
    vq5 = VQVAEConfig(ch=32, patch_nums=pns, vocab_size=64)
    cfg5 = ControlVARConfig(
        depth=2, embed_dim=128, num_heads=2, patch_nums=pns,
        vocab_size=64, cvae=32, num_classes=8, mask_factor=2, multi_cond=True,
    )
    vqvae = VQVAE(vq5)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(cfg5)
    params = model.init_params(jax.random.key(1))
    labels = jnp.asarray([1, 5], jnp.int32)
    ct = jnp.asarray([0, 2], jnp.int32)

    def run(**kw):
        s = StepwiseJointSampler(model, vqvae, cfg_scale=2.0, top_k=10,
                                 top_p=0.9, cache_mode="seg", **kw)
        s.compute_dtype = jnp.float32
        return s(params, vq_params, labels, ct, jax.random.key(7))

    base = run()
    covered = run(kv_window=len(pns))
    for a, b in zip(base, covered):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    calls.clear()
    small_a = run(kv_window=1)
    small_b = run(kv_window=1)
    for a, b in zip(small_a, small_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.isfinite(np.asarray(a)).all()
    # the window actually dropped middle segments (5 scales, w=1: the
    # scale-3 and scale-4 steps read sink + last-1 instead of the full list)
    assert any(kept < seen for seen, kept in calls), calls
    assert max(kept for _, kept in calls) <= 2


def test_kv_window_guards():
    vqvae = VQVAE(VQ_CFG)
    model = ControlVARModel(CFG)
    with pytest.raises(ValueError, match="requires cache_mode='seg'"):
        StepwiseJointSampler(model, vqvae, cache_mode="stacked", kv_window=2)


@pytest.mark.parametrize("env", ["CONTROLVAR_INV_DECODE",
                                 "CONTROLVAR_KV_FUSED",
                                 "CONTROLVAR_INPLACE_DECODE"])
def test_decode_variant_envs_preserve_joint_samples(monkeypatch, env):
    """Full-sampler integration for the decode cache-op variants: with the
    variant env set, StepwiseJointSampler must reproduce the default carry
    path's canvases EXACTLY (fp32 on CPU; same per-scale keys; the variants
    only restructure cache reads/writes — kv_fused/inplace are bitwise by
    construction, inv reassociates the joint softmax so allow fp noise)."""
    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(CFG)
    params = model.init_params(jax.random.key(1))
    labels = jnp.asarray([1, 5], jnp.int32)
    ct = jnp.asarray([0, 2], jnp.int32)

    def run():
        s = StepwiseJointSampler(model, vqvae, cfg_scale=2.0, top_k=1,
                                 top_p=0.0, cache_mode="stacked")
        s.compute_dtype = jnp.float32
        return s(params, vq_params, labels, ct, jax.random.key(7))

    monkeypatch.delenv(env, raising=False)
    c_ref, i_ref = run()
    monkeypatch.setenv(env, "1")
    c, i = run()
    # greedy (top_k=1) decode: identical token argmaxes unless the variant
    # perturbs logits beyond fp reassociation noise -> canvases equal
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
