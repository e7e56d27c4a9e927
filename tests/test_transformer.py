"""Transformer core tests: flash-attention kernel parity, mask golden tests
vs the reference buffers, and VAR logits parity vs the reference model."""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from controlvar_tpu.config import ControlVARConfig, VARConfig, VQVAEConfig
from controlvar_tpu.models import masks as masks_mod
from controlvar_tpu.models.var import VARModel
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.ckpt.torch_import import convert_var_state_dict
from controlvar_tpu.ops.attention import flash_attention, mha_xla

sys.path.insert(0, "/root/reference")

SMALL_VAE = VQVAEConfig(ch=32, patch_nums=(1, 2, 3), vocab_size=64, z_channels=8)
SMALL_VAR = VARConfig(
    depth=3, embed_dim=192, num_heads=3, patch_nums=(1, 2, 3),
    vocab_size=64, cvae=8, cond_drop_rate=0.0, num_classes=10,
)


def test_flash_attention_matches_xla(rng):
    B, H, L, hd = 2, 3, 21, 16  # L=21: exercises padding
    q = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    mask = jnp.asarray(masks_mod.block_causal_mask((1, 2, 4)))  # L=21
    ref = mha_xla(q, k, v, 0.125, mask)
    out = flash_attention(q, k, v, mask, 0.125, block_q=16, block_k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


@pytest.fixture(scope="module")
def ref_vae():
    from models.vqvae import VQVAE as RefVQVAE  # type: ignore

    torch.manual_seed(0)
    return RefVQVAE(
        vocab_size=SMALL_VAE.vocab_size, z_channels=SMALL_VAE.z_channels,
        ch=SMALL_VAE.ch, v_patch_nums=SMALL_VAE.patch_nums, test_mode=True,
    )


@pytest.fixture(scope="module")
def ref_var(ref_vae):
    from models.var import VAR as RefVAR  # type: ignore

    torch.manual_seed(1)
    m = RefVAR(
        vae_local=ref_vae, num_classes=SMALL_VAR.num_classes,
        depth=SMALL_VAR.depth, embed_dim=SMALL_VAR.embed_dim,
        num_heads=SMALL_VAR.num_heads, patch_nums=SMALL_VAR.patch_nums,
        cond_drop_rate=0.0, flash_if_available=False, fused_if_available=False,
    ).eval()
    return m


def test_var_mask_matches_reference(ref_var):
    ref_mask = ref_var.attn_bias_for_masking[0, 0].numpy() == 0
    ours = masks_mod.block_causal_mask(SMALL_VAR.patch_nums)
    np.testing.assert_array_equal(ours, ref_mask)
    np.testing.assert_array_equal(
        masks_mod.level_index_1L(SMALL_VAR.patch_nums), ref_var.lvl_1L[0].numpy()
    )


def test_control_var_masks_match_reference(ref_vae):
    from models.control_var import ControlVAR as RefControlVAR  # type: ignore

    for sep_dec, indep in ((False, False), (True, False), (True, True)):
        torch.manual_seed(2)
        ref = RefControlVAR(
            vae_local=ref_vae, num_classes=10, depth=2, embed_dim=128,
            num_heads=2, patch_nums=(1, 2, 3), mask_factor=2,
            separate_decoding=sep_dec, indep=indep, type_pos=True,
            flash_if_available=False, fused_if_available=False,
        )
        ref_mask = np.isfinite(ref.attn_bias_for_masking[0, 0].numpy()) & (
            ref.attn_bias_for_masking[0, 0].numpy() == 0
        )
        if sep_dec:
            ours = masks_mod.separate_decoding_mask((1, 2, 3), False, indep)
        else:
            ours = masks_mod.block_causal_mask((1, 2, 3), 2, False)
        np.testing.assert_array_equal(ours, ref_mask, err_msg=f"{sep_dec=} {indep=}")
        np.testing.assert_array_equal(
            masks_mod.level_index_1L((1, 2, 3), 2), ref.lvl_1L[0].numpy()
        )
        np.testing.assert_array_equal(
            masks_mod.type_index_1L((1, 2, 3), False, True), ref.type_1L[0].numpy()
        )
        np.testing.assert_array_equal(
            masks_mod.type_index_1L((1, 2, 3), False, False), ref.type_1L_[0].numpy()
        )


def test_var_forward_logits_parity(ref_var, rng):
    ours = VARModel(SMALL_VAR)
    sd = {k: v.detach().numpy() for k, v in ref_var.state_dict().items()}
    params = convert_var_state_dict(sd, SMALL_VAR)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    B = 2
    L_tf = SMALL_VAR.seq_len - SMALL_VAR.first_l
    labels = np.array([3, 7], np.int64)
    x_tf = rng.standard_normal((B, L_tf, SMALL_VAE.z_channels)).astype(np.float32)

    with torch.no_grad():
        ref_logits = ref_var(torch.from_numpy(labels), torch.from_numpy(x_tf)).numpy()

    our_logits = np.asarray(
        ours.forward_train(
            params, jnp.asarray(labels.astype(np.int32)), jnp.asarray(x_tf),
            train=False, compute_dtype=jnp.float32, use_flash=False,
        )
    )
    np.testing.assert_allclose(our_logits, ref_logits, atol=2e-4, rtol=1e-3)


def test_var_train_vs_decode_consistency(rng):
    """Teacher-forced full forward must equal step-by-step KV-cached decode
    (the invariant the reference only asserts in a commented line, var.py:181)."""
    from controlvar_tpu.models import transformer as tfm
    from controlvar_tpu.models.quantizer import MultiScaleQuantizer

    cfg = SMALL_VAR
    model = VARModel(cfg)
    params = model.init_params(jax.random.key(0))
    vq = MultiScaleQuantizer(SMALL_VAE)
    vq_params = vq.init_params(jax.random.key(1))

    B = 2
    ids = [
        jnp.asarray(rng.integers(0, cfg.vocab_size, (B, pn * pn)).astype(np.int32))
        for pn in cfg.patch_nums
    ]
    tf_feats = vq.ids_to_var_input(vq_params, ids)
    x_tf = jnp.concatenate(tf_feats, axis=1)
    labels = jnp.asarray([1, 2], jnp.int32)

    full_logits = model.forward_train(
        params, labels, x_tf, train=False, compute_dtype=jnp.float32, use_flash=False
    )

    # step-by-step decode with teacher-forced inputs
    cond = jnp.take(params["class_emb"], labels, axis=0)
    lvl_pos = model._lvl_pos(params)
    next_map = cond[:, None, :] + params["pos_start"] + lvl_pos[:, : cfg.first_l]
    ck, cv = tfm.init_kv_cache(cfg, B, cfg.seq_len, jnp.float32)
    f_hat = jnp.zeros((B, 3, 3, SMALL_VAE.z_channels), jnp.float32)
    cur = 0
    step_logits = []
    for si, pn in enumerate(cfg.patch_nums):
        x, ck, cv = tfm.blocks_decode(
            params["blocks"], next_map.astype(jnp.float32), cond, cfg, ck, cv, cur
        )
        step_logits.append(tfm.head_logits(params, x, cond, cfg))
        h = vq.embed(vq_params, ids[si]).reshape(B, pn, pn, -1)
        f_hat, next_in = vq.next_ar_input(vq_params, si, f_hat, h)
        cur += pn * pn
        if si != cfg.num_scales - 1:
            nm = model._word_embed(params, next_in.reshape(B, -1, SMALL_VAE.z_channels))
            next_map = nm + lvl_pos[:, cur : cur + cfg.patch_nums[si + 1] ** 2]
    step_logits = jnp.concatenate(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(full_logits), atol=2e-4, rtol=1e-3
    )


def test_var_sample_end_to_end(rng):
    """Smoke: jitted CFG sampler produces finite images of the right shape."""
    vqvae = VQVAE(SMALL_VAE)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = VARModel(SMALL_VAR)
    params = model.init_params(jax.random.key(1))

    sample = jax.jit(
        lambda p, vp, lab, k: model.sample_cfg(
            p, vqvae, vp, lab, k, cfg_scale=1.5, top_k=10, top_p=0.9,
            compute_dtype=jnp.float32,
        )
    )
    img = sample(params, vq_params, jnp.asarray([0, 1], jnp.int32), jax.random.key(2))
    assert img.shape == (2, 48, 48, 3)
    assert bool(jnp.all(jnp.isfinite(img)))
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0


def test_flash_decode_matches_xla_interpret(rng):
    """Decode kernel (bh-blocked) vs the XLA einsum path, incl. the padded-q
    and masked variants, in Pallas interpret mode (runs on CPU)."""
    from controlvar_tpu.ops.attention import NEG_INF, flash_decode

    B, H, hd, Lk = 2, 4, 16, 48
    for l, with_mask in ((12, False), (16, True), (5, False)):
        q = jnp.asarray(rng.standard_normal((B, H, l, hd)).astype(np.float32))
        kT = jnp.asarray(rng.standard_normal((B, H, hd, Lk)).astype(np.float32))
        vT = jnp.asarray(rng.standard_normal((B, H, hd, Lk)).astype(np.float32))
        mask = None
        if with_mask:
            mask = jnp.asarray(rng.random((l, Lk)) > 0.3)
            mask = mask.at[:, 0].set(True)  # keep rows non-empty
        out = flash_decode(q, kT, vT, mask=mask, scale=0.25, block_q=8,
                           bh_block=4, interpret=True)
        # reference: einsum path
        logits = jnp.einsum("bhqd,bhdk->bhqk", q * 0.25, kT).astype(jnp.float32)
        if mask is not None:
            logits = jnp.where(mask, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        ref = jnp.einsum("bhqk,bhdk->bhqd", probs, vT)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_flash_decode_prefix_matches_xla_interpret(rng):
    """Prefix kernel (in-kernel zero-copy cache read, tail iota-masking of
    the 8-aligned prefix block) vs XLA attention over [prefix | fresh]."""
    from controlvar_tpu.ops.attention import NEG_INF, flash_decode_prefix

    B, H, hd, L_max = 2, 4, 16, 64
    H2 = H // 2
    for pos, l, with_mask in ((24, 12, False), (32, 16, True),
                              (30, 5, False)):
        q = jnp.asarray(rng.standard_normal((B, H, l, hd)).astype(np.float32))
        ck = jnp.asarray(
            rng.standard_normal((B, H2, L_max, 2 * hd)).astype(np.float32))
        cv = jnp.asarray(
            rng.standard_normal((B, H2, L_max, 2 * hd)).astype(np.float32))
        kn = jnp.asarray(
            rng.standard_normal((B, H2, l, 2 * hd)).astype(np.float32))
        vn = jnp.asarray(
            rng.standard_normal((B, H2, l, 2 * hd)).astype(np.float32))
        mask = None
        if with_mask:
            mask = jnp.asarray(rng.random((l, pos + l)) > 0.3)
            mask = mask.at[:, 0].set(True)
        out = flash_decode_prefix(q, ck, cv, kn, vn, pos, mask=mask,
                                  scale=0.25, block_q=8, interpret=True)
        # reference: unpack paired cache prefix + fresh into (B, H, Lk, hd)
        def unpack(t, L):  # (B, H2, L, 2*hd) -> (B, H, L, hd)
            return t.reshape(B, H2, L, 2, hd).transpose(0, 1, 3, 2, 4).reshape(
                B, H, L, hd)
        k_all = jnp.concatenate([unpack(ck[:, :, :pos], pos),
                                 unpack(kn, l)], axis=2)
        v_all = jnp.concatenate([unpack(cv[:, :, :pos], pos),
                                 unpack(vn, l)], axis=2)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * 0.25, k_all).astype(jnp.float32)
        if mask is not None:
            logits = jnp.where(mask, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        ref = jnp.einsum("bhqk,bhkd->bhqd", probs, v_all)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_flash_decode_paired_matches_xla_interpret(rng):
    """Paired-head decode kernel (two hd heads per 128-lane cache column) vs
    XLA attention on the unpacked heads, incl. masked and padded-q cases."""
    from controlvar_tpu.ops.attention import NEG_INF, flash_decode_paired

    B, H, hd, Lk = 2, 4, 16, 48
    H2 = H // 2
    for l, with_mask in ((12, False), (16, True), (5, False)):
        q = jnp.asarray(rng.standard_normal((B, H, l, hd)).astype(np.float32))
        kp = jnp.asarray(
            rng.standard_normal((B, H2, Lk, 2 * hd)).astype(np.float32))
        vp = jnp.asarray(
            rng.standard_normal((B, H2, Lk, 2 * hd)).astype(np.float32))
        mask = None
        if with_mask:
            mask = jnp.asarray(rng.random((l, Lk)) > 0.3)
            mask = mask.at[:, 0].set(True)
        out = flash_decode_paired(q, kp, vp, mask=mask, scale=0.25,
                                  block_q=8, bh_block=2, interpret=True)
        def unpack(t):
            return t.reshape(B, H2, Lk, 2, hd).transpose(0, 1, 3, 2, 4).reshape(
                B, H, Lk, hd)
        k = unpack(kp)
        v = unpack(vp)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * 0.25, k).astype(jnp.float32)
        if mask is not None:
            logits = jnp.where(mask, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        ref = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_flash_decode_fused_matches_paired_interpret(rng):
    """Fused single-buffer KV decode kernel ([k_pair | v_pair] rows) must be
    BITWISE equal to the paired two-buffer kernel — same dot operands, only
    the cache layout differs (ops/attention._decode_kernel_fused)."""
    from controlvar_tpu.ops.attention import flash_decode_fused, flash_decode_paired

    B, H, hd, Lk = 2, 4, 16, 48
    H2 = H // 2
    for l, with_mask in ((12, False), (16, True), (5, False)):
        q = jnp.asarray(rng.standard_normal((B, H, l, hd)).astype(np.float32))
        kp = jnp.asarray(
            rng.standard_normal((B, H2, Lk, 2 * hd)).astype(np.float32))
        vp = jnp.asarray(
            rng.standard_normal((B, H2, Lk, 2 * hd)).astype(np.float32))
        mask = None
        if with_mask:
            mask = jnp.asarray(rng.random((l, Lk)) > 0.3)
            mask = mask.at[:, 0].set(True)
        ref = flash_decode_paired(q, kp, vp, mask=mask, scale=0.25,
                                  block_q=8, bh_block=2, interpret=True)
        kv = jnp.concatenate([kp, vp], axis=-1)
        out = flash_decode_fused(q, kv, mask=mask, scale=0.25,
                                 block_q=8, bh_block=2, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fused_cache_decode_matches_paired(rng, monkeypatch):
    """blocks_decode with the fused single-buffer cache (kv_fused) must be
    bitwise equal to the two-buffer paired cache across chained scale steps
    (write offsets + prefix reads exercised)."""
    from controlvar_tpu.models import transformer as tfm

    cfg = VARConfig(
        depth=3, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
        vocab_size=64, cvae=8, cond_drop_rate=0.0, num_classes=10,
    )
    model = VARModel(cfg)
    params = model.init_params(jax.random.key(0))
    B = 2
    cond = jnp.asarray(rng.standard_normal((B, cfg.embed_dim)).astype(np.float32))
    xs = [jnp.asarray(rng.standard_normal((B, l, cfg.embed_dim))
                      .astype(np.float32)) for l in (1, 4, 9)]

    def run():
        ck, cv = tfm.init_kv_cache(cfg, B, cfg.seq_len, jnp.float32)
        ys = []
        pos = 0
        for x in xs:
            y, ck, cv = tfm.blocks_decode(params["blocks"], x, cond, cfg,
                                          ck, cv, pos)
            ys.append(y)
            pos += x.shape[1]
        return ys

    monkeypatch.setenv("CONTROLVAR_KV_FUSED", "0")
    assert not tfm.kv_fused(cfg)
    ys_paired = run()
    monkeypatch.setenv("CONTROLVAR_KV_FUSED", "1")
    assert tfm.kv_fused(cfg)
    ys_fused = run()
    for a, b in zip(ys_paired, ys_fused):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_inplace_decode_matches_split_path(rng, monkeypatch):
    """blocks_decode with CONTROLVAR_INPLACE_DECODE=1 (fused write+attend
    kernel, interpret mode on CPU) must match the split DUS+read path across
    chained scale steps: caches bitwise equal (same rows written), outputs
    allclose (two-tile joint softmax vs single softmax differ only in fp
    reassociation)."""
    from controlvar_tpu.models import transformer as tfm

    cfg = VARConfig(
        depth=3, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
        vocab_size=64, cvae=8, cond_drop_rate=0.0, num_classes=10,
    )
    model = VARModel(cfg)
    params = model.init_params(jax.random.key(0))
    B = 2
    cond = jnp.asarray(rng.standard_normal((B, cfg.embed_dim)).astype(np.float32))
    xs = [jnp.asarray(rng.standard_normal((B, l, cfg.embed_dim))
                      .astype(np.float32)) for l in (1, 4, 9)]

    def run():
        ck, cv = tfm.init_kv_cache(cfg, B, cfg.seq_len, jnp.float32)
        ys = []
        pos = 0
        for x in xs:
            y, ck, cv = tfm.blocks_decode(params["blocks"], x, cond, cfg,
                                          ck, cv, pos)
            ys.append(y)
            pos += x.shape[1]
        return ys, ck, cv

    monkeypatch.delenv("CONTROLVAR_INPLACE_DECODE", raising=False)
    ys_ref, ck_ref, cv_ref = run()
    monkeypatch.setenv("CONTROLVAR_INPLACE_DECODE", "1")
    ys_new, ck_new, cv_new = run()
    np.testing.assert_array_equal(np.asarray(ck_new), np.asarray(ck_ref))
    np.testing.assert_array_equal(np.asarray(cv_new), np.asarray(cv_ref))
    for a, b in zip(ys_new, ys_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)


def test_inv_decode_matches_carry_path(rng, monkeypatch):
    """blocks_decode_inv (loop-invariant caches + ys + one post-scan DUS per
    cache) must match the carry-scan path across chained scale steps."""
    from controlvar_tpu.models import transformer as tfm

    cfg = VARConfig(
        depth=3, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
        vocab_size=64, cvae=8, cond_drop_rate=0.0, num_classes=10,
    )
    model = VARModel(cfg)
    params = model.init_params(jax.random.key(0))
    B = 2
    cond = jnp.asarray(rng.standard_normal((B, cfg.embed_dim)).astype(np.float32))
    xs = [jnp.asarray(rng.standard_normal((B, l, cfg.embed_dim))
                      .astype(np.float32)) for l in (1, 4, 9)]

    def run():
        ck, cv = tfm.init_kv_cache(cfg, B, cfg.seq_len, jnp.float32)
        ys = []
        pos = 0
        for x in xs:
            y, ck, cv = tfm.blocks_decode_any(params["blocks"], x, cond, cfg,
                                              ck, cv, pos)
            ys.append(y)
            pos += x.shape[1]
        return ys, ck, cv

    monkeypatch.delenv("CONTROLVAR_INV_DECODE", raising=False)
    ys_ref, ck_ref, cv_ref = run()
    monkeypatch.setenv("CONTROLVAR_INV_DECODE", "1")
    ys_new, ck_new, cv_new = run()
    np.testing.assert_array_equal(np.asarray(ck_new), np.asarray(ck_ref))
    np.testing.assert_array_equal(np.asarray(cv_new), np.asarray(cv_ref))
    for a, b in zip(ys_new, ys_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)


def test_flash_attention_bwd_matches_einsum_interpret(rng):
    """Pallas flash backward (dq, dk, dv from LSE recompute) vs the einsum
    backward, interpret mode."""
    from controlvar_tpu.ops.attention import (
        NEG_INF,
        flash_attention,
        flash_attention_bwd,
    )

    B, H, L, hd = 1, 8, 24, 16
    scale = 0.3
    q = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    mask = jnp.asarray(np.tril(np.ones((L, L), bool)))

    out, lse = flash_attention(q, k, v, mask, scale, block_q=8, block_k=8,
                               bh_block=2, interpret=True, return_lse=True)
    dq, dk, dv = flash_attention_bwd(q, k, v, mask, out, lse, g, scale,
                                     block_q=8, block_k=8, interpret=True)

    # reference: einsum backward
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    s = jnp.where(mask, s.astype(jnp.float32), NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    dv_ref = jnp.einsum("bhqk,bhqd->bhkd", p, g)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v).astype(jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref = jnp.einsum("bhqk,bhkd->bhqd", ds, k) * scale
    dk_ref = jnp.einsum("bhqk,bhqd->bhkd", ds, q) * scale
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               atol=3e-5, rtol=1e-4)


def test_flash_bwd_small_explicit_blocks_cover_tail(rng):
    """Regression (round-4 advisor, medium): explicit block_q/block_k < 128
    with L > 128 used to compute the padding from the ORIGINAL blocks and
    then raise the blocks to a 128 floor, under-covering the grid — tail
    rows of dq/dk/dv were silently never written. Explicit blocks are now
    honored verbatim and Lp is recomputed after the final sizes."""
    from controlvar_tpu.ops.attention import (
        NEG_INF,
        flash_attention,
        flash_attention_bwd,
    )

    B, H, L, hd = 1, 2, 129, 8
    scale = 0.5
    q = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    mask = jnp.asarray(np.tril(np.ones((L, L), bool)))

    out, lse = flash_attention(q, k, v, mask, scale, block_q=8, block_k=8,
                               bh_block=2, interpret=True, return_lse=True)
    dq, dk, dv = flash_attention_bwd(q, k, v, mask, out, lse, g, scale,
                                     block_q=8, block_k=8, interpret=True)

    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    s = jnp.where(mask, s.astype(jnp.float32), NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    dv_ref = jnp.einsum("bhqk,bhqd->bhkd", p, g)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v).astype(jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref = jnp.einsum("bhqk,bhkd->bhqd", ds, k) * scale
    dk_ref = jnp.einsum("bhqk,bhqd->bhkd", ds, q) * scale
    # the tail row (index 128) is the regression: it must be non-trivially
    # correct, not a stale zero
    assert float(jnp.abs(dq_ref[..., -1, :]).max()) > 1e-4
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               atol=3e-5, rtol=1e-4)


def test_ablate_requires_explicit_ok(monkeypatch):
    """Regression (round-4 advisor, low): a stale CONTROLVAR_ABLATE env var
    must not silently corrupt production decode — it now raises unless
    CONTROLVAR_ABLATE_OK=1 is also set."""
    import pytest

    from controlvar_tpu.models import transformer as tfm

    monkeypatch.setenv("CONTROLVAR_ABLATE", "no_attn")
    monkeypatch.delenv("CONTROLVAR_ABLATE_OK", raising=False)
    with pytest.raises(RuntimeError, match="CONTROLVAR_ABLATE_OK"):
        tfm._ablate_mode()
    monkeypatch.setenv("CONTROLVAR_ABLATE_OK", "1")
    assert tfm._ablate_mode() == "no_attn"
    monkeypatch.delenv("CONTROLVAR_ABLATE")
    monkeypatch.delenv("CONTROLVAR_ABLATE_OK")
    assert tfm._ablate_mode() == ""


def test_chunked_layer_scan_matches_unsplit(rng, monkeypatch):
    """CONTROLVAR_SCAN_CHUNK splits blocks_forward into several trip-<=chunk
    scans (the flash-backward unlock path, PERF.md §6); outputs AND
    gradients must match the single-scan forward exactly."""
    from controlvar_tpu.models import transformer as tfm

    cfg = VARConfig(depth=4, embed_dim=64, num_heads=2, patch_nums=(1, 2, 3),
                    vocab_size=64, cvae=8, num_classes=10)
    model = VARModel(cfg)
    params = model.init_params(jax.random.key(0))
    B, L, C = 2, cfg.seq_len, cfg.embed_dim
    x = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32))
    mask = jnp.tril(jnp.ones((L, L), bool))

    def loss(bp, chunked):
        if chunked:
            monkeypatch.setenv("CONTROLVAR_SCAN_CHUNK", "2")
        else:
            monkeypatch.delenv("CONTROLVAR_SCAN_CHUNK", raising=False)
        y = tfm.blocks_forward(bp, x, cond, cfg, mask, train=True,
                               use_flash=False)
        return jnp.sum(y.astype(jnp.float32) ** 2), y

    (l0, y0), g0 = jax.value_and_grad(loss, has_aux=True)(params["blocks"], False)
    (l1, y1), g1 = jax.value_and_grad(loss, has_aux=True)(params["blocks"], True)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_remat_policy_same_grads(rng, monkeypatch):
    """CONTROLVAR_REMAT picks WHAT the layer-scan checkpoint saves across
    the backward (full residual-only remat vs saving weight-matmul /
    attention outputs — tools/remat_ab.py); the math is policy-invariant,
    so outputs and gradients must match the default bitwise."""
    from controlvar_tpu.models import transformer as tfm

    cfg = VARConfig(depth=4, embed_dim=64, num_heads=2, patch_nums=(1, 2, 3),
                    vocab_size=64, cvae=8, num_classes=10)
    model = VARModel(cfg)
    params = model.init_params(jax.random.key(0))
    B, L, C = 2, cfg.seq_len, cfg.embed_dim
    x = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32))
    mask = jnp.tril(jnp.ones((L, L), bool))

    def loss(bp, mode):
        if mode is None:
            monkeypatch.delenv("CONTROLVAR_REMAT", raising=False)
        else:
            monkeypatch.setenv("CONTROLVAR_REMAT", mode)
        y = tfm.blocks_forward(bp, x, cond, cfg, mask, train=True,
                               use_flash=False)
        return jnp.sum(y.astype(jnp.float32) ** 2), y

    (l0, y0), g0 = jax.value_and_grad(loss, has_aux=True)(params["blocks"], None)
    for mode in ("full", "dots", "dots_attn"):
        (l1, y1), g1 = jax.value_and_grad(loss, has_aux=True)(
            params["blocks"], mode)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
        assert float(l0) == float(l1), mode
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    monkeypatch.setenv("CONTROLVAR_REMAT", "nope")
    with pytest.raises(ValueError):
        loss(params["blocks"], "nope")
    monkeypatch.delenv("CONTROLVAR_REMAT")


def test_decode_ablation_modes_trace_and_default_untouched(rng, monkeypatch):
    """CONTROLVAR_ABLATE is a timing-only hook for the PERF.md §3
    re-attribution campaign: every mode must trace at real structure
    (shapes preserved), `no_cache_write` must leave the caches bitwise
    untouched, and the DEFAULT (unset) path must be unaffected by the
    hook's existence."""
    from controlvar_tpu.models import transformer as tfm

    cfg = VARConfig(
        depth=3, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
        vocab_size=64, cvae=8, cond_drop_rate=0.0, num_classes=10,
    )  # hd=64, even heads: the unrolled path needs the paired-head layout
    model = VARModel(cfg)
    params = model.init_params(jax.random.key(0))
    B, l, pos = 2, 4, 5
    cond = jnp.asarray(rng.standard_normal((B, cfg.embed_dim)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((B, l, cfg.embed_dim)).astype(np.float32))

    def run():
        ck, cv = tfm.init_kv_cache_layers(cfg, B, cfg.seq_len, jnp.float32)
        return tfm.blocks_decode_unrolled(
            params["blocks"], x, cond, cfg, ck, cv, pos)

    def run_scan():
        # the production stepwise path (stacked carry scan) — the campaign
        # ablates THERE, so the hooks must trace there too
        ck, cv = tfm.init_kv_cache(cfg, B, cfg.seq_len, jnp.float32)
        return tfm.blocks_decode(params["blocks"], x, cond, cfg, ck, cv, pos)

    monkeypatch.setenv("CONTROLVAR_ABLATE_OK", "1")  # explicit opt-in gate
    for runner in (run, run_scan):
        monkeypatch.delenv("CONTROLVAR_ABLATE", raising=False)
        y_ref, ck_ref, cv_ref = runner()
        for mode in ("no_attn", "no_cache_write", "attn_nocache"):
            monkeypatch.setenv("CONTROLVAR_ABLATE", mode)
            y, ck, cv = runner()
            assert y.shape == y_ref.shape and np.isfinite(np.asarray(y)).all()
            if mode == "no_cache_write":
                for a in jax.tree_util.tree_leaves(ck):
                    np.testing.assert_array_equal(
                        np.asarray(a), np.zeros_like(np.asarray(a)))
        monkeypatch.delenv("CONTROLVAR_ABLATE", raising=False)
        y2, _, _ = runner()
        np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y2))
