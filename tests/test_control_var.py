"""ControlVAR parity vs the reference model (reference: models/control_var.py)
plus internal train-vs-decode consistency of the joint sampler."""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from controlvar_tpu.config import ControlVARConfig, VQVAEConfig
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.ckpt.torch_import import convert_control_var_state_dict

sys.path.insert(0, "/root/reference")

SMALL_VAE = VQVAEConfig(ch=32, patch_nums=(1, 2, 3), vocab_size=64, z_channels=8)
SMALL = ControlVARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
    vocab_size=64, cvae=8, cond_drop_rate=0.0, num_classes=10,
    mask_factor=2, multi_cond=True,
)


@pytest.fixture(scope="module")
def ref_vae():
    from models.vqvae import VQVAE as RefVQVAE  # type: ignore

    torch.manual_seed(0)
    return RefVQVAE(
        vocab_size=SMALL_VAE.vocab_size, z_channels=SMALL_VAE.z_channels,
        ch=SMALL_VAE.ch, v_patch_nums=SMALL_VAE.patch_nums, test_mode=True,
    )


def _make_pair(ref_vae, cfg):
    from models.control_var import ControlVAR as RefControlVAR  # type: ignore

    torch.manual_seed(1)
    ref = RefControlVAR(
        vae_local=ref_vae, num_classes=cfg.num_classes, depth=cfg.depth,
        embed_dim=cfg.embed_dim, num_heads=cfg.num_heads,
        patch_nums=cfg.patch_nums, cond_drop_rate=0.0,
        mask_factor=cfg.mask_factor, bidirectional=cfg.bidirectional,
        separate_decoding=cfg.separate_decoding, separator=cfg.separator,
        type_pos=cfg.type_pos, indep=cfg.indep, multi_cond=cfg.multi_cond,
        flash_if_available=False, fused_if_available=False,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_control_var_state_dict(sd, cfg)
    )
    return ref, ControlVARModel(cfg), params


def _tf_input(rng, cfg):
    L_tf = cfg.seq_len - cfg.first_l
    if cfg.separator:  # word-embedded part excludes separator slots
        L_tf = sum(2 * pn * pn for pn in cfg.patch_nums[1:])
    return rng.standard_normal((2, L_tf, cfg.cvae)).astype(np.float32)


@pytest.mark.parametrize(
    "flags",
    [
        dict(),                                     # flagship: multi_cond only
        dict(type_pos=True),
        dict(separate_decoding=True, indep=True),
    ],
    ids=["flagship", "type_pos", "indep"],
)
def test_forward_logits_parity(ref_vae, rng, flags):
    import dataclasses

    cfg = dataclasses.replace(SMALL, **flags)
    ref, ours, params = _make_pair(ref_vae, cfg)
    labels = np.array([3, 7], np.int64)
    cond_type = np.array([0, 2], np.int64)
    x_tf = _tf_input(rng, cfg)

    with torch.no_grad():
        ref_logits = ref(
            torch.from_numpy(labels), torch.from_numpy(x_tf),
            cond_type=torch.from_numpy(cond_type), mask_first=True,
        ).numpy()
    our_logits = np.asarray(
        ours.forward_train(
            params, jnp.asarray(labels.astype(np.int32)), jnp.asarray(x_tf),
            cond_type=jnp.asarray(cond_type.astype(np.int32)), mask_first=True,
            train=False, compute_dtype=jnp.float32, use_flash=False,
        )
    )
    assert our_logits.shape == ref_logits.shape
    np.testing.assert_allclose(our_logits, ref_logits, atol=3e-4, rtol=1e-3)


def test_separator_forward_shapes(ref_vae, rng):
    """Separator variant: the REFERENCE's separator training path is broken as
    written (models/control_var.py:609-612 indexes the 4-entry special_embed
    with vocab_size+idx and raises IndexError), so no oracle parity is
    possible. We implement the intended semantics (index with the mapping
    directly) and check shape/vocab contracts: L grows by 2*(S-1) separator
    slots and the head vocab by 2*(S-1) separator classes."""
    import dataclasses

    cfg = dataclasses.replace(SMALL, separator=True)
    model = ControlVARModel(cfg)
    params = model.init_params(jax.random.key(0))
    assert cfg.seq_len == SMALL.seq_len + 2 * (len(cfg.patch_nums) - 1)
    assert cfg.head_vocab == cfg.vocab_size + 2 * (len(cfg.patch_nums) - 1)
    x_tf = _tf_input(rng, cfg)
    logits = model.forward_train(
        params, jnp.asarray([1, 2], jnp.int32), jnp.asarray(x_tf),
        cond_type=jnp.asarray([0, 1], jnp.int32), train=False,
        compute_dtype=jnp.float32, use_flash=False,
    )
    assert logits.shape == (2, cfg.seq_len, cfg.head_vocab)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_joint_sample_end_to_end(rng):
    vqvae = VQVAE(SMALL_VAE)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(SMALL)
    params = model.init_params(jax.random.key(1))

    sample = jax.jit(
        lambda p, vp, lab, ct, k: model.sample_joint_cfg(
            p, vqvae, vp, lab, ct, k, cfg_scale=2.0, top_k=10, top_p=0.9,
            compute_dtype=jnp.float32,
        )
    )
    img_c, img_i = sample(
        params, vq_params,
        jnp.asarray([0, 1], jnp.int32), jnp.asarray([0, 3], jnp.int32),
        jax.random.key(2),
    )
    for img in (img_c, img_i):
        assert img.shape == (2, 48, 48, 3)
        assert bool(jnp.all(jnp.isfinite(img)))
        assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0


def test_cond_sample_teacher_forcing(rng):
    """Teacher-forced control ids must produce a control canvas that decodes
    exactly the forced token stream (the 'control' mechanism)."""
    vqvae = VQVAE(SMALL_VAE)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(SMALL)
    params = model.init_params(jax.random.key(1))
    quant = vqvae.quantizer

    B = 2
    c_mask = [
        jnp.asarray(rng.integers(0, SMALL.vocab_size, (B, pn * pn)).astype(np.int32))
        for pn in SMALL.patch_nums
    ]
    fh_c, fh_i = model.sample_cond_cfg(
        params, vqvae, vq_params,
        jnp.asarray([1, 2], jnp.int32), jnp.asarray([0, 0], jnp.int32),
        jax.random.key(3), cfg_scales=(1.0, 1.0, 1.0), c_mask=c_mask,
        top_k=5, top_p=0.0, compute_dtype=jnp.float32, decode_img=False,
    )
    # the control canvas must equal decoding the forced ids directly
    fh_forced = quant.ids_to_fhat(vq_params["quantize"], c_mask)
    np.testing.assert_allclose(
        np.asarray(fh_c), np.asarray(fh_forced), atol=1e-4, rtol=1e-4
    )
    # image canvas is sampled, must differ
    assert float(jnp.abs(fh_i - fh_c).max()) > 1e-3


def test_forward_logits_parity_bidirectional(ref_vae, rng):
    """Bidirectional (non-multi_cond) training forward: sos sign trick
    (reference: control_var.py:591-596), both stream orders."""
    import dataclasses

    cfg = dataclasses.replace(SMALL, multi_cond=False, bidirectional=True)
    ref, ours, params = _make_pair(ref_vae, cfg)
    labels = np.array([3, 7], np.int64)
    x_tf = _tf_input(rng, cfg)
    for mask_first in (True, False):
        with torch.no_grad():
            ref_logits = ref(
                torch.from_numpy(labels), torch.from_numpy(x_tf),
                cond_type=None, mask_first=mask_first,
            ).numpy()
        ours_logits = np.asarray(
            ours.forward_train(
                params, jnp.asarray(labels.astype(np.int32)), jnp.asarray(x_tf),
                cond_type=None, mask_first=mask_first,
                train=False, compute_dtype=jnp.float32, use_flash=False,
            )
        )
        np.testing.assert_allclose(ours_logits, ref_logits, atol=3e-4, rtol=1e-3)


def test_separate_decoding_joint_oracle(ref_vae, rng):
    """Greedy (top_k=1) separate-decoding joint generation matches the
    reference's sequential per-segment decode bit-for-token
    (reference: control_var.py:430-485)."""
    import dataclasses

    from controlvar_tpu.ckpt.torch_import import convert_vqvae_state_dict

    cfg = dataclasses.replace(SMALL, separate_decoding=True, indep=False)
    ref, ours, params = _make_pair(ref_vae, cfg)
    vq_sd = {k: v.detach().numpy() for k, v in ref_vae.state_dict().items()}
    vq_params = jax.tree_util.tree_map(
        jnp.asarray, convert_vqvae_state_dict(vq_sd, SMALL_VAE)
    )
    vqvae = VQVAE(SMALL_VAE)
    labels = np.array([3, 7], np.int64)
    cond_type = np.array([0, 2], np.int64)

    with torch.no_grad():
        ref_img = ref.autoregressive_infer_cfg(
            B=2, label_B=torch.from_numpy(labels), g_seed=0, cfg=2.0,
            top_k=1, top_p=0.0, cond_type=torch.from_numpy(cond_type),
        ).numpy()  # (B, 3, 2H, W), streams stacked on H
    H = ref_img.shape[2] // 2
    ref_c = np.transpose(ref_img[:, :, :H], (0, 2, 3, 1))
    ref_i = np.transpose(ref_img[:, :, H:], (0, 2, 3, 1))

    img_c, img_i = jax.jit(
        lambda p, vp, l, c, k: ours.sample_joint_separate(
            p, vqvae, vp, l, c, k, cfg_scale=2.0, top_k=1, top_p=0.0,
            compute_dtype=jnp.float32,
        )
    )(
        params, vq_params, jnp.asarray(labels.astype(np.int32)),
        jnp.asarray(cond_type.astype(np.int32)), jax.random.key(0),
    )
    np.testing.assert_allclose(np.asarray(img_c), ref_c, atol=2e-3)
    np.testing.assert_allclose(np.asarray(img_i), ref_i, atol=2e-3)


def test_cond_repeat3_equals_repeat4_when_t2_eq_t3(rng):
    """The 3-way CFG combine (reference: control_var.py:301-307) with scales
    (t1, t2) must equal the 4-way combine with (t1, t2, t3=t2): the third
    branch's coefficient vanishes and the remaining branches coincide."""
    vqvae = VQVAE(SMALL_VAE)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(SMALL)
    params = model.init_params(jax.random.key(1))
    B = 2
    c_mask = [
        jnp.asarray(rng.integers(0, SMALL.vocab_size, (B, pn * pn)).astype(np.int32))
        for pn in SMALL.patch_nums
    ]
    kw = dict(c_mask=c_mask, top_k=1, top_p=0.0,
              compute_dtype=jnp.float32, decode_img=False)
    labels = jnp.asarray([1, 2], jnp.int32)
    ct = jnp.asarray([0, 0], jnp.int32)
    fh3 = jax.jit(
        lambda p, vp: model.sample_cond_cfg(
            p, vqvae, vp, labels, ct, jax.random.key(3),
            cfg_scales=(2.0, 3.0, 3.0), repeat_num=3, **kw,
        )
    )(params, vq_params)
    fh4 = jax.jit(
        lambda p, vp: model.sample_cond_cfg(
            p, vqvae, vp, labels, ct, jax.random.key(3),
            cfg_scales=(2.0, 3.0, 3.0), repeat_num=4, **kw,
        )
    )(params, vq_params)
    np.testing.assert_allclose(np.asarray(fh3[0]), np.asarray(fh4[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fh3[1]), np.asarray(fh4[1]), atol=1e-5)


def test_cond_more_smooth_smoke(rng):
    """more_smooth builds canvases from gumbel soft embeddings
    (reference: control_var.py:326-331): finite, differs from hard mode."""
    vqvae = VQVAE(SMALL_VAE)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(SMALL)
    params = model.init_params(jax.random.key(1))
    B = 2
    c_mask = [
        jnp.asarray(rng.integers(0, SMALL.vocab_size, (B, pn * pn)).astype(np.int32))
        for pn in SMALL.patch_nums
    ]
    labels = jnp.asarray([1, 2], jnp.int32)
    ct = jnp.asarray([0, 0], jnp.int32)
    outs = {}
    for ms in (False, True):
        outs[ms] = jax.jit(
            lambda p, vp, ms=ms: model.sample_cond_cfg(
                p, vqvae, vp, labels, ct, jax.random.key(5),
                cfg_scales=(2.0, 2.0, 2.0), c_mask=c_mask, top_k=5, top_p=0.0,
                compute_dtype=jnp.float32, decode_img=False, more_smooth=ms,
            )
        )(params, vq_params)
    assert bool(jnp.isfinite(outs[True][0]).all())
    assert bool(jnp.isfinite(outs[True][1]).all())
    assert float(jnp.abs(outs[True][1] - outs[False][1]).max()) > 1e-4


def test_joint_bidirectional_order_matters():
    """mask_first must change bidirectional sampling (the sos sign trick) and
    returned canvases must stay (control, image) ordered."""
    import dataclasses

    cfg = dataclasses.replace(SMALL, multi_cond=False, bidirectional=True)
    vqvae = VQVAE(SMALL_VAE)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(cfg)
    params = model.init_params(jax.random.key(1))
    labels = jnp.asarray([0, 1], jnp.int32)
    ct = jnp.asarray([0, 0], jnp.int32)
    outs = {}
    for mf in (True, False):
        outs[mf] = jax.jit(
            lambda p, vp, mf=mf: model.sample_joint_cfg(
                p, vqvae, vp, labels, ct, jax.random.key(2),
                cfg_scale=2.0, top_k=1, top_p=0.0, compute_dtype=jnp.float32,
                decode_img=False, mask_first=mf,
            )
        )(params, vq_params)
    assert float(jnp.abs(outs[True][0] - outs[False][0]).max()) > 1e-4


# ---- mask_factor == 1 ("replace") ------------------------------------------

M1 = ControlVARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
    vocab_size=64, cvae=8, cond_drop_rate=0.0, num_classes=10,
    mask_factor=1, multi_cond=False,
)


def test_replace_mode_forward_logits_parity(ref_vae, rng):
    """mask_factor==1 training-forward parity vs the reference (the m==1 sos
    branch, reference: models/control_var.py:591-599) — the foundation for
    the sampler argument in the test below."""
    ref, ours, params = _make_pair(ref_vae, M1)
    labels = np.array([3, 7], np.int64)
    L_tf = M1.seq_len - M1.first_l
    x_tf = rng.standard_normal((2, L_tf, M1.cvae)).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref(
            torch.from_numpy(labels), torch.from_numpy(x_tf),
            cond_type=None, mask_first=True,
        ).numpy()
    our_logits = np.asarray(
        ours.forward_train(
            params, jnp.asarray(labels.astype(np.int32)), jnp.asarray(x_tf),
            train=False, compute_dtype=jnp.float32, use_flash=False,
        )
    )
    assert our_logits.shape == ref_logits.shape == (2, M1.seq_len, M1.vocab_size)
    np.testing.assert_allclose(our_logits, ref_logits, atol=3e-4, rtol=1e-3)


def test_replace_mode_sample_decode_consistency(rng):
    """m==1 sampler correctness without a runnable reference oracle (the
    reference's m==1 epilogue decodes f_hat_1/f_hat_2 that are never assigned
    on that branch, control_var.py:563-565 -> NameError). Argument chain:
    (a) forward logits match the reference bitwise-close (test above);
    (b) here: the KV-cached greedy decode's per-step logits equal the
        teacher-forced full forward over the decoded stream, so given (a)
        the sampled greedy token stream IS what the reference's m==1 loop
        would produce with the same weights and CFG formula."""
    from controlvar_tpu.models import transformer as tfm
    from controlvar_tpu.models.quantizer import MultiScaleQuantizer

    cfg = M1
    vqvae = VQVAE(SMALL_VAE)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(cfg)
    params = model.init_params(jax.random.key(1))
    quant = MultiScaleQuantizer(SMALL_VAE)
    labels = jnp.asarray([1, 4], jnp.int32)
    B = 2

    # greedy sample (cfg_scale=0 -> conditional row only), keep the canvas
    fh = model.sample_joint_cfg(
        params, vqvae, vq_params, labels, None, jax.random.key(2),
        cfg_scale=0.0, top_k=1, top_p=0.0, compute_dtype=jnp.float32,
        decode_img=False,
    )
    assert fh.shape == (B, 3, 3, SMALL_VAE.z_channels)

    # re-derive the greedy stream step by step and teacher-force it
    cond = jnp.take(params["class_emb"], labels, axis=0)
    lvl_pos = model._lvl_pos(params)
    next_map = cond[:, None, :] + params["pos_start"] + lvl_pos[:, : cfg.first_l]
    ck, cv = tfm.init_kv_cache(cfg, B, cfg.seq_len, jnp.float32)
    f_hat = jnp.zeros((B, 3, 3, SMALL_VAE.z_channels), jnp.float32)
    ids_all, step_logits, cur = [], [], 0
    for si, pn in enumerate(cfg.patch_nums):
        x, ck, cv = tfm.blocks_decode(
            params["blocks"], next_map.astype(jnp.float32), cond, cfg, ck, cv, cur
        )
        lg = tfm.head_logits(params, x, cond, cfg)
        step_logits.append(lg)
        ids = jnp.argmax(lg[:, :, : cfg.vocab_size], axis=-1).astype(jnp.int32)
        ids_all.append(ids)
        h = quant.embed(vq_params["quantize"], ids).reshape(B, pn, pn, -1)
        f_hat, nxt = quant.next_ar_input(vq_params["quantize"], si, f_hat, h)
        cur += pn * pn
        if si != cfg.num_scales - 1:
            nm = model._word_embed(params, nxt.reshape(B, -1, SMALL_VAE.z_channels))
            next_map = nm + lvl_pos[:, cur : cur + cfg.patch_nums[si + 1] ** 2]
    # the fused sampler's canvas must equal the step-by-step greedy canvas
    np.testing.assert_allclose(np.asarray(fh), np.asarray(f_hat), atol=1e-5, rtol=1e-5)
    # decode logits == teacher-forced logits over the SAME stream
    tf_feats = quant.ids_to_var_input(vq_params["quantize"], ids_all)
    full = model.forward_train(
        params, labels, jnp.concatenate(tf_feats, axis=1),
        train=False, compute_dtype=jnp.float32, use_flash=False,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(step_logits, axis=1)), np.asarray(full),
        atol=2e-4, rtol=1e-3,
    )


def test_replace_mode_sample_end_to_end(rng):
    """Smoke: jitted m==1 sampler produces one finite image per sample."""
    vqvae = VQVAE(SMALL_VAE)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(M1)
    params = model.init_params(jax.random.key(1))
    sample = jax.jit(
        lambda p, vp, lab, k: model.sample_joint_cfg(
            p, vqvae, vp, lab, None, k, cfg_scale=2.0, top_k=10, top_p=0.9,
            compute_dtype=jnp.float32,
        )
    )
    img = sample(params, vq_params, jnp.asarray([0, 1], jnp.int32), jax.random.key(2))
    assert img.shape == (2, 48, 48, 3)
    assert bool(jnp.all(jnp.isfinite(img)))
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0
