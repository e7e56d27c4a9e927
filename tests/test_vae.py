"""VQVAE encoder/decoder parity vs the reference CompVis backbone
(reference: models/vae_modules.py, models/vqvae.py), using a small config
so the CPU oracle is fast. Weights flow through the real .pth importer."""
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from controlvar_tpu.config import VQVAEConfig
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.ckpt.torch_import import convert_vqvae_state_dict

sys.path.insert(0, "/root/reference")

SMALL = VQVAEConfig(ch=32, patch_nums=(1, 2, 4), vocab_size=512)
IMG = 64  # 64/16 = 4 = last patch_num


@pytest.fixture(scope="module")
def pair():
    from models.vqvae import VQVAE as RefVQVAE  # type: ignore

    torch.manual_seed(0)
    ref = RefVQVAE(
        vocab_size=SMALL.vocab_size,
        z_channels=SMALL.z_channels,
        ch=SMALL.ch,
        v_patch_nums=SMALL.patch_nums,
        test_mode=True,
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ours = VQVAE(SMALL)
    params = convert_vqvae_state_dict(sd, SMALL)
    return ref, ours, params


def _img(rng, b=1):
    return (rng.random((b, IMG, IMG, 3)).astype(np.float32) * 2 - 1)


def _nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).contiguous()


def test_encoder_parity(pair, rng):
    ref, ours, params = pair
    x = _img(rng)
    with torch.no_grad():
        f_ref = ref.quant_conv(ref.encoder(_nchw(x))).permute(0, 2, 3, 1).numpy()
    f_ours = np.asarray(ours.encode_f(params, jnp.asarray(x)))
    np.testing.assert_allclose(f_ours, f_ref, atol=2e-4, rtol=1e-3)


def test_tokenize_parity(pair, rng):
    ref, ours, params = pair
    x = _img(rng, b=2)
    with torch.no_grad():
        ids_ref = ref.img_to_idxBl(_nchw(x), v_patch_nums=SMALL.patch_nums)
    ids_ours = ours.img_to_ids(params, jnp.asarray(x))
    for si, (r, o) in enumerate(zip(ids_ref, ids_ours)):
        match = (np.asarray(o) == r.numpy()).mean()
        assert match == 1.0, f"scale {si}: only {match:.3f} of tokens match"


def test_decoder_parity(pair, rng):
    ref, ours, params = pair
    f_hat = rng.standard_normal((1, 4, 4, SMALL.z_channels)).astype(np.float32)
    with torch.no_grad():
        img_ref = ref.fhat_to_img(_nchw(f_hat)).permute(0, 2, 3, 1).numpy()
    img_ours = np.asarray(ours.fhat_to_img(params, jnp.asarray(f_hat)))
    np.testing.assert_allclose(img_ours, img_ref, atol=2e-4, rtol=1e-3)


def test_full_recon_parity(pair, rng):
    """End-to-end img->tokens->img vs reference. With a random (untrained)
    codebook a near-tie token flip is possible and would amplify through the
    decoder, so parity on the image is only asserted when the token streams
    agree (token parity itself is asserted statistically in
    test_tokenize_parity and exactly in test_quantizer.py)."""
    ref, ours, params = pair
    x = _img(rng)
    with torch.no_grad():
        ids_ref = ref.img_to_idxBl(_nchw(x), v_patch_nums=SMALL.patch_nums)
        rec_ref = ref.img_to_recon(_nchw(x), v_patch_nums=SMALL.patch_nums, last_one=True)
        rec_ref = rec_ref.permute(0, 2, 3, 1).numpy()
    ids_ours = ours.img_to_ids(params, jnp.asarray(x))
    tokens_agree = all(
        bool((np.asarray(o) == r.numpy()).all()) for o, r in zip(ids_ours, ids_ref)
    )
    rec_ours = np.asarray(ours.img_to_recon(params, jnp.asarray(x)))
    if tokens_agree:
        np.testing.assert_allclose(rec_ours, rec_ref, atol=5e-4, rtol=1e-3)
    else:  # still sanity-check scale: both recons in [-1, 1] and correlated
        assert np.corrcoef(rec_ours.ravel(), rec_ref.ravel())[0, 1] > 0.95


def test_train_forward_finite(pair, rng):
    _, ours, params = pair
    import jax

    x = jnp.asarray(_img(rng))

    def loss_fn(p):
        recon, vq_loss, usage = ours.forward_train(p, x)
        return jnp.mean((recon - x) ** 2) + vq_loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)


def test_released_shape_tokenizer_parity(rng):
    """Random-weight round-trip at the EXACT released-tokenizer shape:
    ch=160, z=32, V=4096, 10-scale (1..16) pyramid, 256x256 input
    (reference: models/vqvae.py:30-40, quant.py:184-215). This is the last
    de-risking proxy available without the released .pth — bitwise token-id
    parity through the full-scale conv encoder + quantizer, and decode
    parity through the full-scale decoder. B=1 keeps the CPU oracle ~1 min."""
    from models.vqvae import VQVAE as RefVQVAE  # type: ignore

    full = VQVAEConfig()  # defaults ARE the released shape
    assert (full.ch, full.z_channels, full.vocab_size) == (160, 32, 4096)
    assert full.patch_nums == (1, 2, 3, 4, 5, 6, 8, 10, 13, 16)

    torch.manual_seed(0)
    ref = RefVQVAE(
        vocab_size=full.vocab_size, z_channels=full.z_channels, ch=full.ch,
        v_patch_nums=full.patch_nums, test_mode=True,
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ours = VQVAE(full)
    params = convert_vqvae_state_dict(sd, full)

    x = (rng.random((1, 256, 256, 3)).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        ids_ref = ref.img_to_idxBl(_nchw(x), v_patch_nums=full.patch_nums)
    ids_ours = ours.img_to_ids(params, jnp.asarray(x))
    for si, (r, o) in enumerate(zip(ids_ref, ids_ours)):
        match = (np.asarray(o) == r.numpy()).mean()
        assert match == 1.0, f"scale {si}: only {match:.4f} of tokens match"

    # decoder parity on a synthetic full-res canvas
    f_hat = (rng.standard_normal((1, 16, 16, full.z_channels)) * 0.5).astype(np.float32)
    with torch.no_grad():
        img_ref = ref.fhat_to_img(_nchw(f_hat)).permute(0, 2, 3, 1).numpy()
    img_ours = np.asarray(ours.fhat_to_img(params, jnp.asarray(f_hat)))
    np.testing.assert_allclose(img_ours, img_ref, atol=5e-4, rtol=1e-3)


def test_conv_after_upsample_2x_matches_literal(rng):
    """Phase-conv upsampling must equal conv3x3(nearest_2x(x)) (same math,
    reassociated tap sums — fp32 agreement to float rounding)."""
    import jax

    from controlvar_tpu.models.vae import _conv, conv_after_upsample_2x
    from controlvar_tpu.ops.resize import upsample_nearest_2x

    cin, cout = 24, 16
    p = {
        "kernel": jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(size=(cout,)).astype(np.float32)),
    }
    x = jnp.asarray(rng.normal(size=(2, 7, 5, cin)).astype(np.float32))
    hi = jax.lax.Precision.HIGHEST
    ref = _conv(p, upsample_nearest_2x(x), precision=hi)
    got = conv_after_upsample_2x(p, x, precision=hi)
    assert got.shape == ref.shape == (2, 14, 10, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_group_norm_matmul_matches_textbook(rng):
    """The layout-preserving matmul GroupNorm (bf16 dispatch in
    models/vae.group_norm) must match the textbook two-pass reduction:
    same fp32 statistics up to the one-pass var reassociation (~1e-5),
    at the awkward ch=160 width whose C/G=5 motivates it."""
    from controlvar_tpu.models.vae import group_norm
    from controlvar_tpu.ops.groupnorm import group_norm_matmul

    for C in (160, 320, 640):
        p = {
            "scale": jnp.asarray(rng.normal(size=(C,)).astype(np.float32)),
            "bias": jnp.asarray(rng.normal(size=(C,)).astype(np.float32)),
        }
        x = jnp.asarray((rng.normal(size=(2, 6, 5, C)) * 3 + 1.5)
                        .astype(np.float32))
        ref = group_norm(p, x)  # fp32 input -> textbook path
        got = group_norm_matmul(p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        # bf16 + matmul_ok (the decoder_apply epilogue setting) routes
        # through the matmul form and agrees with the textbook stats at
        # bf16 resolution; without matmul_ok bf16 stays on the textbook
        # path (the train tokenize / grad-accum-exactness requirement)
        got16 = group_norm(p, x.astype(jnp.bfloat16), matmul_ok=True)
        assert got16.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got16, dtype=np.float32),
                                   np.asarray(ref), rtol=0.05, atol=0.05)
        plain16 = group_norm(p, x.astype(jnp.bfloat16))
        tb16 = group_norm(p.copy(), x.astype(jnp.bfloat16), matmul_ok=False)
        np.testing.assert_array_equal(np.asarray(plain16), np.asarray(tb16))


def test_wpacked_decoder_matches_literal(rng):
    """The W-packed final-level decoder (ops/packed_conv; CONTROLVAR_WPACK
    fast path for the sampling epilogue) must match the literal decoder:
    every kernel tap is PLACED (never summed) into the packed 3x2 kernel,
    so fp32 agreement is to float rounding, and the bf16 packed output must
    sit as close to the fp32 truth as the literal bf16 path does."""
    import jax

    from controlvar_tpu.models import vae as vae_mod
    from controlvar_tpu.ops import packed_conv as pc

    # component: packed conv == SAME 3x3 conv, incl. Cin != Cout (conv_out)
    x = jnp.asarray(rng.normal(size=(2, 8, 6, 32)).astype(np.float32))
    for cout in (32, 5):
        p = {
            "kernel": jnp.asarray(
                rng.normal(size=(3, 3, 32, cout)).astype(np.float32)),
            "bias": jnp.asarray(rng.normal(size=(cout,)).astype(np.float32)),
        }
        ref = vae_mod._conv(p, x, precision=jax.lax.Precision.HIGHEST)
        got = pc.wunpack(pc.conv_wpacked(p, pc.wpack(x),
                                         precision=jax.lax.Precision.HIGHEST))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    # packed upsample entry: conv3x3(nearest_2x(x)) without materializing 2W
    pu = {
        "kernel": jnp.asarray(rng.normal(size=(3, 3, 32, 32)).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(size=(32,)).astype(np.float32)),
    }
    from controlvar_tpu.ops.resize import upsample_nearest_2x

    ref = vae_mod._conv(pu, upsample_nearest_2x(x),
                        precision=jax.lax.Precision.HIGHEST)
    got = pc.wunpack(pc.conv_wpacked(pu, pc.upsample_2x_wpacked(x),
                                     precision=jax.lax.Precision.HIGHEST))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # full decoder at a multi-level config with the real ch_mult profile
    cfg = VQVAEConfig(ch=32, ch_mult=(1, 1, 2, 2, 4), num_res_blocks=2,
                      z_channels=16)
    dp = vae_mod.init_decoder_params(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (2, 4, 4, 16), jnp.float32)
    a = vae_mod.decoder_apply(dp, z, cfg, jnp.float32, wpack=False)
    b = vae_mod.decoder_apply(dp, z, cfg, jnp.float32, wpack=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-5, atol=2e-5)
    a16 = np.asarray(vae_mod.decoder_apply(dp, z, cfg, jnp.bfloat16,
                                           wpack=False), dtype=np.float32)
    b16 = np.asarray(vae_mod.decoder_apply(dp, z, cfg, jnp.bfloat16,
                                           wpack=True), dtype=np.float32)
    ref32 = np.asarray(a)
    assert np.abs(b16 - ref32).max() <= np.abs(a16 - ref32).max() * 1.5 + 1e-3
