"""Multi-scale residual-VQ parity vs the reference VectorQuantizer2
(reference: models/quant.py). The reference module is imported as a CPU
torch oracle; weights are copied into our pytree, outputs compared."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from controlvar_tpu.config import VQVAEConfig
from controlvar_tpu.models.quantizer import MultiScaleQuantizer, phi_index_table

from tests.reference_oracle import import_reference_quant, torch_conv_to_hwio

CFG = VQVAEConfig()


@pytest.fixture(scope="module")
def pair():
    """(reference torch quantizer, our quantizer, our params) with identical weights."""
    ref_quant = import_reference_quant()
    torch.manual_seed(0)
    ref = ref_quant.VectorQuantizer2(
        vocab_size=CFG.vocab_size,
        Cvae=CFG.z_channels,
        using_znorm=CFG.using_znorm,
        beta=CFG.beta,
        v_patch_nums=CFG.patch_nums,
        quant_resi=CFG.quant_resi,
        share_quant_resi=CFG.share_quant_resi,
    ).eval()
    ours = MultiScaleQuantizer(CFG)
    params = {
        "embedding": jnp.asarray(ref.embedding.weight.detach().numpy()),
        "phi": [
            {
                "kernel": jnp.asarray(torch_conv_to_hwio(phi.weight)),
                "bias": jnp.asarray(phi.bias.detach().numpy()),
            }
            for phi in ref.quant_resi.qresi_ls
        ],
    }
    return ref, ours, params


def _rand_f(rng, b=2):
    return rng.standard_normal((b, 16, 16, CFG.z_channels)).astype(np.float32)


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def test_phi_table_matches_reference_ticks(pair):
    ref, _, _ = pair
    SN = CFG.num_scales
    table = phi_index_table(SN, CFG.share_quant_resi)
    for si in range(SN):
        ref_phi = ref.quant_resi[si / (SN - 1)]
        assert ref.quant_resi.qresi_ls[table[si]] is ref_phi, f"scale {si}"


def test_encode_ids_bitwise_parity(pair, rng):
    ref, ours, params = pair
    f = _rand_f(rng)
    with torch.no_grad():
        ref_ids = ref.f_to_idxBl_or_fhat(_nchw(f), to_fhat=False, v_patch_nums=CFG.patch_nums)
    our_ids = jax.jit(lambda p, x: ours.encode_ids(p, x))(params, jnp.asarray(f))
    assert len(ref_ids) == len(our_ids) == CFG.num_scales
    for si, (r, o) in enumerate(zip(ref_ids, our_ids)):
        np.testing.assert_array_equal(
            np.asarray(o), r.numpy(), err_msg=f"token mismatch at scale {si}"
        )


def test_encode_fhat_parity(pair, rng):
    ref, ours, params = pair
    f = _rand_f(rng, b=1)
    with torch.no_grad():
        ref_fh = ref.f_to_idxBl_or_fhat(_nchw(f), to_fhat=True, v_patch_nums=CFG.patch_nums)
    our_fh = ours.encode_fhat(params, jnp.asarray(f))
    for si, (r, o) in enumerate(zip(ref_fh, our_fh)):
        np.testing.assert_allclose(
            np.asarray(o),
            r.permute(0, 2, 3, 1).numpy(),
            atol=2e-4,
            rtol=1e-4,
            err_msg=f"f_hat mismatch at scale {si}",
        )


def test_teacher_forcing_input_parity(pair, rng):
    ref, ours, params = pair
    f = _rand_f(rng)
    with torch.no_grad():
        ref_ids = ref.f_to_idxBl_or_fhat(_nchw(f), to_fhat=False, v_patch_nums=CFG.patch_nums)
        ref_tf = ref.idxBl_to_var_input(ref_ids)
    ids = [jnp.asarray(r.numpy()) for r in ref_ids]
    our_tf = ours.ids_to_var_input(params, ids)
    assert len(ref_tf) == len(our_tf) == CFG.num_scales - 1
    for si, (r, o) in enumerate(zip(ref_tf, our_tf)):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy(), atol=2e-4, rtol=1e-4, err_msg=f"scale {si}"
        )


def test_next_ar_input_parity(pair, rng):
    ref, ours, params = pair
    B, SN = 2, CFG.num_scales
    f_hat_t = torch.zeros(B, CFG.z_channels, 16, 16)
    f_hat_j = jnp.zeros((B, 16, 16, CFG.z_channels))
    for si, pn in enumerate(CFG.patch_nums):
        h = rng.standard_normal((B, pn, pn, CFG.z_channels)).astype(np.float32)
        with torch.no_grad():
            f_hat_t, next_t = ref.get_next_autoregressive_input(
                si, SN, f_hat_t, _nchw(h)
            )
        f_hat_j, next_j = ours.next_ar_input(params, si, f_hat_j, jnp.asarray(h))
        np.testing.assert_allclose(
            np.asarray(f_hat_j), f_hat_t.permute(0, 2, 3, 1).numpy(), atol=3e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(next_j), next_t.permute(0, 2, 3, 1).numpy(), atol=3e-4, rtol=1e-4
        )


def test_embed_to_fhat_matches_encode(pair, rng):
    _, ours, params = pair
    f = _rand_f(rng, b=1)
    ids = ours.encode_ids(params, jnp.asarray(f))
    fhat_direct = ours.encode_fhat(params, jnp.asarray(f))[-1]
    fhat_decoded = ours.ids_to_fhat(params, ids)
    np.testing.assert_allclose(
        np.asarray(fhat_decoded), np.asarray(fhat_direct), atol=1e-5, rtol=1e-5
    )


def test_znorm_codebook_parity(rng):
    """Cosine-similarity (znorm) codebook search vs the reference
    (reference: models/quant.py:200-202)."""
    import dataclasses

    ref_quant = import_reference_quant()
    torch.manual_seed(3)
    cfg = dataclasses.replace(CFG, using_znorm=True)
    ref = ref_quant.VectorQuantizer2(
        vocab_size=cfg.vocab_size, Cvae=cfg.z_channels, using_znorm=True,
        beta=cfg.beta, v_patch_nums=cfg.patch_nums,
        quant_resi=cfg.quant_resi, share_quant_resi=cfg.share_quant_resi,
    ).eval()
    ours = MultiScaleQuantizer(cfg)
    params = {
        "embedding": jnp.asarray(ref.embedding.weight.detach().numpy()),
        "phi": [
            {"kernel": jnp.asarray(torch_conv_to_hwio(p.weight)),
             "bias": jnp.asarray(p.bias.detach().numpy())}
            for p in ref.quant_resi.qresi_ls
        ],
    }
    f = rng.standard_normal((1, 16, 16, cfg.z_channels)).astype(np.float32)
    with torch.no_grad():
        ids_ref = ref.f_to_idxBl_or_fhat(_nchw(f), to_fhat=False,
                                         v_patch_nums=cfg.patch_nums)
    ids_ours = ours.encode_ids(params, jnp.asarray(f))
    total = match = 0
    for r, o in zip(ids_ref, ids_ours):
        match += int((r.numpy() == np.asarray(o)).sum())
        total += r.numel()
    assert match / total > 0.999, f"znorm token match {match}/{total}"


def test_quantize_train_straight_through(pair, rng):
    _, ours, params = pair
    f = jnp.asarray(_rand_f(rng, b=1))

    def loss_fn(f_in):
        f_hat, vq_loss, _ = ours.quantize_train(params, f_in)
        return jnp.sum(f_hat) + vq_loss

    g = jax.grad(loss_fn)(f)
    assert bool(jnp.all(jnp.isfinite(g)))
    # straight-through: d(sum f_hat)/df == 1 plus commitment-term grads
    assert float(jnp.abs(g).mean()) > 0.5
