"""End-to-end training-loss parity vs the reference stack.

Rebuilds the reference train_epoch computation (reference:
train_control_var_hpu.py:157-239) on CPU torch with a small model: tokenize
image+control through the reference VQVAE, interleave per scale, teacher-
forced ControlVAR forward, CE with ignore-mask weighting — and demands our
fused loss_fn reproduce the same loss value on the converted weights.
"""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from controlvar_tpu.config import ControlVARConfig, OptimConfig, VQVAEConfig
from controlvar_tpu.ckpt.torch_import import (
    convert_control_var_state_dict,
    convert_vqvae_state_dict,
)
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.train.train_step import ControlVARTrainStep

sys.path.insert(0, "/root/reference")

VQ_CFG = VQVAEConfig(ch=32, patch_nums=(1, 2, 3), vocab_size=64)
CFG = ControlVARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
    vocab_size=64, cvae=32, num_classes=10, mask_factor=2, multi_cond=True,
    cond_drop_rate=0.0, drop_path_rate=0.0,
)
IMG = 48  # 48/16 = 3 = last patch num


def test_train_loss_parity(rng):
    from models.control_var import ControlVAR as RefControlVAR  # type: ignore
    from models.vqvae import VQVAE as RefVQVAE  # type: ignore

    torch.manual_seed(0)
    ref_vae = RefVQVAE(vocab_size=VQ_CFG.vocab_size, z_channels=VQ_CFG.z_channels,
                       ch=VQ_CFG.ch, v_patch_nums=VQ_CFG.patch_nums, test_mode=True)
    torch.manual_seed(1)
    ref_var = RefControlVAR(
        vae_local=ref_vae, num_classes=CFG.num_classes, depth=CFG.depth,
        embed_dim=CFG.embed_dim, num_heads=CFG.num_heads,
        patch_nums=CFG.patch_nums, cond_drop_rate=0.0, mask_factor=2,
        multi_cond=True, flash_if_available=False, fused_if_available=False,
    ).eval()

    B = 2
    images = rng.random((B, IMG, IMG, 3)).astype(np.float32) * 2 - 1
    masks = rng.random((B, IMG, IMG, 3)).astype(np.float32) * 2 - 1
    masks[:, 10:30, 5:40] = -1.0  # black region -> ignore weighting active
    cls = np.array([3, 7], np.int64)
    ctype = np.array([0, 2], np.int64)

    def nchw(x):
        return torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()

    # ---- reference loss (train_control_var_hpu.py:157-239 semantics) ----
    with torch.no_grad():
        m_ids = ref_vae.img_to_idxBl(nchw(masks), v_patch_nums=VQ_CFG.patch_nums)
        m_h = ref_vae.idxBl_to_h(m_ids)
        i_ids = ref_vae.img_to_idxBl(nchw(images), v_patch_nums=VQ_CFG.patch_nums)
        i_h = ref_vae.idxBl_to_h(i_ids)
        from itertools import chain

        labels_list = list(chain.from_iterable(zip(m_ids, i_ids)))
        input_h_list = list(chain.from_iterable(zip(m_h, i_h)))
        x_tf_ref = torch.cat(input_h_list, dim=1)
        logits_ref = ref_var(
            torch.from_numpy(cls), x_tf_ref,
            cond_type=torch.from_numpy(ctype), mask_first=True,
        )
        labels_ref = torch.cat(labels_list, dim=1)
        ce = torch.nn.CrossEntropyLoss(reduction="none")(
            logits_ref.view(-1, logits_ref.size(-1)), labels_ref.view(-1)
        )
        # ignore mask: ones here except the black-region scales (>=5 of 10)
        # — with only 3 scales all weights are 1, so use plain mean + a
        # synthetic weighting variant below
        ref_loss_plain = ce.mean().item()
        w = torch.rand(ce.shape, generator=torch.Generator().manual_seed(9))
        ref_loss_weighted = ((ce * w).mean() / (w.mean() + 1e-6)).item()

    # ---- our loss on converted weights ----
    vq_sd = {k: v.detach().numpy() for k, v in ref_vae.state_dict().items()}
    var_sd = {k: v.detach().numpy() for k, v in ref_var.state_dict().items()}
    vqvae = VQVAE(VQ_CFG)
    vq_params = jax.tree_util.tree_map(jnp.asarray, convert_vqvae_state_dict(vq_sd, VQ_CFG))
    model = ControlVARModel(CFG)
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_control_var_state_dict(var_sd, CFG)
    )
    stepper = ControlVARTrainStep(model, vqvae, OptimConfig(), 100, 10)
    object.__setattr__(stepper, "tokenize_dtype", jnp.float32)

    batch = {
        "image": jnp.asarray(images),
        "mask": jnp.asarray(masks),
        "cls": jnp.asarray(cls.astype(np.int32)),
        "type": jnp.asarray(ctype.astype(np.int32)),
    }
    loss_plain, _ = stepper.loss_fn(params, vq_params, batch, key=None)
    np.testing.assert_allclose(float(loss_plain), ref_loss_plain, rtol=2e-3)

    batch["ignore_mask"] = jnp.asarray(
        w.numpy().reshape(B, -1).astype(np.float32)
    )
    loss_weighted, _ = stepper.loss_fn(params, vq_params, batch, key=None)
    np.testing.assert_allclose(float(loss_weighted), ref_loss_weighted, rtol=2e-3)
