"""Checkpointing tests: .pth round-trip through the importer, VAR->ControlVAR
surgery shape/content contracts, Orbax save/resume, LoRA fine-tune path."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlvar_tpu.config import (
    ControlVARConfig,
    OptimConfig,
    VARConfig,
    VQVAEConfig,
)
from controlvar_tpu.ckpt.lora import LoRAConfig, apply_lora, init_lora_params, merge_lora
from controlvar_tpu.ckpt.orbax_io import CheckpointIO
from controlvar_tpu.ckpt.surgery import expand_pos_1LC, var_to_control_var
from controlvar_tpu.ckpt.torch_import import load_torch_state_dict, convert_var_state_dict
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.var import VARModel

VAR_CFG = VARConfig(depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
                    vocab_size=64, cvae=8, num_classes=10)
CV_CFG = ControlVARConfig(depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
                          vocab_size=64, cvae=8, num_classes=10,
                          mask_factor=2, multi_cond=True)


def test_pth_roundtrip(tmp_path):
    """Save a trainer-style torch checkpoint, re-import through the loader."""
    import torch

    sd = {
        "module.word_embed.weight": torch.randn(128, 8),
        "module.word_embed.bias": torch.randn(128),
    }
    path = str(tmp_path / "ckpt.pth")
    torch.save({"model_state_dict": sd, "epoch": 3}, path)
    out = load_torch_state_dict(path)
    assert "word_embed.weight" in out  # DDP prefix stripped
    assert out["word_embed.weight"].shape == (128, 8)


def test_surgery_concat_mode():
    var = VARModel(VAR_CFG)
    vp = var.init_params(jax.random.key(0))
    cv = ControlVARModel(CV_CFG)
    fresh = cv.init_params(jax.random.key(1))
    merged = var_to_control_var(vp, fresh, CV_CFG, mode="concat")
    L_var = VAR_CFG.seq_len
    assert merged["pos_1LC"].shape == (1, CV_CFG.seq_len, 128)
    # default path: [pos; pos] whole-sequence concat
    np.testing.assert_array_equal(
        np.asarray(merged["pos_1LC"][:, :L_var]), np.asarray(vp["pos_1LC"])
    )
    np.testing.assert_array_equal(
        np.asarray(merged["pos_1LC"][:, L_var:]), np.asarray(vp["pos_1LC"])
    )
    # blocks/class/head transfer; pos_start stays fresh
    np.testing.assert_array_equal(
        np.asarray(merged["blocks"]["qkv_kernel"]), np.asarray(vp["blocks"]["qkv_kernel"])
    )
    np.testing.assert_array_equal(
        np.asarray(merged["pos_start"]), np.asarray(fresh["pos_start"])
    )
    # merged model must run
    logits = cv.forward_train(
        merged, jnp.asarray([1], jnp.int32),
        jnp.zeros((1, CV_CFG.seq_len - CV_CFG.first_l, 8)),
        cond_type=jnp.asarray([0], jnp.int32), train=False,
        compute_dtype=jnp.float32, use_flash=False,
    )
    assert logits.shape == (1, CV_CFG.seq_len, CV_CFG.head_vocab)


def test_surgery_interpos_mode():
    var = VARModel(VAR_CFG)
    vp = var.init_params(jax.random.key(0))
    out = expand_pos_1LC(vp["pos_1LC"], CV_CFG, mode="interpos")
    # scale 1 (pn=2, l=4): rows [1:5] and [5:9] both equal VAR rows [1:5]
    src = np.asarray(vp["pos_1LC"][0])
    o = np.asarray(out[0])
    np.testing.assert_array_equal(o[0:1], src[0:1])
    np.testing.assert_array_equal(o[1:2], src[0:1])
    np.testing.assert_array_equal(o[2:6], src[1:5])
    np.testing.assert_array_equal(o[6:10], src[1:5])


def test_surgery_separator_head_padding():
    import dataclasses

    cfg = dataclasses.replace(CV_CFG, separator=True)
    var = VARModel(VAR_CFG)
    vp = var.init_params(jax.random.key(0))
    cv = ControlVARModel(cfg)
    fresh = cv.init_params(jax.random.key(1))
    merged = var_to_control_var(vp, fresh, cfg, mode="interpos")
    assert merged["head"]["kernel"].shape == (128, cfg.head_vocab)
    np.testing.assert_array_equal(
        np.asarray(merged["head"]["kernel"][:, :64]), np.asarray(vp["head"]["kernel"])
    )
    assert float(np.abs(np.asarray(merged["head"]["bias"][64:])).max()) == 0.0


def test_orbax_save_restore(tmp_path):
    from controlvar_tpu.train.train_step import init_train_state

    model = ControlVARModel(CV_CFG)
    params = model.init_params(jax.random.key(0))
    state, _ = init_train_state(params, OptimConfig())
    io = CheckpointIO(str(tmp_path / "ckpts"))
    io.save(5, state, metadata={"epoch": 2})
    io.wait()
    assert io.latest_step() == 5
    restored, meta = io.restore(state)
    assert meta["epoch"] == 2
    np.testing.assert_array_equal(
        np.asarray(restored.params["pos_1LC"]), np.asarray(state.params["pos_1LC"])
    )
    assert int(restored.step) == int(state.step)


def test_lora_finetune_path():
    model = ControlVARModel(CV_CFG)
    params = model.init_params(jax.random.key(0))
    lcfg = LoRAConfig(rank=4)
    lora = init_lora_params(jax.random.key(1), params, lcfg)
    assert set(lora) == {
        "blocks/proj/kernel", "blocks/fc1/kernel", "blocks/fc2/kernel",
        "blocks/ada_lin/kernel", "head_nm/ada_lin/kernel",
    }
    x_tf = jnp.zeros((1, CV_CFG.seq_len - CV_CFG.first_l, 8))
    labels = jnp.asarray([1], jnp.int32)
    ct = jnp.asarray([0], jnp.int32)

    def loss(lora_tree):
        p = apply_lora(params, lora_tree, lcfg)
        logits = model.forward_train(p, labels, x_tf, cond_type=ct, train=False,
                                     compute_dtype=jnp.float32, use_flash=False)
        return jnp.mean(logits ** 2)

    # B=0 init: apply_lora is identity on outputs
    base_logits = model.forward_train(params, labels, x_tf, cond_type=ct,
                                      train=False, compute_dtype=jnp.float32,
                                      use_flash=False)
    lora_logits = model.forward_train(apply_lora(params, lora, lcfg), labels, x_tf,
                                      cond_type=ct, train=False,
                                      compute_dtype=jnp.float32, use_flash=False)
    np.testing.assert_allclose(np.asarray(lora_logits), np.asarray(base_logits),
                               atol=1e-5)
    g = jax.grad(loss)(lora)
    # gradient flows into B (A-path is alive through B even at B=0)
    gB = g["blocks/proj/kernel"]["B"]
    assert float(jnp.abs(gB).max()) > 0.0
    merged = merge_lora(params, jax.tree_util.tree_map(lambda x: x + 0.01, lora), lcfg)
    assert float(jnp.abs(merged["blocks"]["proj"]["kernel"]
                         - params["blocks"]["proj"]["kernel"]).max()) > 0.0
