"""Export controlvar_tpu pytrees to reference-compatible .pth state dicts.

Inverse of ckpt/torch_import.py: a model trained in this framework can be
loaded by the reference PyTorch stack (models/var.py, models/control_var.py,
models/vqvae.py) for side-by-side evaluation, and the round trip
convert(export(params)) == params is tested exactly.

Conventions (mirroring the importer):
  HWIO conv kernel (kH, kW, I, O) -> torch Conv2d (O, I, kH, kW)
  (in, out) linear kernel         -> torch Linear (out, in)
  scale/bias norm                 -> weight/bias
Only parameters are exported; the reference's derived buffers (lvl_1L,
attn_bias_for_masking, zero_k_bias, ...) are rebuilt by its constructors.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from controlvar_tpu.config import ControlVARConfig, VARConfig, VQVAEConfig


def _np(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def _conv(out: Dict, name: str, p: Dict) -> None:
    out[f"{name}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    out[f"{name}.bias"] = _np(p["bias"])


def _norm(out: Dict, name: str, p: Dict) -> None:
    out[f"{name}.weight"] = _np(p["scale"])
    out[f"{name}.bias"] = _np(p["bias"])


def _linear(out: Dict, name: str, p: Dict) -> None:
    out[f"{name}.weight"] = _np(p["kernel"]).T
    out[f"{name}.bias"] = _np(p["bias"])


def _resblock(out: Dict, name: str, p: Dict) -> None:
    _norm(out, f"{name}.norm1", p["norm1"])
    _conv(out, f"{name}.conv1", p["conv1"])
    _norm(out, f"{name}.norm2", p["norm2"])
    _conv(out, f"{name}.conv2", p["conv2"])
    if "nin_shortcut" in p:
        _conv(out, f"{name}.nin_shortcut", p["nin_shortcut"])


def _attnblock(out: Dict, name: str, p: Dict) -> None:
    _norm(out, f"{name}.norm", p["norm"])
    _conv(out, f"{name}.qkv", p["qkv"])
    _conv(out, f"{name}.proj_out", p["proj"])


def _coder(out: Dict, prefix: str, p: Dict, updown: str) -> None:
    _conv(out, f"{prefix}.conv_in", p["conv_in"])
    for i, lvl in enumerate(p[updown]):
        for j, blk in enumerate(lvl["block"]):
            _resblock(out, f"{prefix}.{updown}.{i}.block.{j}", blk)
        for j, att in enumerate(lvl["attn"]):
            _attnblock(out, f"{prefix}.{updown}.{i}.attn.{j}", att)
        if updown == "down" and "downsample" in lvl:
            _conv(out, f"{prefix}.{updown}.{i}.downsample.conv", lvl["downsample"])
        if updown == "up" and "upsample" in lvl:
            _conv(out, f"{prefix}.{updown}.{i}.upsample.conv", lvl["upsample"])
    _resblock(out, f"{prefix}.mid.block_1", p["mid"]["block_1"])
    _attnblock(out, f"{prefix}.mid.attn_1", p["mid"]["attn_1"])
    _resblock(out, f"{prefix}.mid.block_2", p["mid"]["block_2"])
    _norm(out, f"{prefix}.norm_out", p["norm_out"])
    _conv(out, f"{prefix}.conv_out", p["conv_out"])


def export_vqvae_state_dict(params: Dict, cfg: VQVAEConfig,
                            usage: Dict = None) -> Dict[str, np.ndarray]:
    """Our VQVAE pytree -> reference models/vqvae.py names. Phi convs use the
    default PhiPartiallyShared naming (quant_resi.qresi_ls.{i}, the released
    tokenizer's share_quant_resi=4 layout). `quantize.ema_vocab_hit_SV` is
    required by the reference's custom load_state_dict (its scale-count
    shim, models/vqvae.py:106-109): exported from our usage EMA state when
    given, zeros otherwise."""
    out: Dict[str, np.ndarray] = {}
    out["quantize.ema_vocab_hit_SV"] = _np(
        usage["ema_hits"] if usage is not None
        else np.zeros((len(cfg.patch_nums), cfg.vocab_size), np.float32))
    _coder(out, "encoder", params["encoder"], "down")
    _coder(out, "decoder", params["decoder"], "up")
    _conv(out, "quant_conv", params["quant_conv"])
    _conv(out, "post_quant_conv", params["post_quant_conv"])
    out["quantize.embedding.weight"] = _np(params["quantize"]["embedding"])
    for i, phi in enumerate(params["quantize"]["phi"]):
        _conv(out, f"quantize.quant_resi.qresi_ls.{i}", phi)
    return out


def export_mask_vqvae_state_dict(params: Dict, cfg: VQVAEConfig,
                                 usage: Dict = None,
                                 mask_usage: Dict = None) -> Dict[str, np.ndarray]:
    """Dual-codebook MaskVQVAE pytree -> reference models/vqvae_mask.py names:
    the single-codebook layout plus the mask codebook (`mask_quantize.*`) and
    the shared `filter` conv."""
    out = export_vqvae_state_dict(params, cfg, usage=usage)
    _conv(out, "filter", params["filter"])
    mq = params["mask_quantize"]
    out["mask_quantize.embedding.weight"] = _np(mq["embedding"])
    for i, phi in enumerate(mq["phi"]):
        _conv(out, f"mask_quantize.quant_resi.qresi_ls.{i}", phi)
    out["mask_quantize.ema_vocab_hit_SV"] = _np(
        mask_usage["ema_hits"] if mask_usage is not None
        else np.zeros((len(cfg.patch_nums), cfg.vocab_size), np.float32))
    return out


def export_var_state_dict(params: Dict, cfg: VARConfig) -> Dict[str, np.ndarray]:
    """Our VAR pytree -> reference models/var.py names (parameters only)."""
    out: Dict[str, np.ndarray] = {}
    _linear(out, "word_embed", params["word_embed"])
    out["class_emb.weight"] = _np(params["class_emb"])
    out["pos_start"] = _np(params["pos_start"])
    out["pos_1LC"] = _np(params["pos_1LC"])
    out["lvl_embed.weight"] = _np(params["lvl_embed"])
    b = params["blocks"]
    for i in range(cfg.depth):
        out[f"blocks.{i}.attn.mat_qkv.weight"] = _np(b["qkv_kernel"][i]).T
        out[f"blocks.{i}.attn.q_bias"] = _np(b["q_bias"][i])
        out[f"blocks.{i}.attn.v_bias"] = _np(b["v_bias"][i])
        out[f"blocks.{i}.attn.proj.weight"] = _np(b["proj"]["kernel"][i]).T
        out[f"blocks.{i}.attn.proj.bias"] = _np(b["proj"]["bias"][i])
        out[f"blocks.{i}.ffn.fc1.weight"] = _np(b["fc1"]["kernel"][i]).T
        out[f"blocks.{i}.ffn.fc1.bias"] = _np(b["fc1"]["bias"][i])
        out[f"blocks.{i}.ffn.fc2.weight"] = _np(b["fc2"]["kernel"][i]).T
        out[f"blocks.{i}.ffn.fc2.bias"] = _np(b["fc2"]["bias"][i])
        if cfg.shared_aln:
            out[f"blocks.{i}.ada_gss"] = _np(b["ada_gss"][i])
        else:
            out[f"blocks.{i}.ada_lin.1.weight"] = _np(b["ada_lin"]["kernel"][i]).T
            out[f"blocks.{i}.ada_lin.1.bias"] = _np(b["ada_lin"]["bias"][i])
        if cfg.cos_attn:
            out[f"blocks.{i}.attn.scale_mul_1H11"] = (
                _np(b["scale_mul"][i]).reshape(1, -1, 1, 1)
            )
    _linear(out, "head_nm.ada_lin.1", params["head_nm"]["ada_lin"])
    _linear(out, "head", params["head"])
    if cfg.shared_aln:
        _linear(out, "shared_ada_lin.1", params["shared_ada_lin"])
    return out


def export_control_var_state_dict(
    params: Dict, cfg: ControlVARConfig
) -> Dict[str, np.ndarray]:
    """Our ControlVAR pytree -> reference models/control_var.py names."""
    out = export_var_state_dict(params, cfg)
    if "cond_embed" in params:
        out["cond_embed.weight"] = _np(params["cond_embed"])
    if "type_embed" in params:
        out["type_embed.weight"] = _np(params["type_embed"])
    if "special_embed" in params:
        out["special_embed.weight"] = _np(params["special_embed"])
    return out


def save_torch_checkpoint(path: str, state_dict: Dict[str, np.ndarray],
                          step: int = 0, epoch: int = 0) -> None:
    """Write a reference-trainer-shaped checkpoint
    ({model_state_dict, epoch, step}; reference:
    train_control_var_hpu.py:420-428). Host-side CPU torch only."""
    import torch

    torch.save(
        {
            "model_state_dict": {
                k: torch.from_numpy(np.array(v, dtype=np.float32))
                for k, v in state_dict.items()
            },
            "epoch": epoch,
            "step": step,
        },
        path,
    )
