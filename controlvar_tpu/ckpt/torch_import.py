"""Import released PyTorch checkpoints (.pth) into controlvar_tpu pytrees.

Covers: the VAR tokenizer `vae_ch160v4096z32.pth`, plain VAR `var_d{N}.pth`,
and ControlVAR `d{N}.pth` joint checkpoints (reference: README.md:19-24,125-132).

Conventions:
  torch Conv2d weight (O, I, kH, kW)  -> HWIO (kH, kW, I, O)
  torch Linear weight (out, in)       -> (in, out)  [we store y = x @ W + b]
  torch norm weight/bias              -> scale/bias
State dicts are plain numpy maps; torch is only needed to deserialize .pth.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from controlvar_tpu.config import ControlVARConfig, VARConfig, VQVAEConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Deserialize a .pth into {name: np.ndarray} (host-side, CPU torch)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:  # trainer checkpoint
        obj = obj["model_state_dict"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        k = k.removeprefix("module.")  # DDP prefix
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _conv(sd, name):
    return {
        "kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0).astype(np.float32),
        "bias": sd[f"{name}.bias"].astype(np.float32),
    }


def _norm(sd, name):
    return {
        "scale": sd[f"{name}.weight"].astype(np.float32),
        "bias": sd[f"{name}.bias"].astype(np.float32),
    }


def _linear(sd, name):
    return {
        "kernel": sd[f"{name}.weight"].T.astype(np.float32),
        "bias": sd[f"{name}.bias"].astype(np.float32),
    }


def _resblock(sd, name):
    p = {
        "norm1": _norm(sd, f"{name}.norm1"),
        "conv1": _conv(sd, f"{name}.conv1"),
        "norm2": _norm(sd, f"{name}.norm2"),
        "conv2": _conv(sd, f"{name}.conv2"),
    }
    if f"{name}.nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _conv(sd, f"{name}.nin_shortcut")
    return p


def _attnblock(sd, name):
    return {
        "norm": _norm(sd, f"{name}.norm"),
        "qkv": _conv(sd, f"{name}.qkv"),
        "proj": _conv(sd, f"{name}.proj_out"),
    }


def _encoder(sd, cfg: VQVAEConfig, prefix="encoder"):
    n_lvl = len(cfg.ch_mult)
    p = {"conv_in": _conv(sd, f"{prefix}.conv_in")}
    down = []
    for i in range(n_lvl):
        blocks = [
            _resblock(sd, f"{prefix}.down.{i}.block.{j}")
            for j in range(cfg.num_res_blocks)
        ]
        attns = []
        j = 0
        while f"{prefix}.down.{i}.attn.{j}.norm.weight" in sd:
            attns.append(_attnblock(sd, f"{prefix}.down.{i}.attn.{j}"))
            j += 1
        lvl = {"block": blocks, "attn": attns}
        if f"{prefix}.down.{i}.downsample.conv.weight" in sd:
            lvl["downsample"] = _conv(sd, f"{prefix}.down.{i}.downsample.conv")
        down.append(lvl)
    p["down"] = down
    p["mid"] = {
        "block_1": _resblock(sd, f"{prefix}.mid.block_1"),
        "attn_1": _attnblock(sd, f"{prefix}.mid.attn_1"),
        "block_2": _resblock(sd, f"{prefix}.mid.block_2"),
    }
    p["norm_out"] = _norm(sd, f"{prefix}.norm_out")
    p["conv_out"] = _conv(sd, f"{prefix}.conv_out")
    return p


def _decoder(sd, cfg: VQVAEConfig, prefix="decoder"):
    n_lvl = len(cfg.ch_mult)
    p = {"conv_in": _conv(sd, f"{prefix}.conv_in")}
    p["mid"] = {
        "block_1": _resblock(sd, f"{prefix}.mid.block_1"),
        "attn_1": _attnblock(sd, f"{prefix}.mid.attn_1"),
        "block_2": _resblock(sd, f"{prefix}.mid.block_2"),
    }
    up = []
    for i in range(n_lvl):
        blocks = [
            _resblock(sd, f"{prefix}.up.{i}.block.{j}")
            for j in range(cfg.num_res_blocks + 1)
        ]
        attns = []
        j = 0
        while f"{prefix}.up.{i}.attn.{j}.norm.weight" in sd:
            attns.append(_attnblock(sd, f"{prefix}.up.{i}.attn.{j}"))
            j += 1
        lvl = {"block": blocks, "attn": attns}
        if f"{prefix}.up.{i}.upsample.conv.weight" in sd:
            lvl["upsample"] = _conv(sd, f"{prefix}.up.{i}.upsample.conv")
        up.append(lvl)
    p["up"] = up
    p["norm_out"] = _norm(sd, f"{prefix}.norm_out")
    p["conv_out"] = _conv(sd, f"{prefix}.conv_out")
    return p


def convert_vqvae_state_dict(sd: Dict[str, np.ndarray], cfg: VQVAEConfig) -> Dict:
    """Map the reference VQVAE state dict (reference: models/vqvae.py) to our pytree."""
    phi = []
    i = 0
    while f"quantize.quant_resi.qresi_ls.{i}.weight" in sd:
        phi.append(_conv(sd, f"quantize.quant_resi.qresi_ls.{i}"))
        i += 1
    if not phi:  # non-shared variant stores phis directly on the ModuleList
        while f"quantize.quant_resi.{i}.weight" in sd:
            phi.append(_conv(sd, f"quantize.quant_resi.{i}"))
            i += 1
    return {
        "encoder": _encoder(sd, cfg),
        "decoder": _decoder(sd, cfg),
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "quantize": {
            "embedding": sd["quantize.embedding.weight"].astype(np.float32),
            "phi": phi,
        },
    }


# ----------------------------------------------------------------------------
# transformer checkpoints
# ----------------------------------------------------------------------------

def _stack(sd, fmt: str, depth: int, transform=None) -> np.ndarray:
    arrs = [sd[fmt.format(i)] for i in range(depth)]
    if transform is not None:
        arrs = [transform(a) for a in arrs]
    return np.stack(arrs, axis=0).astype(np.float32)


def _blocks(sd, cfg: VARConfig) -> Dict:
    """Stack per-layer block weights along a leading depth axis (for lax.scan)."""
    d = cfg.depth
    p = {
        # fused qkv: torch (3C, C) -> (C, 3C)
        "qkv_kernel": _stack(sd, "blocks.{}.attn.mat_qkv.weight", d, lambda a: a.T),
        "q_bias": _stack(sd, "blocks.{}.attn.q_bias", d),
        "v_bias": _stack(sd, "blocks.{}.attn.v_bias", d),
        "proj": {
            "kernel": _stack(sd, "blocks.{}.attn.proj.weight", d, lambda a: a.T),
            "bias": _stack(sd, "blocks.{}.attn.proj.bias", d),
        },
        "fc1": {
            "kernel": _stack(sd, "blocks.{}.ffn.fc1.weight", d, lambda a: a.T),
            "bias": _stack(sd, "blocks.{}.ffn.fc1.bias", d),
        },
        "fc2": {
            "kernel": _stack(sd, "blocks.{}.ffn.fc2.weight", d, lambda a: a.T),
            "bias": _stack(sd, "blocks.{}.ffn.fc2.bias", d),
        },
    }
    if cfg.shared_aln:
        p["ada_gss"] = _stack(sd, "blocks.{}.ada_gss", d)
    else:
        p["ada_lin"] = {
            "kernel": _stack(sd, "blocks.{}.ada_lin.1.weight", d, lambda a: a.T),
            "bias": _stack(sd, "blocks.{}.ada_lin.1.bias", d),
        }
    if cfg.cos_attn:
        p["scale_mul"] = _stack(sd, "blocks.{}.attn.scale_mul_1H11", d,
                                lambda a: a.reshape(-1))
    return p


def convert_var_state_dict(sd: Dict[str, np.ndarray], cfg: VARConfig) -> Dict:
    """Map a plain VAR checkpoint (reference: models/var.py) to our pytree."""
    p = {
        "word_embed": _linear(sd, "word_embed"),
        "class_emb": sd["class_emb.weight"].astype(np.float32),
        "pos_start": sd["pos_start"].astype(np.float32),
        "pos_1LC": sd["pos_1LC"].astype(np.float32),
        "lvl_embed": sd["lvl_embed.weight"].astype(np.float32),
        "blocks": _blocks(sd, cfg),
        "head_nm": {
            "ada_lin": _linear(sd, "head_nm.ada_lin.1"),
        },
        "head": _linear(sd, "head"),
    }
    if cfg.shared_aln:
        p["shared_ada_lin"] = _linear(sd, "shared_ada_lin.1")
    return p


def convert_control_var_state_dict(sd: Dict[str, np.ndarray], cfg: ControlVARConfig) -> Dict:
    """Map a ControlVAR checkpoint (reference: models/control_var.py) to our pytree."""
    p = convert_var_state_dict(sd, cfg)
    if cfg.multi_cond and "cond_embed.weight" in sd:
        p["cond_embed"] = sd["cond_embed.weight"].astype(np.float32)
    if cfg.type_pos and "type_embed.weight" in sd:
        p["type_embed"] = sd["type_embed.weight"].astype(np.float32)
    if cfg.separator and "special_embed.weight" in sd:
        p["special_embed"] = sd["special_embed.weight"].astype(np.float32)
    return p
