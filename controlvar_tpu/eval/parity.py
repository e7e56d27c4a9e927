"""Parity tooling: compare this framework's token streams / logits against
the PyTorch reference on the same weights.

The north-star acceptance test (BASELINE.md): tokenize a fixed image with the
released `vae_ch160v4096z32.pth` through BOTH stacks and demand identical id
streams; teacher-forced ControlVAR logits from `d{N}.pth` must match to
float tolerance. The reference stack is imported read-only from
/root/reference as a CPU oracle (never copied).
"""
from __future__ import annotations

import sys
from typing import Dict, List, Optional, Sequence

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _import_reference():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def token_stream_parity(
    vae_ckpt_path: str,
    images_nhwc: np.ndarray,
    patch_nums: Sequence[int] = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16),
) -> Dict:
    """Tokenize images through both stacks; returns per-scale match rates."""
    import torch

    import jax
    import jax.numpy as jnp

    from controlvar_tpu.ckpt.torch_import import (
        convert_vqvae_state_dict,
        load_torch_state_dict,
    )
    from controlvar_tpu.config import VQVAEConfig
    from controlvar_tpu.models.vqvae import VQVAE

    _import_reference()
    from models.vqvae import VQVAE as RefVQVAE  # type: ignore

    cfg = VQVAEConfig(patch_nums=tuple(patch_nums))
    sd = load_torch_state_dict(vae_ckpt_path)
    ours = VQVAE(cfg)
    params = jax.tree_util.tree_map(jnp.asarray, convert_vqvae_state_dict(sd, cfg))

    ref = RefVQVAE(vocab_size=cfg.vocab_size, z_channels=cfg.z_channels,
                   ch=cfg.ch, v_patch_nums=cfg.patch_nums, test_mode=True)
    ref.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                        strict=False)

    x_t = torch.from_numpy(images_nhwc).permute(0, 3, 1, 2).contiguous()
    with torch.no_grad():
        ids_ref = ref.img_to_idxBl(x_t, v_patch_nums=cfg.patch_nums)
    ids_ours = ours.img_to_ids(params, jnp.asarray(images_nhwc))

    per_scale = []
    total = match = 0
    for r, o in zip(ids_ref, ids_ours):
        m = int((r.numpy() == np.asarray(o)).sum())
        n = r.numel()
        per_scale.append(m / n)
        match += m
        total += n
    return {
        "per_scale_match": per_scale,
        "total_match_rate": match / total,
        "bitwise": match == total,
    }


def logits_parity(
    model_ckpt_path: str,
    depth: int,
    labels: np.ndarray,
    cond_type: np.ndarray,
    x_tf: np.ndarray,
    atol: float = 5e-3,
) -> Dict:
    """Teacher-forced ControlVAR logits through both stacks (fp32)."""
    import torch

    import jax
    import jax.numpy as jnp

    from controlvar_tpu.ckpt.torch_import import (
        convert_control_var_state_dict,
        load_torch_state_dict,
    )
    from controlvar_tpu.config import VQVAEConfig, control_var_config_from_depth
    from controlvar_tpu.models.control_var import ControlVARModel

    _import_reference()
    from models.control_var import ControlVAR as RefControlVAR  # type: ignore
    from models.vqvae import VQVAE as RefVQVAE  # type: ignore

    cfg = control_var_config_from_depth(depth, multi_cond=True, cond_drop_rate=0.0)
    sd = load_torch_state_dict(model_ckpt_path)
    ours = ControlVARModel(cfg)
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_control_var_state_dict(sd, cfg)
    )

    ref_vae = RefVQVAE(vocab_size=cfg.vocab_size, z_channels=cfg.cvae,
                       ch=160, v_patch_nums=cfg.patch_nums, test_mode=True)
    ref = RefControlVAR(
        vae_local=ref_vae, depth=depth, embed_dim=cfg.embed_dim,
        num_heads=cfg.num_heads, patch_nums=cfg.patch_nums,
        mask_factor=cfg.mask_factor, multi_cond=True, cond_drop_rate=0.0,
        flash_if_available=False, fused_if_available=False,
    ).eval()
    ref.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                        strict=False)

    with torch.no_grad():
        ref_logits = ref(
            torch.from_numpy(labels), torch.from_numpy(x_tf),
            cond_type=torch.from_numpy(cond_type), mask_first=True,
        ).numpy()
    our_logits = np.asarray(
        ours.forward_train(
            params, jnp.asarray(labels.astype(np.int32)), jnp.asarray(x_tf),
            cond_type=jnp.asarray(cond_type.astype(np.int32)),
            train=False, compute_dtype=jnp.float32, use_flash=False,
        )
    )
    diff = np.abs(our_logits - ref_logits)
    return {
        "max_abs_diff": float(diff.max()),
        "mean_abs_diff": float(diff.mean()),
        "within_tolerance": bool(diff.max() <= atol),
        "argmax_match_rate": float(
            (our_logits.argmax(-1) == ref_logits.argmax(-1)).mean()
        ),
    }
