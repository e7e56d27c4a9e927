"""LoRA fine-tuning over param pytrees.

The reference wraps attn.proj / ffn.fc* / ada_lin.1 / head_nm.ada_lin.1 with
peft LoRA adapters (r=16, alpha=32, reference: train_control_var_hpu.py:449-470).
Here LoRA is a separate pytree of (A, B) factors per targeted kernel,
merged on the fly: effective_kernel = base + (alpha/r) * A @ B. Training
differentiates only the LoRA tree (the base is stop-gradiented), which is
the pure-functional equivalent of freezing.

Stacked block kernels (leading depth axis) get per-layer factors
A (D, in, r), B (D, r, out) — one einsum merges all layers at once.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict

# pytree paths of targeted kernels (reference target_modules, :453-457)
DEFAULT_TARGETS = (
    ("blocks", "proj", "kernel"),
    ("blocks", "fc1", "kernel"),
    ("blocks", "fc2", "kernel"),
    ("blocks", "ada_lin", "kernel"),
    ("head_nm", "ada_lin", "kernel"),
)


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 16
    alpha: float = 32.0
    targets: Tuple[Tuple[str, ...], ...] = DEFAULT_TARGETS

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def _get(tree, path):
    for p in path:
        if p not in tree:
            return None
        tree = tree[p]
    return tree


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def init_lora_params(key: jax.Array, params: Params, cfg: LoRAConfig) -> Params:
    """A ~ kaiming-uniform, B = 0 (standard LoRA init)."""
    lora: Params = {}
    for path in cfg.targets:
        kernel = _get(params, path)
        if kernel is None:
            continue
        *lead, fan_in, fan_out = kernel.shape
        key, ka = jax.random.split(key)
        bound = float(np.sqrt(6.0 / fan_in))
        A = jax.random.uniform(ka, (*lead, fan_in, cfg.rank), jnp.float32, -bound, bound)
        B = jnp.zeros((*lead, cfg.rank, fan_out), jnp.float32)
        lora["/".join(path)] = {"A": A, "B": B}
    return lora


def apply_lora(params: Params, lora: Params, cfg: LoRAConfig,
               freeze_base: bool = True) -> Params:
    """Return a params tree with LoRA deltas merged into targeted kernels."""
    import copy

    out = copy.deepcopy(jax.tree_util.tree_map(lambda x: x, params))  # shallow per-leaf
    if freeze_base:
        out = jax.tree_util.tree_map(jax.lax.stop_gradient, out)
    for key_str, ab in lora.items():
        path = tuple(key_str.split("/"))
        kernel = _get(out, path)
        delta = cfg.scale * jnp.einsum("...ir,...ro->...io", ab["A"], ab["B"])
        _set(out, path, kernel + delta.astype(kernel.dtype))
    return out


def merge_lora(params: Params, lora: Params, cfg: LoRAConfig) -> Params:
    """Bake LoRA into the base weights (for export/inference)."""
    return apply_lora(params, lora, cfg, freeze_base=False)
