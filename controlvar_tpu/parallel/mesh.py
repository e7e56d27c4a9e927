"""Device mesh + sharding rules (SPMD over ICI, no process groups).

Replaces the reference's torch DDP / HCCL / NCCL plumbing (reference:
dist.py, train_control_var_hpu.py:411-418,604) with jax.sharding: a 2-D
logical mesh ('data', 'model'); gradients are reduced by the collectives XLA
inserts from sharding constraints — there is no explicit all_reduce anywhere.

Tensor-parallel layout (Megatron-style, used for d30-scale configs):
  qkv/fc1 kernels       column-parallel (shard output features)
  proj/fc2 kernels      row-parallel    (shard input features)
  head kernel           column-parallel (shard vocab)
  embeddings, norms     replicated
Activations: batch axis sharded on 'data'.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data is None:
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} needs {data*model} devices, have {n}"
    arr = np.asarray(devs[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


# ---------------------------------------------------------------------------
# parameter shardings
# ---------------------------------------------------------------------------

_BLOCK_RULES = {
    # leading axis is the depth stack; feature axes follow
    "qkv_kernel": P(None, None, "model"),
    "q_bias": P(None, "model"),
    "v_bias": P(None, "model"),
    ("proj", "kernel"): P(None, "model", None),
    ("proj", "bias"): P(None, None),
    ("fc1", "kernel"): P(None, None, "model"),
    ("fc1", "bias"): P(None, "model"),
    ("fc2", "kernel"): P(None, "model", None),
    ("fc2", "bias"): P(None, None),
    ("ada_lin", "kernel"): P(None, None, "model"),
    ("ada_lin", "bias"): P(None, "model"),
    "scale_mul": P(None, None),
    "ada_gss": P(None, None, None),
}


def _path_names(path) -> tuple:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(p.key)
        elif hasattr(p, "idx"):
            out.append(p.idx)
    return tuple(out)


def param_pspec(path_names: tuple, leaf) -> P:
    """PartitionSpec for one model-param leaf, by its pytree path."""
    if "blocks" in path_names:
        sub = path_names[path_names.index("blocks") + 1 :]
        if sub in _BLOCK_RULES:
            return _BLOCK_RULES[sub]
        if len(sub) >= 2 and sub[-2:] in _BLOCK_RULES:
            return _BLOCK_RULES[sub[-2:]]
        if sub and sub[0] in _BLOCK_RULES:
            return _BLOCK_RULES[sub[0]]
        return P()
    if "head" in path_names and path_names[-1] == "kernel":
        return P(None, "model")  # column-parallel vocab projection
    if "head" in path_names and path_names[-1] == "bias":
        return P("model")
    return P()  # embeddings, norms, vqvae convs: replicated


def param_shardings(mesh: Mesh, params: Dict) -> Dict:
    """NamedSharding pytree matching `params` (tensor-parallel on 'model')."""

    def one(path, leaf):
        names = _path_names(path)
        spec = param_pspec(names, leaf)
        # guard: axes must divide; fall back to replication otherwise
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            if leaf.shape[dim] % mesh.shape[axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)
