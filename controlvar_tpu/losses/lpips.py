"""LPIPS perceptual distance (frozen VGG16 features + learned 1x1 heads).

JAX re-implementation of the reference's LPIPS (reference: losses/lpips.py:
11-54): scaling layer -> VGG16 relu1_2/2_2/3_3/4_3/5_3 features ->
channel-unit-normalize -> learned 1x1 linear heads -> spatial mean -> sum.

Weights: the reference downloads `vgg.pth` (taming-transformers checkpoint,
reference: losses/util.py:5-7); `convert_lpips_state_dict` imports that file.
`init_params` gives random weights (tests / from-scratch training).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict

# VGG16 conv plan: (out_channels, layers_in_stage); features tapped at each
# stage's last relu
VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# ImageNet scaling constants (reference: lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(p, x, precision=None):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )
    return y + p["bias"].astype(x.dtype)


def vgg_features(params: Params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x (B, H, W, 3) in [-1, 1] -> 5 feature maps (after each stage)."""
    h = (x - _SHIFT) / _SCALE
    feats = []
    for si, (_, n_layers) in enumerate(VGG_STAGES):
        for li in range(n_layers):
            h = jax.nn.relu(_conv(params["stages"][si][li], h))
        feats.append(h)
        if si < len(VGG_STAGES) - 1:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def lpips_distance(params: Params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-sample LPIPS distance (B,)."""
    fx = vgg_features(params, x)
    fy = vgg_features(params, y)
    total = 0.0
    for si, (a, b) in enumerate(zip(fx, fy)):
        an = a / jnp.linalg.norm(a, axis=-1, keepdims=True).clip(1e-10)
        bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True).clip(1e-10)
        d = (an - bn) ** 2
        w = params["lins"][si]  # (C,) 1x1 head weights (non-negative in ckpt)
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def init_params(key: jax.Array) -> Params:
    stages = []
    cin = 3
    for cout, n_layers in VGG_STAGES:
        layer_ps = []
        for _ in range(n_layers):
            key, k1, k2 = jax.random.split(key, 3)
            bound = 1.0 / np.sqrt(3 * 3 * cin)
            layer_ps.append({
                "kernel": jax.random.uniform(k1, (3, 3, cin, cout), jnp.float32, -bound, bound),
                "bias": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
            })
            cin = cout
        stages.append(layer_ps)
    lins = []
    for cout, _ in VGG_STAGES:
        key, k = jax.random.split(key)
        lins.append(jax.random.uniform(k, (cout,), jnp.float32, 0.0, 0.1))
    return {"stages": stages, "lins": lins}


def convert_lpips_state_dict(sd: Dict[str, np.ndarray]) -> Params:
    """Import the taming-transformers `vgg.pth` LPIPS checkpoint."""
    # torchvision vgg16.features indices of convs per stage
    conv_idx = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
    stages = []
    for si, idxs in enumerate(conv_idx):
        layer_ps = []
        for i in idxs:
            w = sd[f"net.slice{si+1}.{i}.weight"] if f"net.slice{si+1}.{i}.weight" in sd \
                else sd[f"net.features.{i}.weight"]
            b = sd[f"net.slice{si+1}.{i}.bias"] if f"net.slice{si+1}.{i}.bias" in sd \
                else sd[f"net.features.{i}.bias"]
            layer_ps.append({
                "kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
                "bias": b.astype(np.float32),
            })
        stages.append(layer_ps)
    lins = [
        sd[f"lin{i}.model.1.weight"].reshape(-1).astype(np.float32)
        for i in range(5)
    ]
    return {"stages": stages, "lins": lins}
