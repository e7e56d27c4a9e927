"""PatchGAN discriminator (Pix2Pix style, 3 layers, ndf 64).

JAX port of the reference NLayerDiscriminator (reference:
losses/discriminator.py:17-66): stride-2 4x4 convs with BatchNorm+LeakyReLU,
final 1-channel patch logits. BatchNorm uses batch statistics (training
mode); this matches GAN training where the discriminator never runs in eval.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict


def _conv_init(key, kh, kw, cin, cout, std=0.02):
    k1, _ = jax.random.split(key)
    # reference weights_init: normal(0, 0.02) (discriminator.py:8-14)
    return {
        "kernel": std * jax.random.normal(k1, (kh, kw, cin, cout), jnp.float32),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def init_params(key: jax.Array, input_nc: int = 3, ndf: int = 64,
                n_layers: int = 3) -> Params:
    ks = iter(jax.random.split(key, 2 * n_layers + 4))
    layers = [{"conv": _conv_init(next(ks), 4, 4, input_nc, ndf), "bn": None}]
    nf = ndf
    for n in range(1, n_layers + 1):
        nf_prev, nf = nf, min(ndf * 2 ** n, ndf * 8)
        layers.append({
            "conv": _conv_init(next(ks), 4, 4, nf_prev, nf),
            "bn": {
                "scale": 1.0 + 0.02 * jax.random.normal(next(ks), (nf,), jnp.float32),
                "bias": jnp.zeros((nf,), jnp.float32),
            },
        })
    layers.append({"conv": _conv_init(next(ks), 4, 4, nf, 1), "bn": None})
    return {"layers": layers}


def _conv(p, x, stride):
    # torch Conv2d(k=4, stride, padding=1)
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def _bn(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(xf, axis=(0, 1, 2), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xn * p["scale"] + p["bias"]).astype(x.dtype)


def apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, W, 3) -> patch logits (B, h', w', 1)."""
    layers = params["layers"]
    n_layers = len(layers) - 2  # static: derived from the pytree structure
    h = jax.nn.leaky_relu(_conv(layers[0]["conv"], x, 2), 0.2)
    for n in range(1, n_layers + 1):
        stride = 2 if n < n_layers else 1
        h = _conv(layers[n]["conv"], h, stride)
        h = _bn(layers[n]["bn"], h)
        h = jax.nn.leaky_relu(h, 0.2)
    return _conv(layers[-1]["conv"], h, 1)
