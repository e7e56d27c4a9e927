"""VQVAE decoder epilogue profiler (VERDICT r3 next-step #1).

The d16 headline pays 144 ms/batch (B=16, BOTH canvases => 32 decoder
passes at 256^2) in the VQVAE decode epilogue, measured at ~36% of the
chip's matmul rate. This tool splits that block into its suspects by
ablation in ONE process (comparable rows): GroupNorm (whose (B,H,W,32,
C/32) reshape puts a 5-wide minor dim on the lane axis at ch=160), the
nonlinearity, the two spatial attention blocks at 16^2, and the conv
floor, and A/Bs a matmul-form GroupNorm that keeps the (B,H,W,C) layout
(group sums via a (C,G) one-hot matmul - see ops/groupnorm.py).

Usage: python tools/profile_vae.py [B]      (default B=32 = dual-canvas 16)
Writes tools/profile_vae.json.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _time(call, n=6):
    _sync(call())  # compile + warmup
    outs = []
    t0 = time.perf_counter()
    for _ in range(n):
        outs.append(call())
    _sync(outs[-1])
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from controlvar_tpu.config import VQVAEConfig
    from controlvar_tpu.models import vae
    from controlvar_tpu.models.vqvae import VQVAE

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = VQVAEConfig()
    vq = VQVAE(cfg)
    params = vq.init_params(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (B, 16, 16, cfg.z_channels),
                          jnp.float32)
    dec_params = params["decoder"]

    def run(variant):
        """Jit the decoder with a monkeypatched primitive set."""
        orig_gn, orig_swish, orig_attn = (vae.group_norm, vae._swish,
                                          vae._attnblock)
        try:
            if variant == "no_gn":
                vae.group_norm = lambda p, x, num_groups=32, eps=1e-6: x
            elif variant == "gn_matmul":
                from controlvar_tpu.ops.groupnorm import group_norm_matmul

                vae.group_norm = group_norm_matmul
            elif variant == "no_swish":
                vae._swish = lambda x: x
            elif variant == "no_attn":
                vae._attnblock = lambda p, x, precision: x
            elif variant == "no_gn_no_swish":
                vae.group_norm = lambda p, x, num_groups=32, eps=1e-6: x
                vae._swish = lambda x: x

            fn = jax.jit(functools.partial(
                vae.decoder_apply, cfg=cfg, compute_dtype=jnp.bfloat16))
            return _time(lambda: fn(dec_params, z))
        finally:
            vae.group_norm, vae._swish, vae._attnblock = (orig_gn, orig_swish,
                                                          orig_attn)

    out = {"B": B}
    for v in ("full", "no_gn", "gn_matmul", "no_swish", "no_attn",
              "no_gn_no_swish"):
        try:
            dt = run(v)
            out[v] = {"ms": round(dt * 1e3, 2), "img_s": round(B / dt, 1)}
        except Exception as e:  # keep profiling the rest
            out[v] = {"error": f"{type(e).__name__}: {e}"}
        print(v, out[v], flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "profile_vae.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
