"""On-chip A/B: literal vs W-packed decoder tail (ops/packed_conv).

Arms (one process, directly comparable):
  * decoder standalone at B=32 (= the headline's dual-canvas epilogue),
    wpack False vs True, chained timing;
  * numerical check on-chip: packed vs literal bf16 decode of the same
    f_hat (max abs diff; both should sit within bf16 noise of each other).

Writes tools/wpack_ab.json. Run alone (one TPU process at a time).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "wpack_ab.json")
results: dict = {}


def emit(tag, obj):
    results[tag] = obj
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(tag, obj, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from controlvar_tpu.config import VQVAEConfig
    from controlvar_tpu.models import vae
    from controlvar_tpu.models.vqvae import VQVAE

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)[0, 0]))

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = VQVAEConfig()
    vq = VQVAE(cfg)
    params = vq.init_params(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (B, 16, 16, cfg.z_channels),
                          jnp.float32)
    dec = params["decoder"]

    outs = {}
    for wpack in (False, True):
        fn = jax.jit(functools.partial(
            vae.decoder_apply, cfg=cfg, compute_dtype=jnp.bfloat16,
            wpack=wpack))
        t0 = time.time()
        sync(fn(dec, z))
        compile_s = round(time.time() - t0, 1)
        res = []
        t0 = time.perf_counter()
        n = 6
        for _ in range(n):
            res.append(fn(dec, z))
        sync(res[-1])
        dt = (time.perf_counter() - t0) / n
        outs[wpack] = fn(dec, z)
        emit(f"wpack_{wpack}", {"ms": round(dt * 1e3, 2),
                                "img_s": round(B / dt, 1),
                                "compile_sec": compile_s})
    import numpy as np

    a = np.asarray(outs[False], dtype=np.float32)
    b = np.asarray(outs[True], dtype=np.float32)
    # random-init decoder outputs are unclamped and large; report the diff
    # against the output scale (bf16 accumulation-order noise is relative)
    emit("bf16_max_abs_diff", float(np.abs(a - b).max()))
    emit("output_abs_mean", float(np.abs(a).mean()))
    emit("output_abs_max", float(np.abs(a).max()))
    emit("rel_rms_diff", float(np.sqrt(((a - b) ** 2).mean())
                               / np.sqrt((a ** 2).mean())))


if __name__ == "__main__":
    main()
