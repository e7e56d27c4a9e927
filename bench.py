"""Headline benchmark: ControlVAR-d16 256x256 joint CFG sampling throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

Baseline: the reference (PyTorch, lxa9867/ControlVAR) publishes no numbers;
BASELINE.md's north star is >=2x an A100's images/sec/chip for this config.
A100_BASELINE_IMG_S below is an analytic estimate for the reference stack on
A100-80GB: d16 CFG decode moves ~2*310M params * 1360 tokens * 2(CFG) ~= 1.7
TFLOP/img through the transformer plus ~2 TFLOP VQVAE decode; at a generous
40% bf16 MFU on A100 (312 TFLOPS peak) with the reference's eager python
scale loop, that bounds it at ~30 img/s/chip. We use 30.0 as the bar.
"""
from __future__ import annotations

import json
import time

A100_BASELINE_IMG_S = 30.0
BATCH = 16
DEPTH = 16


def main() -> None:
    # NOTE: do NOT enable jax_compilation_cache_dir here — it conflicts with
    # the axon remote-compile helper and hangs TPU compiles in this image.
    import jax
    import jax.numpy as jnp

    from controlvar_tpu.config import VQVAEConfig, control_var_config_from_depth
    from controlvar_tpu.models.control_var import ControlVARModel
    from controlvar_tpu.models.vqvae import VQVAE

    cfg = control_var_config_from_depth(DEPTH, multi_cond=True)
    vqvae = VQVAE(VQVAEConfig())
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(cfg)
    params = model.init_params(jax.random.key(1))

    B = BATCH
    labels = jnp.arange(B, dtype=jnp.int32) % cfg.num_classes
    cond_type = jnp.zeros((B,), jnp.int32)

    # Step-wise sampler: a few small jits instead of one monolithic XLA
    # program (whose compile time is pathological on this runtime). A scalar
    # checksum is read back every run — block_until_ready alone can return
    # before execution finishes on the remote-tunnel runtime and fake
    # sub-ms timings.
    from controlvar_tpu.eval.stepwise import StepwiseJointSampler

    sampler = StepwiseJointSampler(model, vqvae, cfg_scale=4.0, top_k=900, top_p=0.96)
    params = sampler.prepare_params(params)

    def run(key):
        img_c, img_i = sampler(params, vq_params, labels, cond_type, key)
        return float(jnp.sum(img_i))

    run(jax.random.key(2))  # compile + warmup (hard sync)

    n_runs = 5
    t0 = time.perf_counter()
    for i in range(n_runs):
        run(jax.random.key(3 + i))
    dt = (time.perf_counter() - t0) / n_runs
    img_s = B / dt

    print(
        json.dumps(
            {
                "metric": f"ControlVAR-d{DEPTH} 256x256 joint CFG sampling (B={B})",
                "value": round(img_s, 3),
                "unit": "img/s/chip",
                "vs_baseline": round(img_s / A100_BASELINE_IMG_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
