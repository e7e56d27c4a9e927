"""Exact per-config FLOP accounting via XLA cost analysis (CPU backend).

Round-2's roofline was assembled from hand-estimates that double-counted
(ada_lin treated as a per-token matmul, VQVAE decode inflated ~2.5x) and
omitted attention. This tool compiles the REAL jitted computations the
bench runs — the d16 conditional scale-step chain, the joint samplers, the
VQVAE codecs — with `jax.jit(...).lower().compile().cost_analysis()` and
reports measured-by-the-compiler FLOPs per image. Results depend only on
model shapes, so they are cached in tools/roofline.json and reused by
bench.py to annotate every config with TFLOP/img and the implied MFU at the
chip's measured 244 TFLOP/s sustained bf16 rate.

Run:  python tools/roofline.py      (writes tools/roofline.json, prints it)
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_SUSTAINED_TFLOPS = 244.0  # measured on this image's chip (PERF.md §1)


def _flops(jitted, *args) -> float:
    c = jitted.lower(*args).compile()
    an = c.cost_analysis()
    if isinstance(an, list):  # older jax returns [dict]
        an = an[0]
    return float(an["flops"])


def cond_d16_flops(B=16):
    """Headline: stepwise conditional sampler, all 10 scale steps + epilogue.

    Sums cost over each per-scale jit exactly as the bench executes them
    (grouped head + individual tail), incl. sampling, quantizer and
    epilogue; divides by B for TFLOP/img."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from controlvar_tpu.config import VQVAEConfig, control_var_config_from_depth
    from controlvar_tpu.eval.stepwise import StepwiseCondSampler
    from controlvar_tpu.models import transformer as tfm
    from controlvar_tpu.models.control_var import ControlVARModel
    from controlvar_tpu.models.vqvae import VQVAE

    vqvae = VQVAE(VQVAEConfig())
    vq_params = vqvae.init_params(jax.random.key(0))
    cfg = control_var_config_from_depth(16, multi_cond=True)
    model = ControlVARModel(cfg)
    params = model.init_params(jax.random.key(1))
    s = StepwiseCondSampler(model, vqvae, cfg_scales=(4.0, 4.0, 4.0),
                            top_k=900, top_p=0.96, force="control")
    params = s.prepare_params(params)
    labels = jnp.zeros((B,), jnp.int32)
    ct = jnp.zeros((B,), jnp.int32)
    rng = np.random.default_rng(0)
    forced = [jnp.asarray(rng.integers(0, cfg.vocab_size, (B, pn * pn))
                          .astype(np.int32)) for pn in cfg.patch_nums]
    z = vqvae.cfg.z_channels
    pns = cfg.patch_nums

    cond, next_map = s._prologue(params, labels, ct)
    cache_k, cache_v = tfm.decode_caches(cfg, s.repeat_num * B, cfg.seq_len,
                                         s.compute_dtype)
    fh_c = jnp.zeros((2 * B, pns[-1], pns[-1], z), jnp.float32)
    fh_i = jnp.zeros((2 * B, pns[-1], pns[-1], z), jnp.float32)
    keys = jax.random.split(jax.random.key(0), cfg.num_scales)

    total = _flops(s._prologue, params, labels, ct)
    off = 0
    for grp, fn in zip(s.groups, s._group_fns):
        args = (params, vq_params, cond, next_map, cache_k, cache_v,
                fh_c, fh_i, keys[off:off + len(grp)], forced)
        total += _flops(fn, *args)
        next_map, cache_k, cache_v, fh_c, fh_i = fn(*args)
        off += len(grp)
    ep = _flops(s._epilogue, vq_params, fh_c, fh_i)
    return {"tflop_per_img": (total + ep) / B / 1e12,
            "epilogue_tflop_per_img": ep / B / 1e12}


def joint_flops(depth, B):
    import jax
    import jax.numpy as jnp

    from controlvar_tpu.config import VQVAEConfig, control_var_config_from_depth
    from controlvar_tpu.eval.stepwise import StepwiseJointSampler
    from controlvar_tpu.models import transformer as tfm
    from controlvar_tpu.models.control_var import ControlVARModel
    from controlvar_tpu.models.vqvae import VQVAE

    vqvae = VQVAE(VQVAEConfig())
    vq_params = vqvae.init_params(jax.random.key(0))
    cfg = control_var_config_from_depth(depth, multi_cond=True)
    model = ControlVARModel(cfg)
    params = model.init_params(jax.random.key(1))
    s = StepwiseJointSampler(model, vqvae, cfg_scale=4.0, top_k=900, top_p=0.96)
    params = s.prepare_params(params)
    labels = jnp.zeros((B,), jnp.int32)
    ct = jnp.zeros((B,), jnp.int32)
    z = vqvae.cfg.z_channels
    pns = cfg.patch_nums
    cond, next_map = s._prologue(params, labels, ct)
    cache_k, cache_v = tfm.decode_caches(cfg, 2 * B, cfg.seq_len, s.compute_dtype)
    fh_c = jnp.zeros((B, pns[-1], pns[-1], z), jnp.float32)
    fh_i = jnp.zeros((B, pns[-1], pns[-1], z), jnp.float32)
    keys = jax.random.split(jax.random.key(0), cfg.num_scales)
    total = _flops(s._prologue, params, labels, ct)
    off = 0
    for grp, fn in zip(s.groups, s._group_fns):
        args = (params, vq_params, cond, next_map, cache_k, cache_v,
                fh_c, fh_i, keys[off:off + len(grp)])
        total += _flops(fn, *args)
        next_map, cache_k, cache_v, fh_c, fh_i = fn(*args)
        off += len(grp)
    total += _flops(s._epilogue, vq_params, fh_c, fh_i)
    return {"tflop_per_img": total / B / 1e12}


def var_d12_flops(B=32):
    import jax
    import jax.numpy as jnp

    from controlvar_tpu.config import VQVAEConfig, var_config_from_depth
    from controlvar_tpu.eval.stepwise import StepwiseVARSampler
    from controlvar_tpu.models import transformer as tfm
    from controlvar_tpu.models.var import VARModel
    from controlvar_tpu.models.vqvae import VQVAE

    vqvae = VQVAE(VQVAEConfig())
    vq_params = vqvae.init_params(jax.random.key(0))
    cfg = var_config_from_depth(12)
    model = VARModel(cfg)
    params = model.init_params(jax.random.key(1))
    s = StepwiseVARSampler(model, vqvae, cfg_scale=1.5, top_k=900, top_p=0.96)
    labels = jnp.zeros((B,), jnp.int32)
    z = vqvae.cfg.z_channels
    pns = cfg.patch_nums
    cond, next_map = s._prologue(params, labels)
    cache_k, cache_v = tfm.decode_caches(cfg, 2 * B, cfg.seq_len, s.compute_dtype)
    f_hat = jnp.zeros((B, pns[-1], pns[-1], z), jnp.float32)
    keys = jax.random.split(jax.random.key(0), cfg.num_scales)
    total = _flops(s._prologue, params, labels)
    off = 0
    for grp, fn in zip(s.groups, s._group_fns):
        args = (params, vq_params, cond, next_map, cache_k, cache_v,
                f_hat, keys[off:off + len(grp)])
        total += _flops(fn, *args)
        next_map, cache_k, cache_v, f_hat = fn(*args)
        off += len(grp)
    total += _flops(s._epilogue, vq_params, f_hat)
    return {"tflop_per_img": total / B / 1e12}


def vqvae_recon_flops(B=64):
    import jax
    import jax.numpy as jnp

    from controlvar_tpu.config import VQVAEConfig
    from controlvar_tpu.models.vqvae import VQVAE

    vqvae = VQVAE(VQVAEConfig())
    vq_params = vqvae.init_params(jax.random.key(0))
    x = jnp.zeros((B, 256, 256, 3), jnp.float32)

    def recon(vp, x):
        ids = vqvae.img_to_ids(vp, x, compute_dtype=jnp.bfloat16)
        fh = vqvae.quantizer.ids_to_fhat(vp["quantize"], ids)
        return vqvae.fhat_to_img(vp, fh, jnp.bfloat16)

    return {"tflop_per_img": _flops(jax.jit(recon), vq_params, x) / B / 1e12}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    out = {
        "chip_sustained_tflops": V5E_SUSTAINED_TFLOPS,
        "controlvar_d16_cond": cond_d16_flops(),
        "vqvae_recon": vqvae_recon_flops(),
        "var_d12_sample": var_d12_flops(),
        "controlvar_d24_joint": joint_flops(24, 8),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
