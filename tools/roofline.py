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

Nothing here ever EXECUTES: every stage's inputs are ShapeDtypeStructs
threaded with `jax.eval_shape`, so the multi-scale chains lower+compile in
seconds instead of running a full decode on the 1-core CPU host.

Run:  python tools/roofline.py      (writes tools/roofline.json, prints it)
"""
from __future__ import annotations

import functools
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


def _abs(tree):
    """ShapeDtypeStruct skeleton of a pytree (valid `lower`/`eval_shape` arg)."""
    import jax

    return jax.eval_shape(lambda t: t, tree)


def scan_body_counted_once() -> bool:
    """Calibrate cost_analysis' scan handling: True if a lax.scan body's
    FLOPs are reported once (current XLA behavior), False if multiplied by
    trip count (in which case `_scan_correction` must not be applied)."""
    import jax
    import jax.numpy as jnp

    x = jax.ShapeDtypeStruct((256, 256), jnp.float32)
    ws = jax.ShapeDtypeStruct((16, 256, 256), jnp.float32)

    def scanned(x, ws):
        return jax.lax.scan(lambda c, w: (c @ w, None), x, ws)[0]

    one = 2.0 * 256 ** 3
    return _flops(jax.jit(scanned), x, ws) < 2 * one


def _scan_correction(model_cls, cfg, rows, steps) -> float:
    """FLOPs that XLA cost analysis misses inside the transformer layer scan.

    `cost_analysis()` counts a `lax.scan` body ONCE regardless of trip count
    (verified: a 16-step scanned matmul reports the same flops as one
    matmul), so every sampler's 16/24-layer block stack is under-reported by
    a factor of ~depth. The scan body is exactly one decode layer, so this
    compiles a depth-1 clone of `blocks_decode` at each scale step's true
    (rows, seg, pos) shapes, subtracts the analytic ada_lin matmul that sits
    OUTSIDE the scan in the real model (2*rows*6C^2; the depth-1 compile
    includes one layer's worth, the full fn already counts all layers), and
    returns (depth-1) * sum(body_flops).

    steps: list of (seg_len, pos) per scale step."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from controlvar_tpu.models import transformer as tfm

    cfg1 = dataclasses.replace(cfg, depth=1)
    model1 = model_cls(cfg1)
    p1 = jax.eval_shape(model1.init_params, jax.random.key(0))
    bp1 = p1["blocks"]
    C = cfg.embed_dim
    cache_k, cache_v = jax.eval_shape(
        lambda: tfm.decode_caches(cfg1, rows, cfg.seq_len, jnp.bfloat16))
    if not scan_body_counted_once():
        return 0.0  # this XLA already multiplies scan bodies by trip count
    ada_once = 2.0 * rows * C * 6 * C
    total = 0.0
    for seg, pos in steps:
        x = jax.ShapeDtypeStruct((rows, seg, C), jnp.bfloat16)
        cond = jax.ShapeDtypeStruct((rows, C), jnp.float32)
        fn = jax.jit(functools.partial(_blocks1, cfg1, pos))
        f1 = _flops(fn, bp1, x, cond, cache_k, cache_v)
        total += max(0.0, f1 - ada_once)
    return (cfg.depth - 1) * total


def _blocks1(cfg1, pos, bp, x, cond, ck, cv):
    from controlvar_tpu.models import transformer as tfm

    return tfm.blocks_decode(bp, x, cond, cfg1, ck, cv, pos)[0]


def cond_d16_flops(B=16):
    """Headline: stepwise conditional sampler, all 10 scale steps + epilogue.

    Sums cost over each per-scale jit exactly as the bench executes them
    (grouped head + individual tail), incl. sampling, quantizer and
    epilogue; divides by B for TFLOP/img."""
    import jax
    import jax.numpy as jnp

    from controlvar_tpu.config import VQVAEConfig, control_var_config_from_depth
    from controlvar_tpu.eval.stepwise import StepwiseCondSampler
    from controlvar_tpu.models import transformer as tfm
    from controlvar_tpu.models.control_var import ControlVARModel
    from controlvar_tpu.models.vqvae import VQVAE

    vqvae = VQVAE(VQVAEConfig())
    vq_params = _abs(jax.eval_shape(vqvae.init_params, jax.random.key(0)))
    cfg = control_var_config_from_depth(16, multi_cond=True)
    model = ControlVARModel(cfg)
    s = StepwiseCondSampler(model, vqvae, cfg_scales=(4.0, 4.0, 4.0),
                            top_k=900, top_p=0.96, force="control")
    params = jax.eval_shape(
        s.prepare_params, jax.eval_shape(model.init_params, jax.random.key(1)))
    z = vqvae.cfg.z_channels
    pns = cfg.patch_nums

    labels = jax.ShapeDtypeStruct((B,), jnp.int32)
    ct = jax.ShapeDtypeStruct((B,), jnp.int32)
    forced = [jax.ShapeDtypeStruct((B, pn * pn), jnp.int32) for pn in pns]
    cond, next_map = jax.eval_shape(s._prologue, params, labels, ct)
    cache_k, cache_v = __import__('jax').eval_shape(
        lambda: tfm.decode_caches(cfg, s.repeat_num * B, cfg.seq_len,
                                  s.compute_dtype))
    fh_c = jax.ShapeDtypeStruct((2 * B, pns[-1], pns[-1], z), jnp.float32)
    fh_i = jax.ShapeDtypeStruct((2 * B, pns[-1], pns[-1], z), jnp.float32)
    key_t = jax.eval_shape(lambda: jax.random.split(jax.random.key(0), 1))

    total = _flops(s._prologue, params, labels, ct)
    for grp, fn in zip(s.groups, s._group_fns):
        keys = jax.ShapeDtypeStruct((len(grp),) + key_t.shape[1:], key_t.dtype)
        args = (params, vq_params, cond, next_map, cache_k, cache_v,
                fh_c, fh_i, keys, forced)
        total += _flops(fn, *args)
        next_map, cache_k, cache_v, fh_c, fh_i = jax.eval_shape(fn, *args)
    ep = _flops(s._epilogue, vq_params, fh_c, fh_i)
    steps = [(cfg.scale_seg_len(si), cfg.begin_ends[si][0])
             for si in range(cfg.num_scales)]
    corr = _scan_correction(ControlVARModel, cfg, s.repeat_num * B, steps)
    return {"tflop_per_img": (total + corr + ep) / B / 1e12,
            "epilogue_tflop_per_img": ep / B / 1e12,
            "scan_corr_tflop_per_img": corr / B / 1e12}


def joint_flops(depth, B):
    import jax
    import jax.numpy as jnp

    from controlvar_tpu.config import VQVAEConfig, control_var_config_from_depth
    from controlvar_tpu.eval.stepwise import StepwiseJointSampler
    from controlvar_tpu.models import transformer as tfm
    from controlvar_tpu.models.control_var import ControlVARModel
    from controlvar_tpu.models.vqvae import VQVAE

    vqvae = VQVAE(VQVAEConfig())
    vq_params = _abs(jax.eval_shape(vqvae.init_params, jax.random.key(0)))
    cfg = control_var_config_from_depth(depth, multi_cond=True)
    model = ControlVARModel(cfg)
    s = StepwiseJointSampler(model, vqvae, cfg_scale=4.0, top_k=900, top_p=0.96)
    params = jax.eval_shape(
        s.prepare_params, jax.eval_shape(model.init_params, jax.random.key(1)))
    z = vqvae.cfg.z_channels
    pns = cfg.patch_nums
    labels = jax.ShapeDtypeStruct((B,), jnp.int32)
    ct = jax.ShapeDtypeStruct((B,), jnp.int32)
    cond, next_map = jax.eval_shape(s._prologue, params, labels, ct)
    cache_k, cache_v = __import__('jax').eval_shape(
        lambda: tfm.decode_caches(cfg, 2 * B, cfg.seq_len, s.compute_dtype))
    fh_c = jax.ShapeDtypeStruct((B, pns[-1], pns[-1], z), jnp.float32)
    fh_i = jax.ShapeDtypeStruct((B, pns[-1], pns[-1], z), jnp.float32)
    key_t = jax.eval_shape(lambda: jax.random.split(jax.random.key(0), 1))
    total = _flops(s._prologue, params, labels, ct)
    for grp, fn in zip(s.groups, s._group_fns):
        keys = jax.ShapeDtypeStruct((len(grp),) + key_t.shape[1:], key_t.dtype)
        args = (params, vq_params, cond, next_map, cache_k, cache_v,
                fh_c, fh_i, keys)
        total += _flops(fn, *args)
        next_map, cache_k, cache_v, fh_c, fh_i = jax.eval_shape(fn, *args)
    total += _flops(s._epilogue, vq_params, fh_c, fh_i)
    steps = [(cfg.scale_seg_len(si), cfg.begin_ends[si][0])
             for si in range(cfg.num_scales)]
    total += _scan_correction(ControlVARModel, cfg, 2 * B, steps)
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
    vq_params = _abs(jax.eval_shape(vqvae.init_params, jax.random.key(0)))
    cfg = var_config_from_depth(12)
    model = VARModel(cfg)
    s = StepwiseVARSampler(model, vqvae, cfg_scale=1.5, top_k=900, top_p=0.96)
    params = jax.eval_shape(
        s.prepare_params, jax.eval_shape(model.init_params, jax.random.key(1)))
    z = vqvae.cfg.z_channels
    pns = cfg.patch_nums
    labels = jax.ShapeDtypeStruct((B,), jnp.int32)
    cond, next_map = jax.eval_shape(s._prologue, params, labels)
    cache_k, cache_v = __import__('jax').eval_shape(
        lambda: tfm.decode_caches(cfg, 2 * B, cfg.seq_len, s.compute_dtype))
    f_hat = jax.ShapeDtypeStruct((B, pns[-1], pns[-1], z), jnp.float32)
    key_t = jax.eval_shape(lambda: jax.random.split(jax.random.key(0), 1))
    total = _flops(s._prologue, params, labels)
    for grp, fn in zip(s.groups, s._group_fns):
        keys = jax.ShapeDtypeStruct((len(grp),) + key_t.shape[1:], key_t.dtype)
        args = (params, vq_params, cond, next_map, cache_k, cache_v,
                f_hat, keys)
        total += _flops(fn, *args)
        next_map, cache_k, cache_v, f_hat = jax.eval_shape(fn, *args)
    total += _flops(s._epilogue, vq_params, f_hat)
    steps, pos = [], 0
    for pn in cfg.patch_nums:
        steps.append((pn * pn, pos))
        pos += pn * pn
    total += _scan_correction(VARModel, cfg, 2 * B, steps)
    return {"tflop_per_img": total / B / 1e12}


def train_step_flops(depth, B):
    """ControlVAR train-step FLOPs (fwd + bwd + optimizer, incl. the two
    tokenizer encode passes — reference: train_control_var_hpu.py:130-250).

    Scan accounting: `cost_analysis` counts a lax.scan body ONCE, so the
    layer scan under-reports by its trip count. CONTROLVAR_SCAN_CHUNK=1
    splits the layer stack into depth trip-1 scans (identical math,
    transformer._fwd_scan_chunk), each of whose body XLA counts — exact
    totals with no correction term.

    Two numbers: `executed` lowers the REAL step (remat on: the backward
    recomputes each layer's forward, and those FLOPs run on the chip —
    hardware utilization divides by this); `model` lowers a remat-off clone
    (algorithmic FLOPs only — MFU proper divides by this).
    """
    import jax
    import jax.numpy as jnp

    from controlvar_tpu.config import (OptimConfig, VQVAEConfig,
                                       control_var_config_from_depth)
    from controlvar_tpu.models import transformer as tfm
    from controlvar_tpu.models.control_var import ControlVARModel
    from controlvar_tpu.models.vqvae import VQVAE
    from controlvar_tpu.train.train_step import (ControlVARTrainStep,
                                                 TrainState, make_optimizer)

    os.environ["CONTROLVAR_SCAN_CHUNK"] = "1"  # read at trace time
    orig_blocks_forward = tfm.blocks_forward
    try:
        vqvae = VQVAE(VQVAEConfig())
        vq_params = _abs(jax.eval_shape(vqvae.init_params, jax.random.key(0)))
        cfg = control_var_config_from_depth(depth, multi_cond=True)
        model = ControlVARModel(cfg)
        params = jax.eval_shape(model.init_params, jax.random.key(1))
        optim = OptimConfig(total_batch_size=B)
        tx = make_optimizer(optim, params)
        state = TrainState(params=params,
                           opt_state=jax.eval_shape(tx.init, params),
                           step=jax.ShapeDtypeStruct((), jnp.int32))
        stepper = ControlVARTrainStep(model, vqvae, optim,
                                      max_steps=1000, warmup_steps=10)
        batch = {
            "image": jax.ShapeDtypeStruct((B, 256, 256, 3), jnp.float32),
            "mask": jax.ShapeDtypeStruct((B, 256, 256, 3), jnp.float32),
            "cls": jax.ShapeDtypeStruct((B,), jnp.int32),
            "type": jax.ShapeDtypeStruct((B,), jnp.int32),
        }
        key = jax.eval_shape(lambda: jax.random.key(0))
        out = {}
        for remat, name in ((True, "executed"), (False, "model")):
            tfm.blocks_forward = functools.partial(orig_blocks_forward,
                                                   remat=remat)
            step = jax.jit(lambda s, vp, b, k: stepper.step(tx, s, vp, b, k))
            out[f"tflop_per_step_{name}"] = _flops(
                step, state, vq_params, batch, key) / 1e12
        out["tflop_per_img_model"] = out["tflop_per_step_model"] / B
        return out
    finally:
        tfm.blocks_forward = orig_blocks_forward
        del os.environ["CONTROLVAR_SCAN_CHUNK"]


def vqvae_recon_flops(B=64):
    import jax
    import jax.numpy as jnp

    from controlvar_tpu.config import VQVAEConfig
    from controlvar_tpu.models.vqvae import VQVAE

    vqvae = VQVAE(VQVAEConfig())
    vq_params = _abs(jax.eval_shape(vqvae.init_params, jax.random.key(0)))
    x = jax.ShapeDtypeStruct((B, 256, 256, 3), jnp.float32)

    def recon(vp, x):
        ids = vqvae.img_to_ids(vp, x, compute_dtype=jnp.bfloat16)
        fh = vqvae.quantizer.ids_to_fhat(vp["quantize"], ids)
        return vqvae.fhat_to_img(vp, fh, jnp.bfloat16)

    return {"tflop_per_img": _flops(jax.jit(recon), vq_params, x) / B / 1e12}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "roofline.json")
    out = {"chip_sustained_tflops": V5E_SUSTAINED_TFLOPS}

    def save(name, fn, *a, **kw):
        out[name] = fn(*a, **kw)
        with open(path, "w") as f:  # incremental: survive timeouts
            json.dump(out, f, indent=1)
        print(name, out[name], flush=True)

    save("vqvae_recon", vqvae_recon_flops)
    save("controlvar_d16_cond", cond_d16_flops)
    save("var_d12_sample", var_d12_flops)
    save("controlvar_d24_joint", joint_flops, 24, 8)
    save("controlvar_d16_train", train_step_flops, 16, 8)
    save("controlvar_d24_train", train_step_flops, 24, 8)

    # pre-tokenized train step (train --token_shards): same methodology,
    # computed by tools/token_train_ab.py --flops (per-scale id-list batch)
    def _token_flops(depth, B):
        from tools.token_train_ab import token_step_flops

        out = token_step_flops(depth, B)
        out["tflop_per_img_model"] = out["tflop_per_step_model"] / B
        return out

    save("controlvar_d16_train_tokens", _token_flops, 16, 8)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
