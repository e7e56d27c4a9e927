"""Per-stage timing of the ControlVAR decode on the real chip.

Usage:
  python tools/profile_decode.py [--depth 16] [--batch 16] [--mode cond|joint]
      [--trace DIR]   # also dump a jax.profiler trace of 2 batches

Prints per-scale-group wall times (hard-synced) plus the VQVAE decode
epilogue, and a rough MFU estimate for the transformer portion.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--mode", type=str, default="cond", choices=["cond", "joint"])
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--repeat_num", type=int, default=4)
    ap.add_argument("--no_decode", action="store_true")
    ap.add_argument("--ablate", type=str, default="",
                    choices=["", "no_attn", "no_cache_write", "attn_nocache"],
                    help="TIMING-ONLY decode ablation (outputs are garbage); "
                         "see models/transformer.blocks_decode_unrolled")
    args = ap.parse_args()

    if args.ablate:
        os.environ["CONTROLVAR_ABLATE"] = args.ablate
        os.environ["CONTROLVAR_ABLATE_OK"] = "1"
        print(f"ABLATION {args.ablate}: timing-only, outputs are garbage")

    import jax
    import jax.numpy as jnp

    from controlvar_tpu.config import VQVAEConfig, control_var_config_from_depth
    from controlvar_tpu.eval.stepwise import StepwiseCondSampler, StepwiseJointSampler
    from controlvar_tpu.models.control_var import ControlVARModel
    from controlvar_tpu.models.vqvae import VQVAE

    cfg = control_var_config_from_depth(args.depth, multi_cond=True)
    vq_cfg = VQVAEConfig()
    vqvae = VQVAE(vq_cfg)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(cfg)
    params = model.init_params(jax.random.key(1))

    B = args.batch
    labels = jnp.arange(B, dtype=jnp.int32) % cfg.num_classes
    ct = jnp.zeros((B,), jnp.int32)
    rng = np.random.default_rng(0)
    c_mask = [
        jnp.asarray(rng.integers(0, cfg.vocab_size, (B, pn * pn)).astype(np.int32))
        for pn in cfg.patch_nums
    ]

    if args.mode == "cond":
        sampler = StepwiseCondSampler(
            model, vqvae, cfg_scales=(4.0, 4.0, 4.0), top_k=900, top_p=0.96,
            force="control", repeat_num=args.repeat_num,
        )
        call = lambda key: sampler(params2, vq_params, labels, ct, key, c_mask,
                                   decode_img=not args.no_decode)
    else:
        sampler = StepwiseJointSampler(model, vqvae, cfg_scale=4.0,
                                       top_k=900, top_p=0.96)
        call = lambda key: sampler(params2, vq_params, labels, ct, key,
                                   decode_img=not args.no_decode)
    params2 = sampler.prepare_params(params) if hasattr(sampler, "prepare_params") else params

    def sync(x):
        return float(jnp.sum(x[0] if isinstance(x, tuple) else x))

    # warmup/compile
    t0 = time.perf_counter()
    sync(call(jax.random.key(2)))
    print(f"compile+warmup: {time.perf_counter() - t0:.1f}s")

    # stage timing: instrument the group fns
    group_times = [0.0] * len(sampler.groups)
    epi_time = [0.0]
    pro_time = [0.0]

    orig_groups = sampler._group_fns
    orig_epi = sampler._epilogue
    orig_pro = sampler._prologue

    def hard_sync(out):
        # block_until_ready can return early on the axon tunnel; reading a
        # scalar back is the only reliable sync
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf[(0,) * (leaf.ndim - 1)].astype(jnp.float32)))

    def timed(fn, sink):
        def f(*a, **k):
            t = time.perf_counter()
            out = fn(*a, **k)
            hard_sync(out)
            sink[0] += time.perf_counter() - t
            return out
        return f

    for i, g in enumerate(orig_groups):
        box = [0.0]
        def mk(fn, box=box):
            def f(*a, **k):
                t = time.perf_counter()
                out = fn(*a, **k)
                hard_sync(out)
                box[0] += time.perf_counter() - t
                return out
            return f
        sampler._group_fns[i] = mk(g)
        group_times[i] = box
    sampler._epilogue = timed(orig_epi, epi_time)
    sampler._prologue = timed(orig_pro, pro_time)

    n = args.runs
    t0 = time.perf_counter()
    for i in range(n):
        sync(call(jax.random.key(3 + i)))
    total = (time.perf_counter() - t0) / n
    print(f"total: {total*1e3:.1f} ms/batch  -> {B/total:.2f} img/s (B={B}, "
          f"mode={args.mode}, depth={args.depth})")
    print(f"prologue: {pro_time[0]/n*1e3:.1f} ms")
    for grp, box in zip(sampler.groups, group_times):
        pns = [cfg.patch_nums[s] for s in grp]
        print(f"scales {pns}: {box[0]/n*1e3:.1f} ms")
    print(f"epilogue (VQVAE decode): {epi_time[0]/n*1e3:.1f} ms")

    # rough transformer FLOP model: params*2 per token per CFG row
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params["blocks"])) \
        + params["head"]["kernel"].size
    rows = (args.repeat_num if args.mode == "cond" else 2) * B
    tokens = cfg.seq_len
    tf_flop = 2.0 * n_params * tokens * rows
    tf_time = sum(b[0] for b in group_times) / n
    print(f"transformer ~{tf_flop/1e12:.2f} TFLOP/batch over {tf_time*1e3:.1f} ms "
          f"-> {tf_flop/tf_time/1e12:.1f} TFLOP/s (v5e bf16 peak ~197)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            sync(call(jax.random.key(99)))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
