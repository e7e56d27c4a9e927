"""On-chip campaign: VAR-d12 class-conditional sampling (BASELINE config 2).

Round-3 verdict: d12 is the weakest config at 28.7% MFU (106.6 img/s vs a
371 img/s compiler-FLOPs ceiling) with no per-component breakdown. This
tool produces that breakdown plus the two cheapest levers:

  * batch sweep {32, 64, 128} under the bench's chained methodology
    (async dispatches, one readback — see bench._time);
  * per-stage attribution at the default batch: prologue / each scale
    group / VQVAE decode epilogue, hard-synced (per-call readback inflates
    absolute numbers ~50 ms/sync on this tunnel; use the deltas);
  * group-shape A/B: default grouping (scales 0-6 fused, 7-9 single) vs
    one-jit-per-scale vs all-10-fused, chained.

Writes tools/profile_var_d12.json. Run alone (one TPU process at a time).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "profile_var_d12.json")
results: dict = {}


def emit(tag, obj):
    results[tag] = obj
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(tag, obj, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[32, 64, 128])
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from controlvar_tpu.config import VQVAEConfig, var_config_from_depth
    from controlvar_tpu.eval.stepwise import StepwiseVARSampler
    from controlvar_tpu.models.var import VARModel
    from controlvar_tpu.models.vqvae import VQVAE

    def sync(x):
        jax.block_until_ready(x)
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.sum(leaf[(0,) * (leaf.ndim - 1)].astype(jnp.float32)))

    vqvae = VQVAE(VQVAEConfig())
    vq_params = vqvae.init_params(jax.random.key(0))
    cfg = var_config_from_depth(12)
    model = VARModel(cfg)
    params = model.init_params(jax.random.key(1))

    def chained(sampler, B, tag):
        sp = sampler.prepare_params(params)
        labels = jnp.arange(B, dtype=jnp.int32) % cfg.num_classes
        call = lambda k: sampler(sp, vq_params, labels, k)
        t0 = time.time()
        sync(call(jax.random.key(7)))
        compile_s = round(time.time() - t0, 1)
        outs = []
        t0 = time.perf_counter()
        for i in range(args.runs):
            outs.append(call(jax.random.key(100 + i)))
        sync(outs[-1])
        dt = (time.perf_counter() - t0) / args.runs
        emit(tag, {"img_s": round(B / dt, 2), "ms_per_batch": round(dt * 1e3, 1),
                   "batch": B, "compile_sec": compile_s})
        return dt

    # 1) batch sweep, default grouping
    for B in args.batches:
        s = StepwiseVARSampler(model, vqvae, cfg_scale=1.5, top_k=900,
                               top_p=0.96)
        try:
            chained(s, B, f"batch_{B}")
        except Exception as e:
            emit(f"batch_{B}", {"error": f"{type(e).__name__}: {str(e)[:200]}"})

    # 2) per-stage attribution at B=32 (hard-synced; absolute numbers carry
    #    the ~50 ms/sync tunnel tax — read the RATIOS)
    B = 32
    s = StepwiseVARSampler(model, vqvae, cfg_scale=1.5, top_k=900, top_p=0.96)
    sp = s.prepare_params(params)
    labels = jnp.arange(B, dtype=jnp.int32) % cfg.num_classes
    call = lambda k: s(sp, vq_params, labels, k)
    sync(call(jax.random.key(7)))  # compile

    boxes = []
    orig = list(s._group_fns)
    for i, g in enumerate(orig):
        box = [0.0]

        def mk(fn, box=box):
            def f(*a, **k):
                t = time.perf_counter()
                out = fn(*a, **k)
                sync(out)
                box[0] += time.perf_counter() - t
                return out
            return f
        s._group_fns[i] = mk(g)
        boxes.append(box)
    epi_box = [0.0]
    pro_box = [0.0]
    oe, op = s._epilogue, s._prologue

    def timed(fn, sink):
        def f(*a, **k):
            t = time.perf_counter()
            out = fn(*a, **k)
            sync(out)
            sink[0] += time.perf_counter() - t
            return out
        return f
    s._epilogue = timed(oe, epi_box)
    s._prologue = timed(op, pro_box)
    n = args.runs
    for i in range(n):
        sync(call(jax.random.key(200 + i)))
    stage = {"prologue_ms": round(pro_box[0] / n * 1e3, 1)}
    for grp, box in zip(s.groups, boxes):
        pns = [cfg.patch_nums[si] for si in grp]
        stage[f"scales_{'_'.join(map(str, pns))}_ms"] = round(box[0] / n * 1e3, 1)
    stage["epilogue_vqvae_ms"] = round(epi_box[0] / n * 1e3, 1)
    stage["note"] = ("per-call hard sync adds ~50 ms/stage tunnel tax; "
                     "compare ratios, not the chained total")
    emit("stages_B32", stage)

    # 3) grouping A/B at B=32, chained
    n_sc = cfg.num_scales
    groupings = {
        "default_head7": None,
        "per_scale": tuple((i,) for i in range(n_sc)),
        "all_fused": (tuple(range(n_sc)),),
        "head5": (tuple(range(5)),) + tuple((i,) for i in range(5, n_sc)),
    }
    for tag, groups in groupings.items():
        if tag == "default_head7":
            continue  # already measured as batch_32
        s2 = StepwiseVARSampler(model, vqvae, cfg_scale=1.5, top_k=900,
                                top_p=0.96, groups=groups)
        try:
            chained(s2, 32, f"groups_{tag}")
        except Exception as e:
            emit(f"groups_{tag}",
                 {"error": f"{type(e).__name__}: {str(e)[:200]}"})


if __name__ == "__main__":
    main()
