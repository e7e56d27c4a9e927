"""Per-stage attribution of the d16 headline under the CHAINED methodology.

tools/dispatch_probe.py established the decode is device-bound (host
dispatch 15-27 ms vs 629 ms steady), and tools/chained_ablation.json that
attention+cache ops cost ~nothing. This tool finds where the ~450 ms of
non-epilogue device time actually goes, without the ~50 ms/sync tunnel tax
that poisons per-stage hard-sync timing (tools/profile_decode.py):

  run truncated pipelines — prologue only, prologue+group0, ...,
  all groups (no decode), full — each timed chained (n async batches, one
  readback). stage_cost(g) = steady(upto g) - steady(upto g-1). Exact
  under the bench's own methodology; all arms share one process and one
  set of compiled group jits (truncation only skips later calls).

Also times a per-SCALE sampler (one jit per scale, 12 dispatches) and an
all-fused sampler (1 group jit) to bound what dispatch granularity is
worth end-to-end.

Writes tools/chained_stages.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "chained_stages.json")
results: dict = {}


def emit(tag, obj):
    results[tag] = obj
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(tag, obj, flush=True)


def _sync(x):
    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf[(0,) * (leaf.ndim - 1)].astype(jnp.float32)))


def main():
    from controlvar_tpu.config import VQVAEConfig, control_var_config_from_depth
    from controlvar_tpu.eval.stepwise import StepwiseCondSampler
    from controlvar_tpu.models.control_var import ControlVARModel
    from controlvar_tpu.models.vqvae import VQVAE
    from controlvar_tpu.models import transformer as tfm

    B = 16
    n = 5
    cfg = control_var_config_from_depth(16, multi_cond=True)
    vqvae = VQVAE(VQVAEConfig())
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(cfg)
    params0 = model.init_params(jax.random.key(1))
    s = StepwiseCondSampler(model, vqvae, cfg_scales=(4.0, 4.0, 4.0),
                            top_k=900, top_p=0.96, force="control")
    params = s.prepare_params(params0)
    labels = jnp.arange(B, dtype=jnp.int32) % cfg.num_classes
    ct = jnp.zeros((B,), jnp.int32)
    rng = np.random.default_rng(0)
    forced_ids = [jnp.asarray(rng.integers(0, cfg.vocab_size, (B, pn * pn))
                              .astype(np.int32)) for pn in cfg.patch_nums]
    pns = cfg.patch_nums
    z = vqvae.cfg.z_channels

    def call_upto(key, upto, decode):
        """__call__ truncated after `upto` group fns (see StepwiseCondSampler
        .__call__ — same structure, loop cut short)."""
        cond, next_map = s._prologue(params, labels, ct)
        cache_k, cache_v = tfm.decode_caches(
            cfg, s.repeat_num * B, cfg.seq_len, s.compute_dtype)
        fh_c = jnp.zeros((2 * B, pns[-1], pns[-1], z), jnp.float32)
        fh_i = jnp.zeros((2 * B, pns[-1], pns[-1], z), jnp.float32)
        keys = jax.random.split(key, cfg.num_scales)
        off = 0
        for grp, fn in list(zip(s.groups, s._group_fns))[:upto]:
            next_map, cache_k, cache_v, fh_c, fh_i = fn(
                params, vq_params, cond, next_map, cache_k, cache_v,
                fh_c, fh_i, keys[off: off + len(grp)], forced_ids)
            off += len(grp)
        if not decode:
            return fh_c
        return s._epilogue(vq_params, fh_c, fh_i)

    def chained(fn, tag):
        t0 = time.time()
        _sync(fn(jax.random.key(7)))
        comp = round(time.time() - t0, 1)
        outs = []
        t0 = time.perf_counter()
        for i in range(n):
            outs.append(fn(jax.random.key(100 + i)))
        _sync(outs[-1])
        dt = (time.perf_counter() - t0) / n
        emit(tag, {"ms": round(dt * 1e3, 1), "compile_sec": comp})
        return dt * 1e3

    # full first (compiles everything), then truncations reuse the jits
    full = chained(lambda k: call_upto(k, len(s.groups), True), "full")
    nodec = chained(lambda k: call_upto(k, len(s.groups), False), "no_decode")
    prev = chained(lambda k: call_upto(k, 0, False), "prologue_only")
    stage_ms = {}
    for g in range(1, len(s.groups)):
        t = chained(lambda k, g=g: call_upto(k, g, False), f"upto_group{g-1}")
        pns_g = [pns[si] for si in s.groups[g - 1]]
        stage_ms[f"group{g-1}_scales_{'_'.join(map(str, pns_g))}"] = \
            round(t - prev, 1)
        prev = t
    stage_ms[f"group{len(s.groups)-1}_scales_{pns[-1]}"] = round(nodec - prev, 1)
    stage_ms["epilogue_dual_decode"] = round(full - nodec, 1)
    emit("stage_deltas_ms", stage_ms)

    # dispatch-granularity A/B: per-scale vs all-fused
    for tag, groups in (("per_scale", tuple((i,) for i in range(cfg.num_scales))),
                        ("all_fused", (tuple(range(cfg.num_scales)),))):
        s2 = StepwiseCondSampler(model, vqvae, cfg_scales=(4.0, 4.0, 4.0),
                                 top_k=900, top_p=0.96, force="control",
                                 groups=groups)
        p2 = s2.prepare_params(params0)
        fn = lambda k: s2(p2, vq_params, labels, ct, k, forced_ids)
        try:
            dt = chained(fn, f"groups_{tag}")
            results[f"groups_{tag}"]["img_s"] = round(B / (dt / 1e3), 2)
            emit(f"groups_{tag}", results[f"groups_{tag}"])
        except Exception as e:
            emit(f"groups_{tag}", {"error": f"{type(e).__name__}: {str(e)[:200]}"})


if __name__ == "__main__":
    main()
