"""Host-dispatch vs device-time split for the d16 headline (campaign3b).

The chained ablation (tools/chained_ablation.json) showed no_attn ==
full within noise: removing ALL attention + cache work does not move
chained throughput. That is only possible if the steady-state limiter is
not device compute. On this image the TPU sits behind a remote tunnel —
every jitted call is an RPC — so the prime suspect is HOST DISPATCH.

This probe measures, after compile+warmup:
  * dispatch_ms: wall time of one batch's worth of jitted calls with NO
    readback (enqueue-only; async dispatch returns when the RPC is sent);
  * steady_ms:   chained time/batch over n batches, one final readback
    (the bench methodology — max(device, host dispatch));
  * argsonly_ms: the sampler's python arg-prep without executing calls
    (monkeypatched no-op fns) — pure python overhead.

If dispatch_ms ~= steady_ms the pipeline is host-bound and the lever is
fewer/cheaper dispatches, not device FLOPs. Writes tools/dispatch_probe.json.
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
                   "dispatch_probe.json")
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

    B = 16
    cfg = control_var_config_from_depth(16, multi_cond=True)
    vqvae = VQVAE(VQVAEConfig())
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(cfg)
    params0 = model.init_params(jax.random.key(1))
    sampler = StepwiseCondSampler(model, vqvae, cfg_scales=(4.0, 4.0, 4.0),
                                  top_k=900, top_p=0.96, force="control")
    params = sampler.prepare_params(params0)
    labels = jnp.arange(B, dtype=jnp.int32) % cfg.num_classes
    ct = jnp.zeros((B,), jnp.int32)
    rng = np.random.default_rng(0)
    c_mask = [jnp.asarray(rng.integers(0, cfg.vocab_size, (B, pn * pn))
                          .astype(np.int32)) for pn in cfg.patch_nums]
    call = lambda k: sampler(params, vq_params, labels, ct, k, c_mask)

    t0 = time.time()
    _sync(call(jax.random.key(7)))
    emit("compile_sec", round(time.time() - t0, 1))

    # steady-state chained (bench methodology)
    n = 6
    outs = []
    t0 = time.perf_counter()
    for i in range(n):
        outs.append(call(jax.random.key(100 + i)))
    _sync(outs[-1])
    steady = (time.perf_counter() - t0) / n
    emit("steady_ms", round(steady * 1e3, 1))

    # enqueue-only: wall time to dispatch one batch, NO readback. Drop the
    # returned arrays immediately; measure over several batches.
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        out = call(jax.random.key(200 + i))
        times.append(time.perf_counter() - t0)
        del out
    emit("dispatch_ms_per_batch", [round(t * 1e3, 1) for t in times])
    _sync(call(jax.random.key(999)))  # drain

    # per-call dispatch split: time each jitted fn's enqueue separately
    per_call = {}

    def wrap(fn, name):
        def f(*a, **k):
            t = time.perf_counter()
            out = fn(*a, **k)
            per_call[name] = per_call.get(name, 0.0) + \
                (time.perf_counter() - t)
            return out
        return f

    sampler._prologue = wrap(sampler._prologue, "prologue")
    sampler._group_fns = [wrap(fn, f"group{i}")
                          for i, fn in enumerate(sampler._group_fns)]
    sampler._epilogue = wrap(sampler._epilogue, "epilogue")
    m = 4
    for i in range(m):
        out = call(jax.random.key(300 + i))
    _sync(out)
    emit("per_call_enqueue_ms",
         {k: round(v / m * 1e3, 1) for k, v in per_call.items()})


if __name__ == "__main__":
    main()
