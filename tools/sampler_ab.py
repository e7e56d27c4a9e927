"""On-chip A/B: sort vs bisect sampler (ops/sample_kernel.py).

1. standalone sample_top_k_top_p at the exact per-scale pipeline shapes,
   chained timing, both methods
2. full d16 conditional headline pipeline with CONTROLVAR_SAMPLER=bisect
   (compare vs the 22.37 img/s sort baseline)
"""
import json
import sys
import time

sys.path.insert(0, '/root/repo')


import os
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "sampler_ab.json")
open(OUT, "w").close()  # one run per file: stale records mislead analysis


def emit(tag, obj):
    with open(OUT, "a") as f:
        f.write(json.dumps({tag: obj}) + "\n")
    print(tag, obj, flush=True)


import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf))


t0 = time.time()
_sync(jnp.ones((256, 256), jnp.bfloat16) @ jnp.ones((256, 256), jnp.bfloat16))
emit("probe", {"sec": round(time.time() - t0, 1)})

from controlvar_tpu.config import VQVAEConfig, control_var_config_from_depth
from controlvar_tpu.ops.sampling import sample_top_k_top_p

B = 16
cfg = control_var_config_from_depth(16, multi_cond=True)

# ---- toolchain guard: tiny standalone bisect kernel first ----------------
try:
    from controlvar_tpu.ops.sample_kernel import sample_top_k_top_p_bisect
    tiny = jax.random.normal(jax.random.key(0), (16, 4096), jnp.float32)
    t0 = time.time()
    ids = sample_top_k_top_p_bisect(jax.random.key(1), tiny, 900, 0.96)
    _sync(ids.astype(jnp.float32))
    emit("bisect_guard", {"compile_sec": round(time.time() - t0, 1)})
except Exception as e:
    emit("bisect_guard", {"error": f"{type(e).__name__}: {str(e)[:200]}"})
    sys.exit(1)

# ---- standalone sampling A/B at exact pipeline shapes --------------------
for method in ("sort", "bisect"):
    samp = jax.jit(lambda k, x: sample_top_k_top_p(k, x, 900, 0.96,
                                                   method=method))
    tot = 0.0
    for si in range(cfg.num_scales):
        l = cfg.patch_nums[si] ** 2
        logits = jax.random.normal(jax.random.key(1), (2 * B, 3 * l, 4096),
                                   jnp.float32)
        _sync(samp(jax.random.key(0), logits))
        outs = []
        t0 = time.perf_counter()
        for i in range(6):
            outs.append(samp(jax.random.key(2 + i), logits))
        _sync(outs[-1])
        tot += (time.perf_counter() - t0) / 6
    emit(f"sampling_all_scales_{method}", {"ms": round(tot * 1e3, 1)})

# ---- device_prng variant: validate + time ---------------------------------
from controlvar_tpu.ops.sample_kernel import kept_mask
try:
    big = jax.random.normal(jax.random.key(2), (2 * B, 3 * 256, 4096),
                            jnp.float32)
    f_prng = jax.jit(lambda k, x: sample_top_k_top_p_bisect(
        k, x, 900, 0.96, device_prng=True))
    ids = f_prng(jax.random.key(3), big)
    _sync(ids.astype(jnp.float32))
    # membership: every drawn id is in the kept set computed by the same
    # bisection math in plain XLA
    km = jax.jit(lambda x: kept_mask(x.reshape(-1, 4096), 900, 0.96, 26))(big)
    member = jnp.take_along_axis(km, ids.reshape(-1, 1), axis=-1)
    ok = bool(jnp.all(member))
    # determinism + key sensitivity
    same = bool(jnp.all(f_prng(jax.random.key(3), big) == ids))
    diff = bool(jnp.any(f_prng(jax.random.key(4), big) != ids))
    outs = []
    t0 = time.perf_counter()
    for i in range(8):
        outs.append(f_prng(jax.random.key(10 + i), big))
    _sync(outs[-1].astype(jnp.float32))
    emit("device_prng_biggest_scale", {
        "ms": round((time.perf_counter() - t0) / 8 * 1e3, 2),
        "membership_ok": ok, "deterministic": same, "key_sensitive": diff})
except Exception as e:
    emit("device_prng_biggest_scale",
         {"error": f"{type(e).__name__}: {str(e)[:200]}"})

# ---- RNG cost: standalone gumbel at the biggest per-scale shape -----------
gum = jax.jit(lambda k: jax.random.gumbel(k, (2 * B, 3 * 256, 4096),
                                          jnp.float32))
_sync(gum(jax.random.key(0)))
outs = []
t0 = time.perf_counter()
for i in range(8):
    outs.append(gum(jax.random.key(i)))
_sync(outs[-1])
emit("gumbel_biggest_scale", {"ms": round((time.perf_counter() - t0) / 8 * 1e3, 2)})

# ---- full headline pipeline with bisect sampler ---------------------------
import controlvar_tpu.ops.sampling as sampling_mod
sampling_mod.DEFAULT_METHOD = "bisect"

from controlvar_tpu.eval import stepwise as sw
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.vqvae import VQVAE

vqvae = VQVAE(VQVAEConfig())
vq_params = vqvae.init_params(jax.random.key(0))
model = ControlVARModel(cfg)
params0 = model.init_params(jax.random.key(1))
labels = jnp.arange(B, dtype=jnp.int32) % cfg.num_classes
ct = jnp.zeros((B,), jnp.int32)
rng = np.random.default_rng(0)
c_mask = [jnp.asarray(rng.integers(0, cfg.vocab_size, (B, pn * pn))
                      .astype(np.int32)) for pn in cfg.patch_nums]

s = sw.StepwiseCondSampler(model, vqvae, cfg_scales=(4.0, 4.0, 4.0),
                           top_k=900, top_p=0.96, force="control")
params = s.prepare_params(params0)
call = lambda k: s(params, vq_params, labels, ct, k, c_mask)
t0 = time.time()
_sync(call(jax.random.key(7)))
emit("bisect_pipeline_compile", {"sec": round(time.time() - t0, 1)})
# chained steady-state: 4 batches in flight, one readback
outs = []
t0 = time.perf_counter()
for i in range(4):
    outs.append(call(jax.random.key(100 + i)))
_sync(outs[-1])
dt = (time.perf_counter() - t0) / 4
emit("bisect_pipeline", {"ms": round(dt * 1e3, 1),
                         "img_s": round(B / dt, 2)})
