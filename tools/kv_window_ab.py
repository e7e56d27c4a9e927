"""On-chip campaign 7: scale-aware KV window A/B on the d16 headline.

seg-cache baseline vs kv_window in {2, 3}, chained timing, B=16.
Run AFTER campaign6/bench (separate process).
"""
import json
import sys
import time

sys.path.insert(0, '/root/repo')


def emit(tag, obj):
    with open("/tmp/kv_window_ab.json", "a") as f:
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
from controlvar_tpu.eval import stepwise as sw
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.vqvae import VQVAE

B = 16
cfg = control_var_config_from_depth(16, multi_cond=True)
vqvae = VQVAE(VQVAEConfig())
vq_params = vqvae.init_params(jax.random.key(0))
model = ControlVARModel(cfg)
params0 = model.init_params(jax.random.key(1))
labels = jnp.arange(B, dtype=jnp.int32) % cfg.num_classes
ct = jnp.zeros((B,), jnp.int32)
rng = np.random.default_rng(0)
c_mask = [jnp.asarray(rng.integers(0, cfg.vocab_size, (B, pn * pn))
                      .astype(np.int32)) for pn in cfg.patch_nums]

for kv_window in (None, 3, 2):
    s = sw.StepwiseCondSampler(model, vqvae, cfg_scales=(4.0, 4.0, 4.0),
                               top_k=900, top_p=0.96, force="control",
                               cache_mode="seg", kv_window=kv_window)
    params = s.prepare_params(params0)
    call = lambda k: s(params, vq_params, labels, ct, k, c_mask)
    t0 = time.time()
    _sync(call(jax.random.key(7)))
    compile_s = round(time.time() - t0, 1)
    outs = []
    t0 = time.perf_counter()
    for i in range(4):
        outs.append(call(jax.random.key(100 + i)))
    _sync(outs[-1])
    dt = (time.perf_counter() - t0) / 4
    emit(f"kv_window_{kv_window}", {"ms": round(dt * 1e3, 1),
                                    "img_s": round(B / dt, 2),
                                    "compile_sec": compile_s})
