"""On-chip campaign 7: scale-aware KV window A/B on the d16 headline.

seg-cache baseline vs kv_window in {2, 3}: chained throughput AND output
drift vs the full cache at the SAME key (the feature is lossy — users need
both sides of the trade before flipping --kv_window):

  * fh_flip_frac  — fraction of final-f_hat spatial positions whose feature
    vector changed (token flips propagate to positions through the
    multi-scale refinement; 0.0 = bit-identical token stream)
  * pixel_mae / psnr_db — decoded-image drift ([0,1] scale; decode is
    deterministic given f_hat)

Writes tools/kv_window_ab.json (committed evidence, PERF.md §9).
Run alone (one TPU process at a time).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "kv_window_ab.json")
results = {}


def emit(tag, obj):
    results[tag] = obj
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(tag, obj, flush=True)


import jax
import jax.numpy as jnp
import numpy as np


def _boost_gates(params):
    """Set the AdaLN gamma-gate biases to 1.0 (trained-scale gates).

    At init the gamma rows are scaled by aln_gamma_init=1e-3 (reference
    zero-ish AdaLN init), which gates every block's attention/FFN residual
    to ~0 — with random-init weights, dropping KV context then changes
    nothing and the drift measure is vacuous (first run of this tool
    reported fh_flip_frac=0.0 at every window for exactly this reason).
    With bias[:, :2C]=1.0 the gates are O(1) as in a trained net and the
    drift readout is meaningful. Timing is unaffected (same program)."""
    blocks = dict(params["blocks"])
    if "ada_lin" in blocks:
        ada = dict(blocks["ada_lin"])
        C2 = ada["bias"].shape[-1] // 3  # 6C total; gamma rows are [:2C]
        ada["bias"] = ada["bias"].at[:, :C2].set(1.0)
        blocks["ada_lin"] = ada
    elif "ada_gss" in blocks:
        blocks["ada_gss"] = blocks["ada_gss"].at[:, :2].add(1.0)
    out = dict(params)
    out["blocks"] = blocks
    return out


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
params0 = _boost_gates(model.init_params(jax.random.key(1)))
labels = jnp.arange(B, dtype=jnp.int32) % cfg.num_classes
ct = jnp.zeros((B,), jnp.int32)
rng = np.random.default_rng(0)
c_mask = [jnp.asarray(rng.integers(0, cfg.vocab_size, (B, pn * pn))
                      .astype(np.int32)) for pn in cfg.patch_nums]

ref_fh = None    # full-cache f_hats + images at the drift key
ref_img = None
DRIFT_KEY = jax.random.key(424242)

for kv_window in (None, 3, 2):
    s = sw.StepwiseCondSampler(model, vqvae, cfg_scales=(4.0, 4.0, 4.0),
                               top_k=900, top_p=0.96, force="control",
                               cache_mode="seg", kv_window=kv_window)
    params = s.prepare_params(params0)
    call = lambda k, **kw: s(params, vq_params, labels, ct, k, c_mask, **kw)
    t0 = time.time()
    _sync(call(jax.random.key(7)))
    compile_s = round(time.time() - t0, 1)
    outs = []
    t0 = time.perf_counter()
    for i in range(4):
        outs.append(call(jax.random.key(100 + i)))
    _sync(outs[-1])
    dt = (time.perf_counter() - t0) / 4
    entry = {"ms": round(dt * 1e3, 1), "img_s": round(B / dt, 2),
             "compile_sec": compile_s}

    # drift vs the full cache, same key: the ONLY difference is the window
    fh_c, fh_i = call(DRIFT_KEY, decode_img=False)
    img_c, img_i = call(DRIFT_KEY)
    fh = np.asarray(jnp.concatenate([fh_c, fh_i], axis=0), dtype=np.float32)
    img = np.asarray(jnp.concatenate([img_c, img_i], axis=0),
                     dtype=np.float32)
    if kv_window is None:
        ref_fh, ref_img = fh, img
        entry["drift"] = "reference (full cache)"
    else:
        flip = (np.abs(fh - ref_fh).max(axis=-1) > 0).mean()
        mae = float(np.abs(img - ref_img).mean())
        mse = float(((img - ref_img) ** 2).mean())
        psnr = float(10 * np.log10(1.0 / mse)) if mse > 0 else float("inf")
        entry["drift"] = {"fh_flip_frac": round(float(flip), 4),
                          "pixel_mae": round(mae, 4),
                          "psnr_db": round(psnr, 1)}
    emit(f"kv_window_{kv_window}", entry)
