"""On-chip A/B: pixel-input train step (two frozen VQVAE encoder passes per
step, the reference's semantics — train_control_var_hpu.py:130-250) vs the
PRE-TOKENIZED step (`from_tokens=True`, fed by `pretokenize` shards via
`data.shards.TokenShardLoader`) — a TPU accelerant the reference lacks.

PERF.md §8 attributes part of the train-MFU gap to the two tokenizer passes;
this tool measures exactly what removing them buys. The token arm feeds the
step per-scale id lists (what the shards store); the remaining in-step
tokenizer work is the cheap frozen ids→embedding lookup (ids_to_var_input).

Also lowers the token step on the CPU backend (roofline methodology,
tools/roofline.py) for its model/executed TFLOPs, so the json carries the
token-path MFU on the same 244-TFLOP/s footing as §8.

Each timed arm runs in its OWN subprocess (env hygiene; a wedged compile in
one arm must not poison the other). Writes tools/token_train_ab.json.

Usage:  python tools/token_train_ab.py                 # both arms + flops
        python tools/token_train_ab.py --arm pixel|tokens
        python tools/token_train_ab.py --flops          # CPU lowering only
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V5E_SUSTAINED_TFLOPS = 244.0  # measured on this image's chip (PERF.md §1)


def run_arm(arm: str, depth: int, B: int) -> float:
    import jax

    import bench
    from controlvar_tpu.config import VQVAEConfig
    from controlvar_tpu.models.vqvae import VQVAE

    vqvae = VQVAE(VQVAEConfig())
    vq_params = vqvae.init_params(jax.random.key(0))
    return bench._bench_train_step(vqvae, vq_params, depth, B,
                                   from_tokens=(arm == "tokens"))


def token_step_flops(depth: int, B: int) -> dict:
    """Token-step model/executed TFLOPs via the roofline methodology
    (CPU lowering, trip-1 scan chunks so cost_analysis counts every layer)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from controlvar_tpu.config import (OptimConfig, VQVAEConfig,
                                       control_var_config_from_depth)
    from controlvar_tpu.models import transformer as tfm
    from controlvar_tpu.models.control_var import ControlVARModel
    from controlvar_tpu.models.vqvae import VQVAE
    from controlvar_tpu.train.train_step import (ControlVARTrainStep,
                                                 TrainState, make_optimizer)
    from tools.roofline import _flops

    os.environ["CONTROLVAR_SCAN_CHUNK"] = "1"  # read at trace time
    orig = tfm.blocks_forward
    try:
        vqvae = VQVAE(VQVAEConfig())
        vq_params = jax.eval_shape(vqvae.init_params, jax.random.key(0))
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
        ids = [jax.ShapeDtypeStruct((B, pn * pn), jnp.int32)
               for pn in cfg.patch_nums]
        batch = {
            "ctrl_ids": ids, "img_ids": ids,
            "cls": jax.ShapeDtypeStruct((B,), jnp.int32),
            "type": jax.ShapeDtypeStruct((B,), jnp.int32),
        }
        key = jax.eval_shape(lambda: jax.random.key(0))
        out = {}
        for remat, name in ((True, "executed"), (False, "model")):
            tfm.blocks_forward = functools.partial(orig, remat=remat)
            step = jax.jit(lambda s, vp, b, k: stepper.step(
                tx, s, vp, b, k, from_tokens=True))
            out[f"tflop_per_step_{name}"] = _flops(
                step, state, vq_params, batch, key) / 1e12
        return out
    finally:
        tfm.blocks_forward = orig
        del os.environ["CONTROLVAR_SCAN_CHUNK"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=("pixel", "tokens"), default=None)
    ap.add_argument("--flops", action="store_true")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of {pixel,tokens,flops} to (re)run; "
                         "merges into the existing json (same-config only)")
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    if args.arm:
        dt = run_arm(args.arm, args.depth, args.batch)
        print(json.dumps({"arm": args.arm, "sec_per_step": round(dt, 4)}))
        return
    if args.flops:
        print(json.dumps(token_step_flops(args.depth, args.batch)))
        return

    from controlvar_tpu.config import EXPERIMENT_ENV_KNOBS

    base_env = {k: v for k, v in os.environ.items()
                if k not in EXPERIMENT_ENV_KNOBS}
    results, flops = {}, None
    path = os.path.join(REPO, "tools", "token_train_ab.json")
    if args.only and os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
        # merge only same-config measurements (as tools/train_bwd_ab.py)
        if (prior.get("depth") == args.depth
                and prior.get("batch") == args.batch):
            results = prior.get("arms", {})
            flops = prior.get("token_step_flops")
    todo = args.only if args.only is not None else ["pixel", "tokens", "flops"]
    for arm in [a for a in ("pixel", "tokens") if a in todo]:
        cmd = [sys.executable, os.path.abspath(__file__), "--arm", arm,
               "--depth", str(args.depth), "--batch", str(args.batch)]
        try:
            r = subprocess.run(cmd, env=base_env, capture_output=True,
                               text=True, timeout=args.timeout)
            if r.returncode == 0:
                results[arm] = json.loads(r.stdout.strip().splitlines()[-1])
            else:
                results[arm] = {"error": (r.stderr or r.stdout)[-300:]}
        except subprocess.TimeoutExpired:
            results[arm] = {"error": f"timeout after {args.timeout}s"}
    if "flops" in todo or flops is None:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--flops",
                 "--depth", str(args.depth), "--batch", str(args.batch)],
                env={**base_env, "JAX_PLATFORMS": "cpu"}, capture_output=True,
                text=True, timeout=args.timeout)
            flops = (json.loads(r.stdout.strip().splitlines()[-1])
                     if r.returncode == 0
                     else {"error": (r.stderr or r.stdout)[-300:]})
        except subprocess.TimeoutExpired:
            flops = {"error": f"timeout after {args.timeout}s"}
    out = {"depth": args.depth, "batch": args.batch, "arms": results,
           "token_step_flops": flops}
    sec = results.get("tokens", {}).get("sec_per_step")
    model_tf = flops.get("tflop_per_step_model")
    if sec and model_tf:
        out["token_train_mfu_at_244tflops"] = round(
            model_tf / sec / V5E_SUSTAINED_TFLOPS, 4)
    path = os.path.join(REPO, "tools", "token_train_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
