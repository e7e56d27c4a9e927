"""On-chip A/B: rematerialization policy for the train-step layer scan
(CONTROLVAR_REMAT, models/transformer._remat_wrap) on the real d16
ControlVAR train step (reference hot loop: train_control_var_hpu.py:130-250).

The default full remat saves only the per-layer residual stream and
recomputes everything else in the backward — 26.07 executed vs 20.64 model
TFLOP/step (PERF.md §8), i.e. ~26% of the step's FLOPs are recompute. The
'dots' policy (jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
saves the qkv/proj/FFN weight-matmul outputs (~200 MB/layer bf16 at d16
B=8 L=1360) so the backward reuses them; 'dots_attn' additionally saves the
named attention output (checkpoint_name 'attn_out', ~22 MB/layer) so the
flash forward kernel is not re-run either. Gradients are bitwise identical
across modes (tests/test_transformer.py::test_remat_policy_same_grads) —
the policy changes WHAT is saved, never the math.

Each arm runs in its OWN subprocess (env read at trace time; an OOM in one
arm must not poison another). Writes tools/remat_ab.json. Arms run both
pixel and pre-tokenized steps so the winner can be read for either
production mode.

Usage:  python tools/remat_ab.py                  # all arms + json
        python tools/remat_ab.py --arm dots       # one arm, prints sec/step
        python tools/remat_ab.py --only dots_attn # rerun subset, merge json
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARMS = {
    "full": {"CONTROLVAR_REMAT": "full"},
    "dots": {"CONTROLVAR_REMAT": "dots"},
    "dots_attn": {"CONTROLVAR_REMAT": "dots_attn"},
}


def run_arm(depth: int, batch: int, from_tokens: bool) -> float:
    sys.path.insert(0, REPO)
    import jax

    import bench
    from controlvar_tpu.config import VQVAEConfig
    from controlvar_tpu.models.vqvae import VQVAE

    vqvae = VQVAE(VQVAEConfig())
    vq_params = vqvae.init_params(jax.random.key(0))
    return bench._bench_train_step(vqvae, vq_params, depth, batch,
                                   from_tokens=from_tokens)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=sorted(ARMS), default=None)
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of arms to (re)run; merges into the json")
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tokens", action="store_true",
                    help="(with --arm) time the pre-tokenized step")
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    if args.arm:
        dt = run_arm(args.depth, args.batch, args.tokens)
        print(json.dumps({"arm": args.arm, "sec_per_step": round(dt, 4)}))
        return

    results = {}
    path = os.path.join(REPO, "tools", "remat_ab.json")
    if args.only and os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
        if (prior.get("depth") == args.depth
                and prior.get("batch") == args.batch):
            results = prior.get("arms", {})
    arms = {k: ARMS[k] for k in (args.only or ARMS)}
    sys.path.insert(0, REPO)
    from controlvar_tpu.config import EXPERIMENT_ENV_KNOBS

    base_env = {k: v for k, v in os.environ.items()
                if k not in EXPERIMENT_ENV_KNOBS}
    for arm, env in arms.items():
        entry = {}
        for mode, extra in (("pixel", []), ("tokens", ["--tokens"])):
            cmd = [sys.executable, os.path.abspath(__file__), "--arm", arm,
                   "--depth", str(args.depth), "--batch", str(args.batch),
                   *extra]
            try:
                r = subprocess.run(
                    cmd, env={**base_env, **env}, capture_output=True,
                    text=True, timeout=args.timeout)
                if r.returncode == 0:
                    out = json.loads(r.stdout.strip().splitlines()[-1])
                    entry[mode] = out["sec_per_step"]
                else:
                    entry[mode] = {"error": (r.stderr or r.stdout)[-300:]}
            except subprocess.TimeoutExpired:
                entry[mode] = {"error": f"timeout after {args.timeout}s"}
        results[arm] = entry
    out = {"depth": args.depth, "batch": args.batch, "arms": results}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
