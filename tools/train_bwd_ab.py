"""On-chip A/B: einsum attention backward (default) vs the Pallas flash
backward (CONTROLVAR_FLASH_BWD=1 + chunk-8 layer scan) on the real d16
ControlVAR train step (B=8, both tokenizer passes — reference hot loop:
train_control_var_hpu.py:130-250).

The einsum backward materializes a (B*H, L, L) fp32 logits tensor per layer
under remat; the flash backward recomputes blockwise in VMEM. The remote
Mosaic compiler hangs on the flash backward inside a lax.scan with trip
count > 8, so the flash arm sets CONTROLVAR_SCAN_CHUNK=8 (identical math,
see models/transformer._fwd_scan_chunk).

Each arm runs in its OWN subprocess (one TPU process at a time; env flags
are read at trace time; a hung compile in one arm must not poison the
other). Writes tools/train_bwd_ab.json.

Usage:  python tools/train_bwd_ab.py            # both arms + json
        python tools/train_bwd_ab.py --arm einsum|flash   # one arm, prints sec/step
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARMS = {
    "einsum": {"CONTROLVAR_FLASH_BWD": "0"},
    "flash": {"CONTROLVAR_FLASH_BWD": "1", "CONTROLVAR_SCAN_CHUNK": "8"},
    # control for the chunking itself: einsum backward under the same
    # chunk-8 scan, so the flash delta is attributable to the kernel
    "einsum_chunk8": {"CONTROLVAR_FLASH_BWD": "0",
                      "CONTROLVAR_SCAN_CHUNK": "8"},
    # the default-budget flash arm still hits Mosaic's scoped-VMEM OOM at
    # d16 shapes (the VMEM model undercounts Mosaic's per-iteration
    # temporaries); tighter budgets force smaller blocks
    "flash_b7": {"CONTROLVAR_FLASH_BWD": "1", "CONTROLVAR_SCAN_CHUNK": "8",
                 "CONTROLVAR_BWD_VMEM_BUDGET": "7000000"},
    "flash_min": {"CONTROLVAR_FLASH_BWD": "1", "CONTROLVAR_SCAN_CHUNK": "8",
                  "CONTROLVAR_BWD_VMEM_BUDGET": "1"},
}


def run_arm(depth: int, batch: int) -> float:
    sys.path.insert(0, REPO)
    import jax

    import bench
    from controlvar_tpu.config import VQVAEConfig
    from controlvar_tpu.models.vqvae import VQVAE

    vqvae = VQVAE(VQVAEConfig())
    vq_params = vqvae.init_params(jax.random.key(0))
    return bench._bench_train_step(vqvae, vq_params, depth, batch)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=sorted(ARMS), default=None)
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of arms to (re)run; merges into the json")
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    if args.arm:
        dt = run_arm(args.depth, args.batch)
        print(json.dumps({"arm": args.arm, "sec_per_step": round(dt, 4)}))
        return

    results = {}
    path0 = os.path.join(REPO, "tools", "train_bwd_ab.json")
    if args.only and os.path.exists(path0):
        with open(path0) as f:
            prior = json.load(f)
        # merge only measurements taken at the SAME config — otherwise the
        # stored arms would be silently restamped with the new depth/batch
        if (prior.get("depth") == args.depth
                and prior.get("batch") == args.batch):
            results = prior.get("arms", {})
    arms = {k: ARMS[k] for k in (args.only or ARMS)}
    sys.path.insert(0, REPO)
    from controlvar_tpu.config import EXPERIMENT_ENV_KNOBS

    base_env = {k: v for k, v in os.environ.items()
                if k not in EXPERIMENT_ENV_KNOBS}
    for arm, env in arms.items():
        cmd = [sys.executable, os.path.abspath(__file__), "--arm", arm,
               "--depth", str(args.depth), "--batch", str(args.batch)]
        try:
            r = subprocess.run(
                cmd, env={**base_env, **env}, capture_output=True,
                text=True, timeout=args.timeout)
            if r.returncode == 0:
                results[arm] = json.loads(r.stdout.strip().splitlines()[-1])
            else:
                results[arm] = {"error": (r.stderr or r.stdout)[-300:]}
        except subprocess.TimeoutExpired:
            results[arm] = {"error": f"timeout after {args.timeout}s "
                                     "(compile hang — see PERF.md §6)"}
    out = {"depth": args.depth, "batch": args.batch, "arms": results}
    path = os.path.join(REPO, "tools", "train_bwd_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
