"""Chained-methodology ablation of the d16 headline (campaign3 follow-up).

tools/profile_decode.py times each stage with a per-call readback; on this
tunnel that costs ~50 ms per sync PLUS serializes dispatch, inflating every
stage (~200 ms/scale-group vs ~50 ms amortized in the bench's chained
loop). Arm DELTAS under one methodology are still valid, but to attribute
the production number itself the ablations must run exactly like the bench:
n async batches, one readback (bench._time).

Each arm runs in its own subprocess (CONTROLVAR_ABLATE is read at trace
time; one TPU process at a time). Writes tools/chained_ablation.json.

Arms (hooks in models/transformer.blocks_decode — the production scan
path — and blocks_decode_unrolled):
  full            production path
  no_attn         o = q; no cache ops (attention kernel+read+write+layout)
  attn_nocache    current-scale attention only (no prefix read), writes kept
  no_cache_write  full attention incl. prefix read, DUS writes skipped
                  (prefix reads stale zeros — timing only)
  xla_attn        CONTROLVAR_DECODE_KERNEL=0: XLA einsum attention instead
                  of the Pallas decode kernel (per-layer cache unpack copy;
                  documented OOM risk at the largest scales)

Decomposition (ms/batch): full−attn_nocache = prefix read+flops;
attn_nocache−no_attn = writes + current-scale kernel + head pairing;
full−no_cache_write = DUS write cost; xla_attn−full = Pallas vs XLA.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARM_ENVS = {
    "full": {},
    "no_attn": {"CONTROLVAR_ABLATE": "no_attn", "CONTROLVAR_ABLATE_OK": "1"},
    "attn_nocache": {"CONTROLVAR_ABLATE": "attn_nocache", "CONTROLVAR_ABLATE_OK": "1"},
    "no_cache_write": {"CONTROLVAR_ABLATE": "no_cache_write", "CONTROLVAR_ABLATE_OK": "1"},
    "xla_attn": {"CONTROLVAR_DECODE_KERNEL": "0"},
}
ARMS = list(ARM_ENVS)


def run_arm() -> dict:
    sys.path.insert(0, REPO)
    import jax

    import bench
    from controlvar_tpu.config import VQVAEConfig
    from controlvar_tpu.models.vqvae import VQVAE

    vqvae = VQVAE(VQVAEConfig())
    vq_params = vqvae.init_params(jax.random.key(0))
    return bench.bench_cond_d16(vqvae, vq_params)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=ARMS, default=None)
    ap.add_argument("--arms", nargs="*", choices=ARMS, default=None,
                    help="subset of arms to (re)run; merges into the json")
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    if args.arm:
        print(json.dumps(run_arm()))
        return

    path = os.path.join(REPO, "tools", "chained_ablation.json")
    results = {}
    if args.arms and os.path.exists(path):
        with open(path) as f:
            results = json.load(f)
    for arm in (args.arms or ARMS):
        env = dict(os.environ)
        env.pop("CONTROLVAR_ABLATE", None)
        env.pop("CONTROLVAR_DECODE_KERNEL", None)
        env.update(ARM_ENVS[arm])
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--arm", arm],
                env=env, capture_output=True, text=True,
                timeout=args.timeout)
            if r.returncode == 0:
                results[arm] = json.loads(r.stdout.strip().splitlines()[-1])
            else:
                results[arm] = {"error": (r.stderr or r.stdout)[-300:]}
        except subprocess.TimeoutExpired:
            results[arm] = {"error": f"timeout after {args.timeout}s"}
        print(arm, results[arm], flush=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
