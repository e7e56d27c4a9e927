"""Generic on-chip headline A/B: run bench.bench_cond_d16 under named env
combinations, each in its own subprocess (decode-path env knobs are read at
trace time; a hung compile in one arm must not poison the others).

Usage:
    python tools/headline_ab.py baseline inplace            # named arms
    python tools/headline_ab.py --list                      # show arms
    python tools/headline_ab.py --arm-env                   # internal

Writes tools/headline_ab.json incrementally (merging over prior runs, so
interrupted sweeps resume).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tools", "headline_ab.json")

ARMS = {
    "baseline": {},
    "inplace": {"CONTROLVAR_INPLACE_DECODE": "1"},
    "inv": {"CONTROLVAR_INV_DECODE": "1"},
    "inv_wpack": {"CONTROLVAR_INV_DECODE": "1", "CONTROLVAR_WPACK": "1"},
    "wpack": {"CONTROLVAR_WPACK": "1"},
    "xla_small_310": {"CONTROLVAR_XLA_SMALL": "310"},
    "inplace_xla60": {"CONTROLVAR_INPLACE_DECODE": "1",
                      "CONTROLVAR_XLA_SMALL": "60"},
    "inplace_xla110": {"CONTROLVAR_INPLACE_DECODE": "1",
                       "CONTROLVAR_XLA_SMALL": "110"},
    "inplace_xla310": {"CONTROLVAR_INPLACE_DECODE": "1",
                       "CONTROLVAR_XLA_SMALL": "310"},
    "inplace_wpack_xla": {"CONTROLVAR_INPLACE_DECODE": "1",
                          "CONTROLVAR_WPACK": "1",
                          "CONTROLVAR_XLA_SMALL": "110"},
}


def run_arm() -> None:
    sys.path.insert(0, REPO)
    import jax

    import bench
    from controlvar_tpu.config import VQVAEConfig
    from controlvar_tpu.models.vqvae import VQVAE

    vqvae = VQVAE(VQVAEConfig())
    vq_params = vqvae.init_params(jax.random.key(0))
    res = bench.bench_cond_d16(vqvae, vq_params)
    print(json.dumps(res))


def main() -> None:
    if "--arm-env" in sys.argv:
        run_arm()
        return
    if "--list" in sys.argv:
        print(json.dumps(ARMS, indent=1))
        return
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or ["baseline",
                                                                   "inplace"]
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for name in names:
        env = {**os.environ, **ARMS[name]}
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--arm-env"],
                env=env, capture_output=True, text=True, timeout=1500)
            if r.returncode == 0:
                results[name] = {
                    "env": ARMS[name],
                    **json.loads(r.stdout.strip().splitlines()[-1]),
                }
            else:
                results[name] = {"env": ARMS[name],
                                 "error": (r.stderr or r.stdout)[-300:]}
        except subprocess.TimeoutExpired:
            results[name] = {"env": ARMS[name], "error": "timeout after 1500s"}
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(name, results[name], flush=True)


if __name__ == "__main__":
    main()
