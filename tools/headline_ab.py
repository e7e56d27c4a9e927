"""Generic on-chip headline A/B: run bench.bench_cond_d16 under named env
combinations, each in its own subprocess (decode-path env knobs are read at
trace time; a hung compile in one arm must not poison the others).

Every arm subprocess starts from a SANITIZED environment — all
EXPERIMENT_ENV_KNOBS are stripped before the arm's own env is applied — so
a stale shell export can never make the 'baseline' arm silently measure a
variant (round-5 review finding).

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


def _sanitized_env(arm_env: dict) -> dict:
    sys.path.insert(0, REPO)
    from controlvar_tpu.config import EXPERIMENT_ENV_KNOBS

    env = {k: v for k, v in os.environ.items()
           if k not in EXPERIMENT_ENV_KNOBS}
    env.update(arm_env)
    return env


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


def run_arms(arms: dict, out_path: str, timeout: int = 1500) -> dict:
    """Run each named arm (name -> env dict) in a sanitized subprocess;
    merge results incrementally into out_path."""
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    for name, arm_env in arms.items():
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--arm-env"],
                env=_sanitized_env(arm_env), capture_output=True, text=True,
                timeout=timeout)
            if r.returncode == 0:
                results[name] = {
                    "env": arm_env,
                    **json.loads(r.stdout.strip().splitlines()[-1]),
                }
            else:
                results[name] = {"env": arm_env,
                                 "error": (r.stderr or r.stdout)[-300:]}
        except subprocess.TimeoutExpired:
            results[name] = {"env": arm_env,
                             "error": f"timeout after {timeout}s"}
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(name, results[name], flush=True)
    return results


def main() -> None:
    if "--arm-env" in sys.argv:
        run_arm()
        return
    if "--list" in sys.argv:
        print(json.dumps(ARMS, indent=1))
        return
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or ["baseline",
                                                                   "inplace"]
    unknown = [n for n in names if n not in ARMS]
    if unknown:
        raise SystemExit(
            f"unknown arm(s) {unknown}; valid: {sorted(ARMS)}")
    run_arms({n: ARMS[n] for n in names}, OUT)


if __name__ == "__main__":
    main()
