"""On-chip sweep of CONTROLVAR_XLA_SMALL: mixed decode-attention dispatch.

Steps whose post-step prefix length `cur` is <= the threshold take the XLA
einsum attention path (fuses into the scan body — no Pallas kernel launch);
bigger steps keep the Pallas decode kernel. PERF.md §3 attributes
~0.7 ms/layer-step of FIXED kernel-launch cost (113 ms/batch over 160
launches on the d16 headline); at the smallest scales that overhead rivals
the attention math, so routing them to XLA trades the launch for a (cheap,
at tiny Lk) cache unpack/relayout.

d16 ControlVAR `cur` ladder (2*pn^2 tokens/scale): 2, 10, 28, 60, 110, 182,
310, 510, 848, 1360 — a threshold of e.g. 310 sends the 7 smallest scales
to XLA. Each arm runs the full headline pipeline (bench.bench_cond_d16) in
its OWN subprocess (the env var is read at trace time). Writes
tools/xla_small_sweep.json incrementally.

Usage:  python tools/xla_small_sweep.py                  # default ladder
        python tools/xla_small_sweep.py 0 110 310 510    # explicit arms
        python tools/xla_small_sweep.py --arm 310        # one arm (internal)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tools", "xla_small_sweep.json")

DEFAULT_ARMS = [0, 60, 110, 182, 310, 510]


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
    if "--arm" in sys.argv:
        run_arm()
        return
    arms = [int(a) for a in sys.argv[1:]] or DEFAULT_ARMS
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for thr in arms:
        env = {**os.environ, "CONTROLVAR_XLA_SMALL": str(thr)}
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--arm", str(thr)],
                env=env, capture_output=True, text=True, timeout=1200)
            if r.returncode == 0:
                results[str(thr)] = json.loads(r.stdout.strip().splitlines()[-1])
            else:
                results[str(thr)] = {"error": (r.stderr or r.stdout)[-300:]}
        except subprocess.TimeoutExpired:
            results[str(thr)] = {"error": "timeout after 1200s"}
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(thr, results[str(thr)], flush=True)


if __name__ == "__main__":
    main()
