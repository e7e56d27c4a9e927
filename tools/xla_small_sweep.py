"""On-chip sweep of CONTROLVAR_XLA_SMALL: mixed decode-attention dispatch.

Steps whose post-step prefix length `cur` is <= the threshold take the XLA
einsum attention path (fuses into the scan body — no Pallas kernel launch);
bigger steps keep the Pallas decode kernel. PERF.md §3 attributes
~0.7 ms/layer-step of FIXED kernel-launch cost; at the smallest scales that
overhead rivals the attention math.

ROUND-5 RESULT (tools/xla_small_sweep.json): measured NEGATIVE at every
threshold — 25.52 img/s baseline vs 24.12 / OOM / 23.24 / 23.32 / 21.87 at
60/110/182/310/510. The cache unpack/relayout the XLA path pays exceeds the
launch cost it saves even at the tiniest scales. Kept for future
toolchains.

d16 ControlVAR `cur` ladder (2*pn^2 tokens/scale): 2, 10, 28, 60, 110, 182,
310, 510, 848, 1360. Arms run through tools/headline_ab.run_arms (one
sanitized subprocess per arm, incremental json merge).

Usage:  python tools/xla_small_sweep.py                  # default ladder
        python tools/xla_small_sweep.py 0 110 310 510    # explicit arms
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tools", "xla_small_sweep.json")

DEFAULT_ARMS = [0, 60, 110, 182, 310, 510]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from headline_ab import run_arms

    arms = [int(a) for a in sys.argv[1:]] or DEFAULT_ARMS
    run_arms({str(t): {"CONTROLVAR_XLA_SMALL": str(t)} for t in arms},
             OUT, timeout=1200)


if __name__ == "__main__":
    main()
