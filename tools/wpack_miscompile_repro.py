"""Repro + regression probe for the round-5 remote-TPU miscompile family.

Two independent wrong-code bugs were isolated while validating the
W-packed decoder on-chip (PERF.md §4a). Both are invisible to CPU tests
(CPU compiles every form exactly); both corrupt the SECOND channel half
of the assembled output:

  1. a 0/1 placement einsum feeding the consuming conv (mis-fused AND
     MXU-rounded) — since rewritten to static .at[].set() placement in
     ops/packed_conv.wpack_kernel;
  2. `concatenate([y[:, :, :Wp, :C], y[:, :, 1:, C:]], -1)` — a channel
     concat whose second operand is a width-shifted slice of a conv
     output (an `optimization_barrier` before the concat does NOT help;
     a roll-based equivalent fails identically; plain slices, unshifted
     concats, and .at[].set() assembly of the same values are exact).

Run on a TPU host: compares each form against the CPU backend and prints
one PASS/FAIL line per form. If `concat_shifted` ever PASSES, the
toolchain is fixed and the fast fused conv_wpacked form (git history,
round-5 commit 1ef8edd's parent) can be restored. Writes
tools/wpack_miscompile_repro.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "wpack_miscompile_repro.json")


def main() -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from controlvar_tpu.ops import packed_conv as pc

    P = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    C = 160
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(1, 8, 10, C)).astype(np.float32))
    xp = pc.wpack(x)
    Wp = xp.shape[2]
    K = jax.jit(pc.wpack_kernel)(w)

    conv = lambda h: jax.lax.conv_general_dilated(
        jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0))), K, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=P)

    def form_concat_shifted(xp):
        y = conv(xp)
        return jnp.concatenate([y[:, :, :Wp, :C], y[:, :, 1:, C:]], -1)

    def form_barrier_concat(xp):
        y = jax.lax.optimization_barrier(conv(xp))
        return jnp.concatenate([y[:, :, :Wp, :C], y[:, :, 1:, C:]], -1)

    def form_roll(xp):
        y = conv(xp)
        return jnp.concatenate(
            [y[:, :, :Wp, :C], jnp.roll(y, -1, axis=2)[:, :, :Wp, C:]], -1)

    def form_atset(xp):
        y = conv(xp)
        return y[:, :, :Wp].at[..., C:].set(y[:, :, 1:, C:])

    def form_shipped(xp):
        p = {"kernel": w, "bias": jnp.zeros((C,), jnp.float32)}
        return pc.conv_wpacked(p, xp, precision=P)

    forms = {
        "concat_shifted": form_concat_shifted,
        "barrier_concat": form_barrier_concat,
        "roll_concat": form_roll,
        "atset": form_atset,
        "shipped_conv_wpacked": form_shipped,
    }
    results = {}
    for name, f in forms.items():
        with jax.default_device(cpu):
            ref = np.asarray(jax.jit(f)(xp))
        got = np.asarray(jax.jit(f)(xp))
        rel = float(np.sqrt(((got - ref) ** 2).mean())
                    / np.sqrt((ref ** 2).mean()))
        ok = rel < 1e-4
        results[name] = {"rel_rms_vs_cpu": rel, "pass": ok}
        print(f"{'PASS' if ok else 'FAIL'} {name}: rel={rel:.6f}", flush=True)
    results["backend"] = jax.default_backend()
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
