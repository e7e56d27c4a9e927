"""Micro-benchmark: XLA conv efficiency vs channel count on v5e.

The VQVAE decoder's 256^2 stage (ch=160, 56% of decoder FLOPs) measures at
~39-43% of the chip's matmul rate (PERF.md section 3/4). Hypothesis: 160
channels waste 3/8 of the 128-lane MXU tile on BOTH the contraction and
output dims. This tool measures the same-FLOP conv at different
channel/spatial trade-offs to find the efficiency frontier before
committing to a packed-decoder rewrite:

  a) 3x3 conv 160->160 @ 256^2 (the production shape)
  b) 3x3 conv 320->320 @ 128^2 (same FLOPs, 2.5-tile channels)
  c) 3x3 conv 640->640 @ 64^2  (same FLOPs, 5-tile channels)
  d) 2x2 conv 640->640 @ 128^2 (the space-to-depth packed form of (a):
     1.78x the FLOPs of (a), full-lane tiles)
  e) 3x3 conv 256->256 @ 256^2 (lane-padded (a): 2.56x FLOPs of (a))
  f) 1x1 conv 160->160 @ 256^2 (tap-free baseline)
  g) REALISTIC W-packed stage conv: (B,256,128,320) -> pad -> 3x2 VALID
     conv -> per-phase shifted slice-concat back to packed layout. This is
     the actual program a W-packed decoder stage would run per conv
     (1.34x the FLOPs of (a), phase epilogue included).
  h) REALISTIC 2x2-packed stage conv: (B,128,128,640) -> pad -> 2x2 VALID
     conv -> 4-phase shifted slice-concat (1.79x FLOPs of (a)).

Each case reports ms, TFLOP/s achieved, and efficiency vs the 244 TFLOP/s
measured matmul rate. Writes tools/conv_micro.json.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK = 244e12


def main():
    import jax
    import jax.numpy as jnp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cases = {
        "a_3x3_160_256sq": (3, 160, 160, 256),
        "b_3x3_320_128sq": (3, 320, 320, 128),
        "c_3x3_640_64sq": (3, 640, 640, 64),
        "d_2x2_640_128sq": (2, 640, 640, 128),
        "e_3x3_256_256sq": (3, 256, 256, 256),
        "f_1x1_160_256sq": (1, 160, 160, 256),
    }
    out = {"B": B}

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(x, w, n):
        def body(h, _):
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return h, ()
        h, _ = jax.lax.scan(body, x, (), length=n)
        return h

    N_CHAIN = 8

    @functools.partial(jax.jit, static_argnums=(2,))
    def run_wpack(x, w, n):
        # packed layout (B, H, W/2, 2C): per conv, phase-0 output needs
        # packed cols (j-1, j), phase-1 needs (j, j+1) -> one VALID 3x2 conv
        # over the W-padded input, then two shifted channel slices
        C = x.shape[-1] // 2

        def body(h, _):
            hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
            y = jax.lax.conv_general_dilated(
                hp, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            wout = h.shape[2]
            h = jnp.concatenate(
                [y[:, :, :wout, :C], y[:, :, 1:, C:]], axis=-1)
            return h, ()
        h, _ = jax.lax.scan(body, x, (), length=n)
        return h

    @functools.partial(jax.jit, static_argnums=(2,))
    def run_hwpack(x, w, n):
        # fully packed layout (B, H/2, W/2, 4C): 2x2 VALID conv over the
        # padded input, then 4 shifted channel slices
        C = x.shape[-1] // 4

        def body(h, _):
            hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
            y = jax.lax.conv_general_dilated(
                hp, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            hh, ww = h.shape[1], h.shape[2]
            h = jnp.concatenate(
                [y[:, :hh, :ww, 0 * C:1 * C], y[:, :hh, 1:, 1 * C:2 * C],
                 y[:, 1:, :ww, 2 * C:3 * C], y[:, 1:, 1:, 3 * C:4 * C]],
                axis=-1)
            return h, ()
        h, _ = jax.lax.scan(body, x, (), length=n)
        return h

    packed_cases = {
        # name: (runner, kh, kw, ch, H_in, W_in, out_positions)
        "g_wpack_3x2_320_256x128": (
            run_wpack, 3, 2, 320, 256, 128, 256 * 129),
        "h_hwpack_2x2_640_128sq": (
            run_hwpack, 2, 2, 640, 128, 128, 129 * 129),
    }

    for name, (k, cin, cout, hw) in cases.items():
        x = jax.random.normal(jax.random.key(0), (B, hw, hw, cin),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (k, k, cin, cout),
                              jnp.bfloat16) * 0.02
        flop = B * hw * hw * cin * cout * k * k * 2 * N_CHAIN

        def _sync(r):
            # block_until_ready returns early on this tunnel platform; a
            # scalar readback is the only reliable barrier (PERF.md section 2)
            return float(jnp.sum(r.astype(jnp.float32)[0, 0, 0]))

        _sync(run(x, w, N_CHAIN))
        outs = []
        t0 = time.perf_counter()
        for _ in range(4):
            outs.append(run(x, w, N_CHAIN))
        _sync(outs[-1])
        dt = (time.perf_counter() - t0) / 4
        tflops = flop / dt / 1e12
        out[name] = {
            "ms_per_conv": round(dt * 1e3 / N_CHAIN, 3),
            "tflops": round(tflops, 1),
            "eff_vs_244": round(tflops * 1e12 / PEAK, 3),
        }
        print(name, out[name], flush=True)

    for name, (runner, kh, kw, ch, hin, win, pos) in packed_cases.items():
        x = jax.random.normal(jax.random.key(0), (B, hin, win, ch),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (kh, kw, ch, ch),
                              jnp.bfloat16) * 0.02
        flop = B * pos * ch * ch * kh * kw * 2 * N_CHAIN

        def _sync(r):
            return float(jnp.sum(r.astype(jnp.float32)[0, 0, 0]))

        _sync(runner(x, w, N_CHAIN))
        outs = []
        t0 = time.perf_counter()
        for _ in range(4):
            outs.append(runner(x, w, N_CHAIN))
        _sync(outs[-1])
        dt = (time.perf_counter() - t0) / 4
        tflops = flop / dt / 1e12
        out[name] = {
            "ms_per_conv": round(dt * 1e3 / N_CHAIN, 3),
            "tflops": round(tflops, 1),
            "eff_vs_244": round(tflops * 1e12 / PEAK, 3),
            "note": "incl. per-conv phase slice-concat epilogue; compare "
                    "ms_per_conv with case a (same logical work)",
        }
        print(name, out[name], flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "conv_micro.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
