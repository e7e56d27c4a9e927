"""Manual per-step lr/wd annealing, jit-friendly.

Exact port of the reference schedule semantics (reference:
utils/lr_control.py:10-48): linear warmup from wp0 to 1 over wp_it steps,
then one of {cos, lin, lin0, lin00, linT, exp} decays to wpe; weight decay
follows a half-cycle cosine from wd to wd_end over the whole run.

Implemented with jnp so the schedule can live INSIDE the jitted train step
(step is a traced scalar) — no per-step host->device hyperparameter pushes
like the reference's python loop does.
"""
from __future__ import annotations

import jax.numpy as jnp


def lr_at_step(
    sche_type: str,
    step: jnp.ndarray,
    peak_lr: float,
    wp_it: int,
    max_it: int,
    wp0: float = 0.005,
    wpe: float = 0.001,
) -> jnp.ndarray:
    step = jnp.asarray(step, jnp.float32)
    wp_it_f = float(round(wp_it))
    warm = wp0 + (1 - wp0) * step / jnp.maximum(wp_it_f, 1.0)

    pasd = (step - wp_it_f) / max(max_it - 1 - wp_it_f, 1.0)
    rest = 1.0 - pasd
    if sche_type == "cos":
        main = wpe + (1 - wpe) * (0.5 + 0.5 * jnp.cos(jnp.pi * pasd))
    elif sche_type == "lin":
        T = 0.15
        main = jnp.where(pasd < T, 1.0, wpe + (1 - wpe) * rest / (1 - T))
    elif sche_type == "lin0":
        T = 0.05
        main = jnp.where(pasd < T, 1.0, wpe + (1 - wpe) * rest / (1 - T))
    elif sche_type == "lin00":
        main = wpe + (1 - wpe) * rest
    elif sche_type.startswith("lin"):
        T = float(sche_type[3:])
        max_rest = 1 - T
        wpe_mid = wpe + (1 - wpe) * max_rest
        wpe_mid = (1 + wpe_mid) / 2
        main = jnp.where(
            pasd < T,
            1 + (wpe_mid - 1) * pasd / T,
            wpe + (wpe_mid - wpe) * rest / max_rest,
        )
    elif sche_type == "exp":
        T = 0.15
        expo = (pasd - T) / (1 - T) * jnp.log(jnp.asarray(wpe))
        main = jnp.where(pasd < T, 1.0, jnp.exp(expo))
    else:
        raise NotImplementedError(f"unknown sche_type {sche_type}")

    frac = jnp.where(step < wp_it_f, warm, main)
    return peak_lr * frac


def wd_at_step(step: jnp.ndarray, wd: float, wd_end: float, max_it: int) -> jnp.ndarray:
    """Half-cycle cosine wd anneal (reference: utils/lr_control.py:47-48)."""
    pasd = jnp.asarray(step, jnp.float32) / max(max_it - 1, 1)
    return wd_end + (wd - wd_end) * (0.5 + 0.5 * jnp.cos(jnp.pi * pasd))


def lr_wd_at_step(sche_type, step, peak_lr, wd, wd_end, wp_it, max_it,
                  wp0=0.005, wpe=0.001):
    return (
        lr_at_step(sche_type, step, peak_lr, wp_it, max_it, wp0, wpe),
        wd_at_step(step, wd, wd_end, max_it),
    )
