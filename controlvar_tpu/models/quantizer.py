"""Multi-scale residual vector quantizer (TPU-native).

Coarse-to-fine residual VQ over a pyramid of token maps: per scale, the
residual feature is area-downsampled to (pn, pn), matched against a single
shared (V, Cvae) codebook, the chosen embeddings are bicubic-upsampled back
to full resolution, refined by a partially-shared 3x3 "phi" conv, and
subtracted from the residual. Mirrors the behavior of the reference
VectorQuantizer2 (reference: models/quant.py:50-260) with a functional,
statically-shaped design:

  * the scale loop is unrolled over the static `patch_nums` tuple, so every
    resize/argmin/conv has a fixed shape and XLA compiles one fused program;
  * codebook search is a single (N, V) matmul (x @ E^T) on the MXU plus a
    row-norm rank-1 correction — never a gather loop;
  * resizes are the torch-parity matrix ops from controlvar_tpu.ops.resize.

All quantizer math runs in float32 (the reference wraps it in
`torch.autocast(enabled=False)`, reference: models/quant.py:59,229).

Params pytree:
  {"embedding": (V, Cvae),
   "phi": [{"kernel": (3,3,Cvae,Cvae), "bias": (Cvae,)} x share_quant_resi]}
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from controlvar_tpu.config import VQVAEConfig
from controlvar_tpu.ops.resize import resize_area, resize_bicubic

Params = Dict


def phi_index_table(num_scales: int, num_phi: int) -> Tuple[int, ...]:
    """Static scale->phi assignment (reference: models/quant.py:287-290).

    Phi convs are partially shared: K phis cover the [0, 1] scale-ratio range
    at tick positions, and scale si uses the phi whose tick is nearest to
    si/(num_scales-1).
    """
    if num_phi <= 0:
        return tuple(0 for _ in range(num_scales))
    if num_phi == 4:
        ticks = np.linspace(1 / 3 / num_phi, 1 - 1 / 3 / num_phi, num_phi)
    else:
        ticks = np.linspace(1 / 2 / num_phi, 1 - 1 / 2 / num_phi, num_phi)
    out = []
    for si in range(num_scales):
        ratio = si / (num_scales - 1) if num_scales > 1 else 0.0
        out.append(int(np.argmin(np.abs(ticks - ratio))))
    return tuple(out)


def _phi_apply(phi_params: Params, x: jnp.ndarray, resi_ratio: float) -> jnp.ndarray:
    """phi(x) = (1-r)*x + r*conv3x3(x) on NHWC (reference: models/quant.py:263-270)."""
    y = jax.lax.conv_general_dilated(
        x,
        phi_params["kernel"],
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,  # fp32 conv: token parity
    )
    y = y + phi_params["bias"]
    return x * (1.0 - resi_ratio) + y * resi_ratio


@dataclasses.dataclass(frozen=True)
class MultiScaleQuantizer:
    """Stateless quantizer bound to a static VQVAEConfig."""

    cfg: VQVAEConfig

    # ---- construction -----------------------------------------------------

    def init_params(self, key: jax.Array) -> Params:
        cfg = self.cfg
        k_embed, *k_phi = jax.random.split(key, 1 + max(cfg.share_quant_resi, 1))
        # torch nn.Embedding default init: N(0, 1)
        embedding = jax.random.normal(k_embed, (cfg.vocab_size, cfg.z_channels), jnp.float32)
        phis = []
        n_phi = cfg.share_quant_resi if cfg.share_quant_resi > 0 else cfg.num_scales
        for i in range(n_phi):
            fan_in = 3 * 3 * cfg.z_channels
            bound = 1.0 / np.sqrt(fan_in)
            kk, kb = jax.random.split(k_phi[i % len(k_phi)])
            phis.append(
                {
                    "kernel": jax.random.uniform(
                        kk, (3, 3, cfg.z_channels, cfg.z_channels), jnp.float32, -bound, bound
                    ),
                    "bias": jax.random.uniform(kb, (cfg.z_channels,), jnp.float32, -bound, bound),
                }
            )
        return {"embedding": embedding, "phi": phis}

    @property
    def _phi_table(self) -> Tuple[int, ...]:
        return phi_index_table(self.cfg.num_scales, self.cfg.share_quant_resi)

    def _phi(self, params: Params, si: int, x: jnp.ndarray) -> jnp.ndarray:
        if abs(self.cfg.quant_resi) <= 1e-6:
            return x
        idx = self._phi_table[si]
        return _phi_apply(params["phi"][idx], x, abs(self.cfg.quant_resi))

    # ---- codebook search ----------------------------------------------------

    def nearest_code(self, params: Params, z_nc: jnp.ndarray) -> jnp.ndarray:
        """argmin_v ||z - E_v||^2 as one MXU matmul. z_nc: (..., C) fp32 -> int32 ids."""
        E = params["embedding"].astype(jnp.float32)
        z = z_nc.astype(jnp.float32)
        hi = jax.lax.Precision.HIGHEST  # fp32 on MXU: argmin ties must match torch
        if self.cfg.using_znorm:
            zn = z / jnp.linalg.norm(z, axis=-1, keepdims=True).clip(1e-12)
            En = E / jnp.linalg.norm(E, axis=-1, keepdims=True).clip(1e-12)
            sims = jnp.einsum("...c,vc->...v", zn, En, precision=hi)
            return jnp.argmax(sims, axis=-1).astype(jnp.int32)
        # d = |z|^2 + |E|^2 - 2 z.E ; |z|^2 is constant per row -> drop it
        e_sq = jnp.sum(E * E, axis=-1)
        dots = jnp.einsum("...c,vc->...v", z, E, precision=hi)
        d = e_sq - 2.0 * dots
        return jnp.argmin(d, axis=-1).astype(jnp.int32)

    def embed(self, params: Params, ids: jnp.ndarray) -> jnp.ndarray:
        """Codebook lookup: int ids (...,) -> (..., Cvae) fp32."""
        return jnp.take(params["embedding"].astype(jnp.float32), ids, axis=0)

    # ---- encode: feature map -> per-scale token ids -------------------------

    def encode_ids(
        self,
        params: Params,
        f_bhwc: jnp.ndarray,
        patch_nums: Optional[Sequence[int]] = None,
    ) -> List[jnp.ndarray]:
        """f (B, H, W, Cvae) -> [ (B, pn*pn) int32 ] per scale.

        Mirrors f_to_idxBl_or_fhat(to_fhat=False) (reference: models/quant.py:184-215).
        """
        ids, _ = self._encode(params, f_bhwc, patch_nums, want_fhat=False)
        return ids

    def encode_fhat(
        self,
        params: Params,
        f_bhwc: jnp.ndarray,
        patch_nums: Optional[Sequence[int]] = None,
    ) -> List[jnp.ndarray]:
        """Per-scale cumulative reconstructions f_hat (B, H, W, C), fp32."""
        _, fhats = self._encode(params, f_bhwc, patch_nums, want_fhat=True)
        return fhats

    def _encode(self, params, f_bhwc, patch_nums, want_fhat):
        pns = tuple(patch_nums or self.cfg.patch_nums)
        B, H, W, C = f_bhwc.shape
        assert pns[-1] == H == W, f"last scale {pns[-1]} must equal feature size {H}"
        f = f_bhwc.astype(jnp.float32)
        f_rest = f
        f_hat = jnp.zeros_like(f)
        SN = len(pns)
        all_ids: List[jnp.ndarray] = []
        all_fhat: List[jnp.ndarray] = []
        for si, pn in enumerate(pns):
            z = resize_area(f_rest, pn, pn) if si != SN - 1 else f_rest
            idx = self.nearest_code(params, z)              # (B, pn, pn)
            h = self.embed(params, idx)                     # (B, pn, pn, C)
            if si != SN - 1:
                h = resize_bicubic(h, H, W)
            h = self._phi(params, si, h)
            f_hat = f_hat + h
            f_rest = f_rest - h
            all_ids.append(idx.reshape(B, pn * pn))
            if want_fhat:
                all_fhat.append(f_hat)
        return all_ids, all_fhat

    # ---- teacher-forcing inputs for VAR training -----------------------------

    def ids_to_var_input(self, params: Params, ms_ids: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        """Ground-truth ids -> AR teacher-forcing features.

        Returns, for each scale k in [1, SN), the accumulated f_hat after
        scales < k, area-downsampled to (pn_k, pn_k) and flattened to
        (B, pn_k^2, Cvae). Mirrors idxBl_to_var_input (reference:
        models/quant.py:217-241).
        """
        pns = self.cfg.patch_nums
        SN = len(pns)
        B = ms_ids[0].shape[0]
        H = W = pns[-1]
        C = self.cfg.z_channels
        f_hat = jnp.zeros((B, H, W, C), jnp.float32)
        out: List[jnp.ndarray] = []
        for si in range(SN - 1):
            pn = pns[si]
            h = self.embed(params, ms_ids[si].reshape(B, pn, pn))
            h = resize_bicubic(h, H, W)
            f_hat = f_hat + self._phi(params, si, h)
            pn_next = pns[si + 1]
            nxt = resize_area(f_hat, pn_next, pn_next)
            out.append(nxt.reshape(B, pn_next * pn_next, C))
        return out

    # ---- AR decode-step residual update --------------------------------------

    def next_ar_input(
        self, params: Params, si: int, f_hat: jnp.ndarray, h_bhwc: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One decode-step residual-canvas update.

        h_bhwc: (B, pn, pn, C) embedded sampled tokens of scale si.
        Returns (new f_hat (B,H,W,C), next-scale input map (B,pn',pn',C)).
        Mirrors get_next_autoregressive_input (reference: models/quant.py:243-260).
        """
        pns = self.cfg.patch_nums
        SN = len(pns)
        H = W = pns[-1]
        if si != SN - 1:
            h = resize_bicubic(h_bhwc, H, W)
            h = self._phi(params, si, h)
            f_hat = f_hat + h
            nxt = resize_area(f_hat, pns[si + 1], pns[si + 1])
            return f_hat, nxt
        h = self._phi(params, si, h_bhwc)
        f_hat = f_hat + h
        return f_hat, f_hat

    # ---- embeddings -> f_hat (visualization / decode) -------------------------

    def embed_to_fhat(
        self, params: Params, ms_h: Sequence[jnp.ndarray], last_one: bool = False,
        all_to_max_scale: bool = True,
    ):
        """Per-scale raw token embeddings (B, pn, pn, C) -> cumulative f_hat.

        all_to_max_scale=True mirrors the training-consistent accumulation at
        full resolution (reference: models/quant.py:161-170); False is the
        experimental per-scale-resolution visualization variant (reference:
        models/quant.py:171-180, upsamples the canvas progressively instead).
        """
        pns = self.cfg.patch_nums
        SN = len(pns)
        H = W = pns[-1]
        B = ms_h[0].shape[0]
        outs = []
        if all_to_max_scale:
            f_hat = jnp.zeros((B, H, W, self.cfg.z_channels), jnp.float32)
            for si, pn in enumerate(pns):
                h = ms_h[si]
                if si < SN - 1:
                    h = resize_bicubic(h, H, W)
                f_hat = f_hat + self._phi(params, si, h)
                if not last_one:
                    outs.append(f_hat)
        else:
            f_hat = jnp.zeros((B, pns[0], pns[0], self.cfg.z_channels), jnp.float32)
            for si, pn in enumerate(pns):
                f_hat = resize_bicubic(f_hat, pn, pn)
                f_hat = f_hat + self._phi(params, si, ms_h[si])
                if not last_one:
                    outs.append(f_hat)
        return f_hat if last_one else outs

    def ids_to_fhat(self, params: Params, ms_ids: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """Full decode of per-scale ids -> final f_hat (B, H, W, C)."""
        pns = self.cfg.patch_nums
        B = ms_ids[0].shape[0]
        ms_h = [
            self.embed(params, ms_ids[si].reshape(B, pn, pn))
            for si, pn in enumerate(pns)
        ]
        return self.embed_to_fhat(params, ms_h, last_one=True)

    # ---- VQVAE-training forward (straight-through) ----------------------------

    def quantize_train(
        self, params: Params, f_bhwc: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Training-mode quantization with straight-through estimator.

        Returns (f_hat_st, vq_loss, hits (S, V) per-scale codebook hit
        counts). Mirrors VectorQuantizer2.forward (reference:
        models/quant.py:50-102): the commitment/codebook loss averages
        MSE(f_hat.detach(), f) * beta + MSE(f_hat, f.detach()) over scales,
        and the straight-through output is f + stop_grad(f_hat - f).
        """
        cfg = self.cfg
        f = f_bhwc.astype(jnp.float32)
        f_ng = jax.lax.stop_gradient(f)
        f_rest = f_ng
        f_hat = jnp.zeros_like(f_ng)
        SN = cfg.num_scales
        H = W = cfg.patch_nums[-1]
        vq_loss = 0.0
        hits = []
        for si, pn in enumerate(cfg.patch_nums):
            z = resize_area(f_rest, pn, pn) if si != SN - 1 else f_rest
            idx = self.nearest_code(params, z)
            hits.append(
                jnp.bincount(idx.reshape(-1), length=cfg.vocab_size).astype(jnp.float32)
            )
            h = self.embed(params, idx)  # grads flow to embedding
            if si != SN - 1:
                h = resize_bicubic(h, H, W)
            h = self._phi(params, si, h)
            f_hat = f_hat + h
            f_rest = f_rest - jax.lax.stop_gradient(h)
            vq_loss = vq_loss + cfg.beta * jnp.mean(
                (jax.lax.stop_gradient(f_hat) - f) ** 2
            ) + jnp.mean((f_hat - f_ng) ** 2)
        vq_loss = vq_loss / SN
        f_hat_st = f + jax.lax.stop_gradient(f_hat - f)
        return f_hat_st, vq_loss, jnp.stack(hits)

    # ---- codebook usage tracking (EMA) + entropy regularizer ------------------

    def init_usage_state(self) -> Dict:
        """Functional replacement for the reference's `ema_vocab_hit_SV`
        buffer + `record_hit` counter (reference: models/quant.py:33,86-92).
        In SPMD training the per-step hit counts are already global (bincount
        runs on the sharded global batch under jit), replacing the
        reference's async all_reduce (quant.py:77,86-87)."""
        return {
            "ema_hits": jnp.zeros((self.cfg.num_scales, self.cfg.vocab_size), jnp.float32),
            "record_hit": jnp.zeros((), jnp.int32),
        }

    def update_usage(self, state: Dict, hits_sv: jnp.ndarray) -> Dict:
        """EMA update with the reference's warm-up schedule: copy on the first
        step, rate 0.1 for the first 100 steps, 0.01 after
        (reference: models/quant.py:88-92)."""
        n = state["record_hit"]
        rate = jnp.where(n == 0, 1.0, jnp.where(n < 100, 0.1, 0.01))
        ema = state["ema_hits"] * (1.0 - rate) + hits_sv * rate
        return {"ema_hits": ema, "record_hit": n + 1}

    def usage_percent(self, state: Dict, batch_tokens_per_scale: int) -> jnp.ndarray:
        """(S,) percent of codebook entries whose EMA hit count exceeds the
        dead-code margin (reference: models/quant.py:99-101):
        margin = world * (numel/C) / V * 0.08, with world folded into
        batch_tokens_per_scale = global B * H * W."""
        margin = batch_tokens_per_scale / self.cfg.vocab_size * 0.08
        return jnp.mean(
            (state["ema_hits"] >= margin).astype(jnp.float32), axis=-1
        ) * 100.0

    def entropy_loss(self, state: Dict) -> jnp.ndarray:
        """-beta * sum p log p over the normalized EMA hit distribution
        (reference: models/quant.py:105-109)."""
        p = state["ema_hits"] / jnp.sum(state["ema_hits"]).clip(1e-10)
        return -jnp.sum(p * jnp.log(p + 1e-10)) * self.cfg.beta
