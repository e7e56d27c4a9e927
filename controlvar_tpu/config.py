"""Static model/training configuration.

Single source of truth replacing the reference's per-script argparse+YAML
two-pass parsing (reference: train_control_var_hpu.py:38-127) and the
depth->shape law of the model factory (reference: models/__init__.py:15,39).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

PATCH_NUMS_DEFAULT: Tuple[int, ...] = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16)

# Condition-type vocabulary for multi-cond ControlVAR
# (reference: models/control_var.py:211-213, datasets/imagenetC.py:129)
COND_TYPES = ("mask", "canny", "depth", "normal")
COND_UNCOND_ID = 4  # index of the "dropped"/unconditional cond-type embedding


# Experiment/ablation env knobs, all read at TRACE time. Measurement tools
# and bench.py strip these before running so a stale shell export can never
# silently change an arm or the official record (round-5 review finding);
# production knobs (CONTROLVAR_SAMPLER) are deliberately NOT listed.
EXPERIMENT_ENV_KNOBS = (
    "CONTROLVAR_ABLATE",
    "CONTROLVAR_ABLATE_OK",
    "CONTROLVAR_DECODE_KERNEL",
    "CONTROLVAR_XLA_SMALL",
    "CONTROLVAR_INV_DECODE",
    "CONTROLVAR_XS_DECODE",
    "CONTROLVAR_KV_FUSED",
    "CONTROLVAR_INPLACE_DECODE",
    "CONTROLVAR_UNROLLED_DECODE",
    "CONTROLVAR_WPACK",
    "CONTROLVAR_VMEM_BUDGET",
    "CONTROLVAR_BWD_VMEM_BUDGET",
    "CONTROLVAR_SCAN_CHUNK",
    "CONTROLVAR_FLASH_BWD",
    "CONTROLVAR_REMAT",
)


@dataclasses.dataclass(frozen=True)
class VQVAEConfig:
    """Multi-scale residual-VQ tokenizer (reference: models/vqvae.py:17-49)."""

    vocab_size: int = 4096
    z_channels: int = 32          # Cvae
    ch: int = 160                 # base width (released ckpt uses 160)
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)  # f16 downsample
    num_res_blocks: int = 2
    dropout: float = 0.0
    beta: float = 0.25            # commitment loss weight
    using_znorm: bool = False
    quant_conv_ks: int = 3
    quant_resi: float = 0.5       # phi(x) = 0.5*conv(x) + 0.5*x
    share_quant_resi: int = 4     # partially-shared phi
    patch_nums: Tuple[int, ...] = PATCH_NUMS_DEFAULT
    # W-packed decoder tail (ops/packed_conv): None = auto — OFF on this
    # image (the fast fused form miscompiles on its TPU toolchain and the
    # correct assemblies measured slower than literal; see
    # models/vae.decoder_apply and PERF.md round 5); True opts in on
    # toolchains where the fused form is correct. fp32 token-parity runs
    # stay literal regardless.
    wpack_decoder: Optional[bool] = None

    @property
    def num_scales(self) -> int:
        return len(self.patch_nums)

    @property
    def downsample(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


@dataclasses.dataclass(frozen=True)
class VARConfig:
    """Class-conditional next-scale AR transformer (reference: models/var.py:21-133)."""

    depth: int = 16
    embed_dim: int = 1024
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    norm_eps: float = 1e-6
    cond_drop_rate: float = 0.1
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    tau: float = 4.0
    cos_attn: bool = False
    shared_aln: bool = False
    aln_init: float = 1.0
    aln_gamma_init: float = 1e-3
    patch_nums: Tuple[int, ...] = PATCH_NUMS_DEFAULT
    vocab_size: int = 4096        # quantizer codebook size
    cvae: int = 32                # quantizer channel dim

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def seq_len(self) -> int:
        return sum(pn * pn for pn in self.patch_nums)

    @property
    def first_l(self) -> int:
        return self.patch_nums[0] ** 2

    @property
    def num_scales(self) -> int:
        return len(self.patch_nums)

    @property
    def attn_scale(self) -> float:
        return 1.0 / (self.head_dim ** 0.5) / self.tau


@dataclasses.dataclass(frozen=True)
class ControlVARConfig(VARConfig):
    """Joint control+image interleaved VAR (reference: models/control_var.py:23-213).

    Each scale holds `mask_factor` interleaved segments:
      mask_factor=2 -> (control_k, image_k) pairs ("interleave_append"),
      mask_factor=1 -> control replaces image ("replace").
    """

    mask_factor: int = 2
    bidirectional: bool = False
    separate_decoding: bool = False
    separator: bool = False
    type_pos: bool = False
    indep: bool = False
    multi_cond: bool = False
    num_cond_types: int = 5       # mask/canny/depth/normal/uncond

    @property
    def seq_len(self) -> int:
        L = sum(pn * pn * self.mask_factor for pn in self.patch_nums)
        if self.separator:
            L += (len(self.patch_nums) - 1) * self.mask_factor
        return L

    @property
    def first_l(self) -> int:
        return self.patch_nums[0] ** 2 * self.mask_factor

    @property
    def num_sep_tokens(self) -> int:
        """Extra head-vocab entries for separator special tokens."""
        return (len(self.patch_nums) - 1) * self.mask_factor if self.separator else 0

    @property
    def head_vocab(self) -> int:
        return self.vocab_size + self.num_sep_tokens

    def scale_seg_len(self, si: int) -> int:
        """Token count of scale si (all interleaved segments + separators)."""
        pn = self.patch_nums[si]
        num_sp = 1 if (si != 0 and self.separator) else 0
        return (pn * pn + num_sp) * self.mask_factor

    @property
    def begin_ends(self) -> Tuple[Tuple[int, int], ...]:
        out, cur = [], 0
        for si in range(len(self.patch_nums)):
            seg = self.scale_seg_len(si)
            out.append((cur, cur + seg))
            cur += seg
        return tuple(out)


def _shape_from_depth(depth: int) -> dict:
    # Width/heads/drop-path derived from depth (reference: models/__init__.py:15,39)
    return dict(
        depth=depth,
        embed_dim=depth * 64,
        num_heads=depth,
        drop_path_rate=0.1 * depth / 24,
    )


def var_config_from_depth(depth: int, **overrides) -> VARConfig:
    kw = _shape_from_depth(depth)
    kw.update(overrides)
    return VARConfig(**kw)


def control_var_config_from_depth(
    depth: int, mask_type: str = "interleave_append", **overrides
) -> ControlVARConfig:
    kw = _shape_from_depth(depth)
    kw["mask_factor"] = {"replace": 1, "interleave_append": 2}[mask_type]
    # cos-attn force-enabled at depth 30 (reference: models/control_var.py:35-37)
    kw["cos_attn"] = overrides.pop("cos_attn", depth == 30)
    kw.update(overrides)
    return ControlVARConfig(**kw)


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """AdamW + manual lr/wd annealing (reference: utils/lr_control.py:10-64,
    train_control_var_hpu.py:608-633)."""

    base_lr: float = 1e-4         # scaled by total_batch/512
    total_batch_size: int = 64
    weight_decay: float = 0.05
    weight_decay_end: Optional[float] = None  # anneal target; None = constant
                                  # (reference: train_control_var_hpu.py:71)
    beta1: float = 0.9
    beta2: float = 0.95
    grad_clip: float = 2.0
    warmup_epochs: float = 1.0    # wp
    warmup_init_frac: float = 0.005  # wp0
    final_lr_frac: float = 0.015  # wpe-style final fraction
    schedule: str = "lin0"        # {cos, lin, lin0, lin00, linT, exp}
    epochs: int = 30
    grad_accum: int = 1           # microbatches per optimizer step
                                  # (reference: train_control_var_hpu.py:65,249)

    @property
    def lr(self) -> float:
        return self.base_lr * self.total_batch_size / 512

    @property
    def wd_end(self) -> float:
        return self.weight_decay if self.weight_decay_end is None else self.weight_decay_end


@dataclasses.dataclass(frozen=True)
class SampleConfig:
    """Default CFG sampling recipe (reference: train_control_var_hpu.py:77,338)."""

    cfg: Tuple[float, float, float] = (4.0, 4.0, 4.0)
    top_k: int = 900
    top_p: float = 0.96
    seed: int = 42
    more_smooth: bool = False
    # opt-in scale-aware KV window (lossy; seg cache mode; PAPERS.md)
    kv_window: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical device-mesh shape. data = DP axis; model = TP axis."""

    data: int = 1
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model
