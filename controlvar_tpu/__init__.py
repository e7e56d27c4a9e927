"""controlvar_tpu: a TPU-native (JAX/XLA/Pallas) framework for controllable
next-scale autoregressive image generation (ControlVAR-class capabilities).

Re-designed TPU-first from the behavior of the reference implementation
(lxa9867/ControlVAR): a frozen multi-scale residual VQVAE tokenizer, a
GPT-style AdaLN transformer over scale pyramids (VAR), and the joint
control+image interleaved variant (ControlVAR) with teacher-forced
control-conditional decoding.

Layout:
  ops/       torch-parity resize matrices, attention (Pallas + XLA), sampling
  models/    vqvae (encoder/decoder), quantizer, transformer core, VAR, ControlVAR
  parallel/  device mesh + sharding rules (pjit/shard_map)
  data/      ImageNet-with-conditions pipeline (RLE masks, paired transforms)
  train/     jitted train step, lr/wd schedules, param groups, trainer loop
  ckpt/      orbax checkpointing + .pth importer + VAR->ControlVAR surgery
  eval/      sampling harness, FID-protocol generation, parity tools
  losses/    VQVAE training losses (LPIPS / PatchGAN composite)
"""

__version__ = "0.1.0"

from controlvar_tpu.config import (  # noqa: F401
    VQVAEConfig,
    VARConfig,
    ControlVARConfig,
    var_config_from_depth,
    control_var_config_from_depth,
)
