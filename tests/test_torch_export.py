"""torch_export: the exact inverse of torch_import, and name-compatible
with the actual reference PyTorch model classes."""
import sys

import numpy as np
import pytest

import jax

from controlvar_tpu.ckpt.torch_export import (
    export_control_var_state_dict,
    export_var_state_dict,
    export_vqvae_state_dict,
    save_torch_checkpoint,
)
from controlvar_tpu.ckpt.torch_import import (
    convert_control_var_state_dict,
    convert_var_state_dict,
    convert_vqvae_state_dict,
    load_torch_state_dict,
)
from controlvar_tpu.config import ControlVARConfig, VARConfig, VQVAEConfig


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _tree_equal(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _tree_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32), err_msg=path)


VQ_CFG = VQVAEConfig(ch=32, patch_nums=(1, 2, 4), vocab_size=64)


def test_vqvae_export_import_round_trip():
    from controlvar_tpu.models.vqvae import VQVAE

    params = VQVAE(VQ_CFG).init_params(jax.random.key(0))
    sd = export_vqvae_state_dict(params, VQ_CFG)
    back = convert_vqvae_state_dict(sd, VQ_CFG)
    _tree_equal(jax.tree_util.tree_map(np.asarray, params), back)


@pytest.mark.parametrize("cos_attn,shared_aln", [(False, False), (True, True)])
def test_control_var_export_import_round_trip(cos_attn, shared_aln):
    from controlvar_tpu.models.control_var import ControlVARModel

    cfg = ControlVARConfig(
        depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 4),
        vocab_size=64, cvae=32, num_classes=8, mask_factor=2, multi_cond=True,
        type_pos=True, cos_attn=cos_attn, shared_aln=shared_aln,
    )
    params = ControlVARModel(cfg).init_params(jax.random.key(1))
    sd = export_control_var_state_dict(
        jax.tree_util.tree_map(np.asarray, params), cfg)
    back = convert_control_var_state_dict(sd, cfg)
    want = {k: v for k, v in
            jax.tree_util.tree_map(np.asarray, params).items()}
    _tree_equal(want, back)


def test_export_loads_into_reference_var(tmp_path):
    """The exported .pth must load into the REFERENCE torch VAR by name:
    no unexpected keys; missing keys only the constructor-derived buffers."""
    import torch

    sys.path.insert(0, "/root/reference")
    try:
        from models.var import VAR as RefVAR  # type: ignore
        from models.vqvae import VQVAE as RefVQVAE  # type: ignore
    finally:
        sys.path.remove("/root/reference")

    cfg = VARConfig(depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 4),
                    vocab_size=64, cvae=32, num_classes=8)
    from controlvar_tpu.models.var import VARModel

    params = VARModel(cfg).init_params(jax.random.key(2))
    sd = export_var_state_dict(jax.tree_util.tree_map(np.asarray, params), cfg)
    pth = str(tmp_path / "ours.pth")
    save_torch_checkpoint(pth, sd, step=7, epoch=3)

    vae = RefVQVAE(vocab_size=64, z_channels=32, ch=32, v_patch_nums=(1, 2, 4),
                   test_mode=True)
    ref = RefVAR(vae_local=vae, num_classes=8, depth=2, embed_dim=128,
                 num_heads=2, patch_nums=(1, 2, 4), cond_drop_rate=0.0,
                 flash_if_available=False, fused_if_available=False)
    obj = torch.load(pth, map_location="cpu", weights_only=False)
    assert obj["step"] == 7 and obj["epoch"] == 3
    res = ref.load_state_dict(
        {k: v for k, v in obj["model_state_dict"].items()}, strict=False)
    assert not res.unexpected_keys, res.unexpected_keys
    derived = {"lvl_1L", "attn_bias_for_masking"}
    for k in res.missing_keys:
        assert (k.split(".")[-1] in ("zero_k_bias",)
                or k in derived
                or k.endswith("attn.caching") or k.endswith("attn.cached_k")
                or k.endswith("attn.cached_v")), f"unexpectedly missing {k}"

    # and the reference round-trips our weights numerically
    back = convert_var_state_dict(load_torch_state_dict(pth), cfg)
    _tree_equal(jax.tree_util.tree_map(np.asarray, params), back)


def test_cli_export_from_orbax_round_trip(tmp_path, capsys):
    """train -> Orbax checkpoint -> `export` CLI -> importer reads it back
    at the same config: the full migration-out path is runnable end to end."""
    from controlvar_tpu.cli.main import main

    COMMON = ["--depth", "2", "--vae_ch", "32", "--patch_nums", "1", "2", "4",
              "--seed", "0"]
    ckpt_dir = str(tmp_path / "ckpt")
    main(["train", *COMMON, "--batch_size", "8", "--steps", "2",
          "--data", "synthetic", "--epochs", "1", "--ckpt_dir", ckpt_dir])
    out = str(tmp_path / "exported.pth")
    main(["export", *COMMON, "--ckpt_dir", ckpt_dir, "--out", out])
    msg = capsys.readouterr().out
    assert "wrote" in msg

    from controlvar_tpu.cli.main import _configs, build_parser

    args = build_parser().parse_args(["export", *COMMON, "--out", out])
    _, cfg = _configs(args)
    back = convert_control_var_state_dict(load_torch_state_dict(out), cfg)
    assert "class_emb" in back and back["blocks"]["qkv_kernel"].shape[0] == 2


def test_cli_train_vqvae_ckpt_resume_and_export(tmp_path, capsys):
    """train-vqvae checkpoints (the reference saves .pth, train_vqvae.py:168),
    resumes from the latest step, and the trained tokenizer exports to a
    reference-compatible .pth that loads into the reference VQVAE by name."""
    import torch

    from controlvar_tpu.cli.main import main

    COMMON = ["--vae_ch", "32", "--patch_nums", "1", "2", "4", "--seed", "0"]
    ckpt_dir = str(tmp_path / "vq")
    run = ["train-vqvae", *COMMON, "--data", "synthetic", "--batch_size", "2",
           "--epochs", "1", "--ckpt_dir", ckpt_dir]
    main([*run, "--steps", "2"])
    main([*run, "--steps", "3"])  # resumes at 2, runs 1 more step
    msg = capsys.readouterr().out
    assert "resumed train-vqvae at step 2" in msg

    out = str(tmp_path / "tok.pth")
    main(["export", *COMMON, "--what", "vqvae", "--ckpt_dir", ckpt_dir,
          "--out", out])
    assert "wrote" in capsys.readouterr().out

    sys.path.insert(0, "/root/reference")
    try:
        from models.vqvae import VQVAE as RefVQVAE  # type: ignore
    finally:
        sys.path.remove("/root/reference")
    ref = RefVQVAE(vocab_size=4096, z_channels=32, ch=32,
                   v_patch_nums=(1, 2, 4), test_mode=True)
    obj = torch.load(out, map_location="cpu", weights_only=False)
    res = ref.load_state_dict(obj["model_state_dict"], strict=False)
    assert not res.unexpected_keys, res.unexpected_keys
    assert not [k for k in res.missing_keys if "ema" not in k], res.missing_keys


def test_cli_dual_vqvae_export_loads_into_reference(tmp_path, capsys):
    """A dual-codebook train-vqvae checkpoint exports to a .pth the reference
    MaskVQVAE (models/vqvae_mask.py) loads with no unexpected keys."""
    import torch

    from controlvar_tpu.cli.main import main

    COMMON = ["--vae_ch", "32", "--patch_nums", "1", "2", "4", "--seed", "0"]
    ckpt_dir = str(tmp_path / "vq")
    main(["train-vqvae", *COMMON, "--data", "synthetic", "--batch_size", "2",
          "--epochs", "1", "--dual", "--disc_start", "0", "--steps", "2",
          "--ckpt_dir", ckpt_dir])
    out = str(tmp_path / "dual.pth")
    main(["export", *COMMON, "--what", "vqvae", "--ckpt_dir", ckpt_dir,
          "--out", out])
    assert "wrote" in capsys.readouterr().out

    sys.path.insert(0, "/root/reference")
    try:
        from models.vqvae_mask import VQVAE as RefMaskVQVAE  # type: ignore
    finally:
        sys.path.remove("/root/reference")
    ref = RefMaskVQVAE(vocab_size=4096, z_channels=32, ch=32,
                       v_patch_nums=(1, 2, 4), test_mode=True)
    obj = torch.load(out, map_location="cpu", weights_only=False)
    res = ref.load_state_dict(obj["model_state_dict"], strict=False)
    assert not res.unexpected_keys, res.unexpected_keys
    assert not [k for k in res.missing_keys if "ema" not in k], res.missing_keys


def test_cli_lora_checkpoint_merges_into_base_on_export(tmp_path, capsys):
    """A --lora training checkpoint holds only (A, B) factors; export merges
    them into the --ckpt base: untargeted kernels stay byte-identical to the
    base, targeted ones move (B != 0 after training)."""
    from controlvar_tpu.cli.main import main

    COMMON = ["--depth", "2", "--vae_ch", "32", "--patch_nums", "1", "2", "4",
              "--seed", "0"]
    base_pth = str(tmp_path / "base.pth")
    main(["export", *COMMON, "--out", base_pth])  # random base, fixed seed
    ckpt_dir = str(tmp_path / "lora")
    main(["train", *COMMON, "--batch_size", "8", "--steps", "2",
          "--data", "synthetic", "--epochs", "1", "--lora", "4",
          "--lr", "0.1", "--ckpt", base_pth, "--ckpt_dir", ckpt_dir])
    out = str(tmp_path / "merged.pth")
    main(["export", *COMMON, "--ckpt", base_pth, "--ckpt_dir", ckpt_dir,
          "--out", out])
    assert "merged LoRA rank-4" in capsys.readouterr().out

    base = load_torch_state_dict(base_pth)
    merged = load_torch_state_dict(out)
    # qkv is NOT a LoRA target -> frozen base passes through exactly
    np.testing.assert_array_equal(merged["blocks.0.attn.mat_qkv.weight"],
                                  base["blocks.0.attn.mat_qkv.weight"])
    # proj IS a target -> trained factors moved it
    assert (merged["blocks.0.attn.proj.weight"]
            != base["blocks.0.attn.proj.weight"]).any()
