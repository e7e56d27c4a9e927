"""CLI smoke tests: every training surface must be RUNNABLE end-to-end from
the command line (tiny shapes, 2 steps), not just importable."""
import os

import numpy as np

from controlvar_tpu.cli.main import main

SMOKE = [
    "--depth", "2", "--vae_ch", "32", "--patch_nums", "1", "2", "4",
    "--batch_size", "2", "--steps", "2", "--seed", "0",
]
# Trainer shards the batch over all 8 virtual devices -> batch must divide
SMOKE_TRAINER = [a if a != "2" or SMOKE[i - 1] != "--batch_size" else "8"
                 for i, a in enumerate(SMOKE)]


def test_cli_train_smoke(capsys):
    main(["train", *SMOKE_TRAINER, "--data", "synthetic", "--epochs", "1",
          "--grad_accum", "2"])
    out = capsys.readouterr().out
    assert "loss=" in out


def test_cli_train_token_shards_smoke(tmp_path, capsys):
    """pretokenize -> train --token_shards: the pre-tokenized training path
    (skips both frozen VQVAE encoder passes per step) must run end-to-end
    from the CLI."""
    out_dir = str(tmp_path / "tok")
    # pretokenize shares `common` args only (no trainer-only --steps)
    pt_args = [a for i, a in enumerate(SMOKE_TRAINER)
               if a != "--steps" and SMOKE_TRAINER[i - 1] != "--steps"]
    main(["pretokenize", *pt_args, "--data", "synthetic",
          "--out", out_dir])
    assert "token shards" in capsys.readouterr().out
    main(["train", *SMOKE_TRAINER, "--token_shards", f"{out_dir}/*.npz",
          "--epochs", "1", "--log_every", "1"])
    out = capsys.readouterr().out
    assert "loss=" in out


def test_cli_train_lora_smoke(capsys):
    """LoRA fine-tune path: only (A, B) factors train
    (reference: train_control_var_hpu.py:449-470)."""
    main(["train", *SMOKE_TRAINER, "--data", "synthetic", "--epochs", "1",
          "--lora", "4"])
    out = capsys.readouterr().out
    assert "loss=" in out


def test_cli_train_var_smoke(capsys):
    """Plain-VAR baseline trainer (reference: train_var_hpu.py:121-206)."""
    main(["train-var", *SMOKE, "--data", "synthetic", "--epochs", "1"])
    out = capsys.readouterr().out
    assert "loss=" in out


def test_recipe_configs_load_and_merge():
    """Every committed recipe YAML (ported from the reference's configs/,
    e.g. configs/train_mask_var_ImageNetC_d30.yaml:14-35) must parse and
    merge into the train-arg namespace with CLI flags still winning."""
    import glob
    import os

    import yaml

    from controlvar_tpu.cli.main import _load_yaml, build_parser

    cfgs = sorted(glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "configs", "*.yaml")
    ))
    assert len(cfgs) >= 6
    parser = build_parser()
    for path in cfgs:
        argv = ["train", "--config", path, "--batch_size", "2"]
        args = parser.parse_args(argv)
        for k, v in _load_yaml(path).items():
            if hasattr(args, k) and f"--{k}" not in argv:
                setattr(args, k, v)
        assert args.depth in (12, 16, 20, 24, 30), path
        assert args.batch_size == 2  # explicit CLI wins over YAML
        assert args.lr <= 1e-4 and args.schedule in ("lin0", "cos"), path
    # the d30 flagship recipe carries the published hyperparameters
    d30 = yaml.safe_load(open([c for c in cfgs if "d30" in c][0]))
    assert (d30["lr"], d30["wd"], d30["epochs"], d30["depth"]) == (4e-5, 0.08, 30, 30)


def test_cli_train_vqvae_dual_smoke(capsys):
    """Dual-codebook MaskVQVAE tokenizer training
    (reference: train_vqvae.py:105-158)."""
    main(["train-vqvae", *SMOKE, "--data", "synthetic", "--epochs", "1",
          "--dual", "--disc_start", "0"])
    out = capsys.readouterr().out
    assert "nll=" in out and "usage=" in out


def test_cli_sample_cond_image(tmp_path, capsys):
    """North-star mode from the CLI: a user condition image drives
    control-conditional generation (reference:
    train_control_var_hpu.py:300-325)."""
    from PIL import Image
    import numpy as np

    cond = tmp_path / "cond.png"
    Image.fromarray(
        (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    ).save(cond)
    out = tmp_path / "out"
    smoke = [a for i, a in enumerate(SMOKE)
             if a != "--steps" and SMOKE[i - 1] != "--steps"]
    main(["sample", *smoke, "--force", "control", "--cond_image", str(cond),
          "--cond_type", "mask", "--out", str(out)])
    msg = capsys.readouterr().out
    assert "wrote 2 samples" in msg
    sub = out / "cfg_4_4_4_mask"
    assert sub.is_dir() and len(list(sub.glob("*.png"))) == 2


def test_cli_eval_cond_loop(tmp_path, capsys):
    """Pixel-conditional val loop: walks the split, saves under
    cfg_{t1}_{t2}_{t3}_{cond}/{shard}/ (reference:
    train_control_var_hpu.py:339-364)."""
    out = tmp_path / "val"
    smoke = [a for i, a in enumerate(SMOKE)
             if a != "--steps" and SMOKE[i - 1] != "--steps"]
    main(["eval-cond", *smoke, "--data", "synthetic", "--max_batches", "2",
          "--val_cond", "depth", "--out", str(out)])
    msg = capsys.readouterr().out
    assert "wrote 4 images" in msg
    sub = out / "cfg_6_6_6_depth" / "0"
    assert sub.is_dir() and len(list(sub.glob("*.png"))) == 4


def test_cli_eval_cond_force_image_saves_control_predictions(tmp_path, capsys):
    """--force image = control-prediction mode: the saved stream must be the
    GENERATED control half, not the teacher-forced image round-trip (the
    reference saves the bottom half unconditionally — documented deviation)."""
    out = tmp_path / "val"
    smoke = [a for i, a in enumerate(SMOKE)
             if a != "--steps" and SMOKE[i - 1] != "--steps"]
    main(["eval-cond", *smoke, "--data", "synthetic", "--max_batches", "1",
          "--force", "image", "--val_cond", "mask", "--out", str(out)])
    msg = capsys.readouterr().out
    assert "wrote 2 images" in msg
    assert len(list((out / "cfg_6_6_6_mask" / "0").glob("*.png"))) == 2


def test_cli_ablation_flags_reach_model_config():
    """Every reference ablation flag (train_control_var_hpu.py:100-108,
    consumed at :593-595) must be settable from the CLI and reach
    ControlVARConfig."""
    from controlvar_tpu.cli.main import _configs, build_parser

    p = build_parser()
    args = p.parse_args([
        "train", *SMOKE, "--bidirectional", "--separate_decoding",
        "--separator", "--type_pos", "--indep", "--drop_path_rate", "0.1",
        "--cond_drop_rate", "0.2", "--num_classes", "10",
    ])
    _, cfg = _configs(args)
    assert cfg.bidirectional and cfg.separate_decoding and cfg.separator
    assert cfg.type_pos and cfg.indep
    assert cfg.drop_path_rate == 0.1 and cfg.cond_drop_rate == 0.2
    assert cfg.num_classes == 10

    # --uncond => always-drop conditioning (reference :593)
    args = p.parse_args(["train", *SMOKE, "--uncond"])
    _, cfg = _configs(args)
    assert cfg.cond_drop_rate == 1.1

    # multi_cond is negatable (reference default is False)
    args = p.parse_args(["train", *SMOKE, "--no-multi_cond"])
    _, cfg = _configs(args)
    assert not cfg.multi_cond


def test_cli_sampler_flag_sets_default_method(tmp_path, capsys):
    """--sampler bisect must route every pipeline draw through the kernel
    (ops/sample_kernel.py) for the whole process."""
    import controlvar_tpu.ops.sampling as sm

    prev = sm.DEFAULT_METHOD
    try:
        cond = tmp_path / "cond.png"
        from PIL import Image
        import numpy as np_

        Image.fromarray(
            np_.zeros((32, 32, 3), np_.uint8)).save(cond)
        smoke = [a for i, a in enumerate(SMOKE)
                 if a != "--steps" and SMOKE[i - 1] != "--steps"]
        main(["sample", *smoke, "--sampler", "bisect", "--force", "control",
              "--cond_image", str(cond), "--out", str(tmp_path / "s")])
        assert sm.DEFAULT_METHOD == "bisect"
        assert "wrote 2 samples" in capsys.readouterr().out
    finally:
        sm.DEFAULT_METHOD = prev


def test_cli_train_bidirectional_smoke(capsys):
    """The bidirectional ablation trains end-to-end from the CLI
    (reference: train_control_var_hpu.py:192-202)."""
    main(["train", *SMOKE_TRAINER, "--data", "synthetic", "--epochs", "1",
          "--bidirectional", "--type_pos"])
    out = capsys.readouterr().out
    assert "loss=" in out


def test_cli_train_var_pretrained_surgery_smoke(tmp_path, capsys):
    """`train --var_pretrained x.pth --interpos --mpos` runs the full
    .pth-import -> VAR->ControlVAR surgery -> train path from the CLI
    (reference: train_control_var_hpu.py:472-534,597-599)."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    try:
        from models.var import VAR as RefVAR  # type: ignore
        from models.vqvae import VQVAE as RefVQVAE  # type: ignore
    finally:
        sys.path.remove("/root/reference")

    torch.manual_seed(0)
    vae = RefVQVAE(vocab_size=4096, z_channels=32, ch=32,
                   v_patch_nums=(1, 2, 4), test_mode=True)
    var = RefVAR(vae_local=vae, num_classes=1000, depth=2, embed_dim=128,
                 num_heads=2, patch_nums=(1, 2, 4), cond_drop_rate=0.0,
                 flash_if_available=False, fused_if_available=False)
    pth = str(tmp_path / "var_d2.pth")
    torch.save({"model_state_dict": var.state_dict()}, pth)

    main(["train", *SMOKE_TRAINER, "--data", "synthetic", "--epochs", "1",
          "--var_pretrained", pth, "--interpos", "--mpos", "--separator"])
    out = capsys.readouterr().out
    assert "loss=" in out


def test_cli_train_var_ckpt_resume(tmp_path, capsys):
    """train-var checkpoints and resumes from the latest step (the reference
    VAR trainer saves/resumes .pth, train_var_hpu.py)."""
    smoke = [a for i, a in enumerate(SMOKE)
             if a != "--steps" and SMOKE[i - 1] != "--steps"]
    run = ["train-var", *smoke, "--data", "synthetic",
           "--epochs", "1", "--ckpt_dir", str(tmp_path / "ck")]
    main([*run, "--steps", "2"])
    main([*run, "--steps", "3"])
    out = capsys.readouterr().out
    assert "resumed train-var at step 2" in out


def test_experiment_env_knob_list_covers_source():
    """EXPERIMENT_ENV_KNOBS (stripped by bench.py, the A/B tools, and
    conftest) must stay in sync with the CONTROLVAR_* env vars the package
    actually reads — a knob added to the source but not the list would let
    a stale shell export silently change the official bench record."""
    import re
    import subprocess

    from controlvar_tpu.config import EXPERIMENT_ENV_KNOBS

    pkg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "controlvar_tpu")
    found = set()
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                with open(os.path.join(root, f)) as fh:
                    found |= set(re.findall(r"CONTROLVAR_[A-Z_]+", fh.read()))
    # production knobs deliberately NOT stripped (user-facing defaults)
    production = {"CONTROLVAR_SAMPLER"}
    unlisted = found - set(EXPERIMENT_ENV_KNOBS) - production
    assert not unlisted, (
        f"CONTROLVAR_* env vars read by the package but missing from "
        f"EXPERIMENT_ENV_KNOBS (add them or mark production): {unlisted}")
    stale = set(EXPERIMENT_ENV_KNOBS) - found
    assert not stale, f"knobs listed but never read anywhere: {stale}"
