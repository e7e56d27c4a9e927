"""Tests for the remaining inventory components: dual-codebook mask VQVAE,
extra dataset machinery, utils, segmentation losses, eval helpers."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlvar_tpu.config import VQVAEConfig


def test_mask_vqvae_joint_forward(rng):
    from controlvar_tpu.models.vqvae_mask import MaskVQVAE

    cfg = VQVAEConfig(ch=32, patch_nums=(1, 2), vocab_size=64)
    model = MaskVQVAE(cfg)
    params = model.init_params(jax.random.key(0))
    assert "mask_quantize" in params and "filter" in params
    img = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32) * 2 - 1)
    msk = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32) * 2 - 1)

    def loss_fn(p):
        rec_i, rec_m, usage, mvq, vq = model.forward_train_joint(
            p, img, msk, compute_dtype=jnp.bfloat16
        )
        return jnp.mean((rec_i - img) ** 2) + mvq + vq, (rec_i, rec_m)

    (loss, (rec_i, rec_m)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params)
    assert rec_i.shape == img.shape and rec_m.shape == msk.shape
    assert np.isfinite(float(loss))
    # mask branch is no-grad into encoder inputs, but mask codebook learns
    g_mq = grads["mask_quantize"]["embedding"]
    assert float(jnp.abs(g_mq).max()) > 0.0


def test_radial_sorted_instance_map(rng):
    from controlvar_tpu.data.datasets_extra import radial_sorted_instance_map

    m1 = np.zeros((64, 64), np.uint8); m1[5:15, 5:15] = 1    # near origin
    m2 = np.zeros((64, 64), np.uint8); m2[40:60, 40:60] = 1  # far
    out = radial_sorted_instance_map([m2, m1], 64)
    assert out.shape == (64, 64)
    assert out[10, 10] == 0 and out[50, 50] == 1  # sorted by radius


def test_polygons_to_mask():
    from controlvar_tpu.data.datasets_extra import polygons_to_mask

    sq = [[10, 10, 30, 10, 30, 30, 10, 30]]
    m = polygons_to_mask(sq, 40, 40)
    assert m[20, 20] == 1 and m[5, 5] == 0


def test_apply_color_map():
    from controlvar_tpu.data.colormap import ade_palette
    from controlvar_tpu.data.datasets_extra import apply_color_map

    ids = np.array([[0, 1], [2, 152]])
    cm = ade_palette()
    out = apply_color_map(ids, cm)
    assert out.shape == (2, 2, 3)
    np.testing.assert_array_equal(out[0, 0], [0, 0, 0])  # background black
    np.testing.assert_array_equal(out[0, 1], [120, 120, 120])  # ADE row 1
    np.testing.assert_array_equal(out[1, 1], cm[152 % 151].astype(np.uint8))


def test_ade_palette_matches_reference():
    """The palette is the reference's hand-written 151-entry table verbatim
    (reference: datasets/color_map.py) so ImagenetS/SA1B/COCO renderings
    match reference pixels."""
    import importlib.util

    from controlvar_tpu.data.colormap import ade_palette

    spec = importlib.util.spec_from_file_location(
        "ref_color_map", "/root/reference/datasets/color_map.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    np.testing.assert_array_equal(ade_palette(), mod.mask_colormap)


def test_segmentation_losses(rng):
    from controlvar_tpu.losses.segmentation import bce_dice_loss, dice_loss

    logits = jnp.asarray(rng.standard_normal((2, 16, 16)).astype(np.float32))
    targets = jnp.asarray((rng.random((2, 16, 16)) > 0.5).astype(np.float32))
    assert 0.0 <= float(dice_loss(logits, targets)) <= 1.0
    assert np.isfinite(float(bce_dice_loss(logits, targets)))
    # perfect prediction -> near-zero dice
    big = jnp.where(targets > 0, 50.0, -50.0)
    assert float(dice_loss(big, targets)) < 0.01


def test_metric_logger_and_tracker(tmp_path, capsys):
    from controlvar_tpu.utils.misc import MetricLogger, SmoothedValue, seed_everything
    from controlvar_tpu.utils.tracker import Tracker

    seed_everything(0)
    sv = SmoothedValue(window_size=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        sv.update(v)
    assert sv.avg == 3.0 and sv.global_avg == 2.5
    ml = MetricLogger()
    for _ in ml.log_every(range(5), print_freq=2, header="t"):
        ml.update(loss=1.0)
    assert "loss" in str(ml)

    tr = Tracker("proj", name="run", out_dir=str(tmp_path))  # no wandb -> jsonl
    tr.log({"loss": 0.5}, step=1)
    tr.finish()
    files = list(tmp_path.glob("metrics_*.jsonl"))
    assert files and "loss" in files[0].read_text()


def test_class_shard():
    from controlvar_tpu.eval.harness import class_shard

    shards = [class_shard(1000, i, 3) for i in range(3)]
    assert sum(len(s) for s in shards) == 1000
    assert shards[-1][-1] == 999
    assert len(set().union(*map(set, shards))) == 1000
