"""Training infrastructure tests: lr/wd schedule parity vs the reference,
weight-decay masking, a full fused train step (loss decreases), and the
sharded multi-device train step on the virtual CPU mesh."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlvar_tpu.config import ControlVARConfig, OptimConfig, VQVAEConfig
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.train.lr_schedule import lr_at_step, wd_at_step
from controlvar_tpu.train.param_groups import weight_decay_mask
from controlvar_tpu.train.train_step import (
    ControlVARTrainStep,
    init_train_state,
    interleave_tokens,
)

sys.path.insert(0, "/root/reference")

VQ_CFG = VQVAEConfig(ch=32, patch_nums=(1, 2, 4), vocab_size=128)
CFG = ControlVARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 4),
    vocab_size=128, cvae=32, num_classes=8, mask_factor=2, multi_cond=True,
)


@pytest.mark.parametrize("sched", ["cos", "lin", "lin0", "lin00", "lin0.3", "exp"])
def test_lr_schedule_matches_reference(sched):
    """Oracle: drive the reference lr_wd_annealing with a dummy optimizer."""
    import types

    import torch

    # reference utils/__init__ imports wandb (absent here); stub it
    if "wandb" not in sys.modules:
        import importlib.machinery

        mod = types.ModuleType("wandb")
        mod.__spec__ = importlib.machinery.ModuleSpec("wandb", None)
        sys.modules["wandb"] = mod
    from utils.lr_control import lr_wd_annealing  # type: ignore

    dummy = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    peak, wd, wd_end, wp_it, max_it = 3e-4, 0.05, 0.01, 10, 100
    for step in [0, 3, 9, 10, 11, 40, 70, 99]:
        _, ref_lr, _, ref_wd = lr_wd_annealing(
            sched, dummy, peak, wd, wd_end, step, wp_it, max_it
        )
        our_lr = float(lr_at_step(sched, step, peak, wp_it, max_it))
        our_wd = float(wd_at_step(step, wd, wd_end, max_it))
        np.testing.assert_allclose(our_lr, ref_lr, rtol=1e-5, err_msg=f"{sched}@{step}")
        np.testing.assert_allclose(our_wd, ref_wd, rtol=1e-5)


def test_weight_decay_mask():
    model = ControlVARModel(CFG)
    params = model.init_params(jax.random.key(0))
    mask = weight_decay_mask(params)
    assert mask["blocks"]["qkv_kernel"] is True
    assert mask["blocks"]["q_bias"] is False
    assert mask["blocks"]["proj"]["kernel"] is True
    assert mask["blocks"]["proj"]["bias"] is False
    assert mask["pos_1LC"] is False
    assert mask["pos_start"] is False
    assert mask["class_emb"] is False
    assert mask["cond_embed"] is False
    assert mask["lvl_embed"] is False
    assert mask["word_embed"]["kernel"] is True
    assert mask["head"]["kernel"] is True


def test_interleave_layout(rng):
    B = 2
    pns = (1, 2, 4)
    c_ids = [jnp.asarray(rng.integers(0, 9, (B, p * p))) for p in pns]
    i_ids = [jnp.asarray(rng.integers(10, 19, (B, p * p))) for p in pns]
    c_h = [jnp.zeros((B, pns[k + 1] ** 2, 4)) for k in range(2)]
    i_h = [jnp.ones((B, pns[k + 1] ** 2, 4)) for k in range(2)]
    labels, x_tf = interleave_tokens(c_ids, i_ids, c_h, i_h, mask_first=True)
    assert labels.shape == (B, 2 * 21)
    # per-scale layout: [c_k | i_k]
    assert bool((labels[:, 0:1] < 10).all()) and bool((labels[:, 1:2] >= 10).all())
    assert bool((labels[:, 2:6] < 10).all()) and bool((labels[:, 6:10] >= 10).all())
    assert x_tf.shape == (B, 2 * 20, 4)
    assert float(x_tf[:, :4].sum()) == 0.0 and float(x_tf[:, 4:8].mean()) == 1.0


def _batch(rng, B=2):
    hw = VQ_CFG.patch_nums[-1] * 16
    return {
        "image": jnp.asarray(rng.random((B, hw, hw, 3)).astype(np.float32) * 2 - 1),
        "mask": jnp.asarray(rng.random((B, hw, hw, 3)).astype(np.float32) * 2 - 1),
        "cls": jnp.asarray(rng.integers(0, CFG.num_classes, (B,)).astype(np.int32)),
        "type": jnp.asarray(rng.integers(0, 4, (B,)).astype(np.int32)),
    }


def test_train_step_loss_decreases(rng):
    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(CFG)
    params = model.init_params(jax.random.key(1))
    optim = OptimConfig(base_lr=1e-2, total_batch_size=512)  # lr = 1e-2
    state, tx = init_train_state(params, optim)
    stepper = ControlVARTrainStep(model, vqvae, optim, max_steps=100, warmup_steps=2)

    step = jax.jit(lambda s, vp, b, k: stepper.step(tx, s, vp, b, k))
    batch = _batch(rng)
    losses = []
    for i in range(8):
        state, m = step(state, vq_params, batch, jax.random.key(100 + i))
        losses.append(float(m["loss"]))
    assert int(state.step) == 8
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"no learning: {losses}"


def test_sharded_train_step_on_mesh(rng, cpu_mesh_devices):
    """Full dp x tp train step on the 8-device virtual CPU mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from controlvar_tpu.parallel.mesh import make_mesh, param_shardings

    mesh = make_mesh(data=4, model=2, devices=cpu_mesh_devices)
    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(CFG)
    params = model.init_params(jax.random.key(1))
    optim = OptimConfig(total_batch_size=8)
    state, tx = init_train_state(params, optim)
    stepper = ControlVARTrainStep(model, vqvae, optim, max_steps=100, warmup_steps=2)

    p_sh = param_shardings(mesh, state.params)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    state = state._replace(params=jax.device_put(state.params, p_sh))
    batch = _batch(rng, B=8)
    batch = jax.device_put(batch, {k: batch_sh for k in batch})
    vq_params = jax.device_put(vq_params, jax.tree_util.tree_map(lambda _: repl, vq_params))

    step = jax.jit(lambda s, vp, b, k: stepper.step(tx, s, vp, b, k))
    with mesh:
        state2, m = step(state, vq_params, batch, jax.random.key(5))
        jax.block_until_ready(state2.params)
    assert np.isfinite(float(m["loss"]))
    # TP: qkv kernel is actually sharded over the model axis
    qkv_shard = state2.params["blocks"]["qkv_kernel"].sharding
    assert qkv_shard.spec == P(None, None, "model")


def test_grad_accum_matches_big_batch(rng):
    """A 2-microbatch accumulated step must produce the same update as the
    single big-batch step (cond_drop_rate=0 so per-microbatch keys are inert;
    reference flag: train_control_var_hpu.py:65,249) — INCLUDING under a
    non-trivial ignore mask whose weight is split unevenly across
    microbatches (the realistic ImagenetC case)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, cond_drop_rate=0.0, drop_path_rate=0.0)
    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(cfg)
    params = model.init_params(jax.random.key(1))
    optim = OptimConfig(base_lr=1e-3, total_batch_size=512)
    stepper = ControlVARTrainStep(model, vqvae, optim, max_steps=100, warmup_steps=2)
    batch = _batch(rng, B=4)
    # uneven per-microbatch weight: microbatch 0 keeps ~80% of tokens,
    # microbatch 1 ~30% — averaging per-microbatch weighted means would NOT
    # equal the global weighted mean here
    L = cfg.seq_len
    ign = (rng.random((4, L)) < np.array([0.8, 0.8, 0.3, 0.3])[:, None])
    batch["ignore_mask"] = jnp.asarray(ign.astype(np.float32))

    state1, tx1 = init_train_state(params, optim)
    s_big, m_big = jax.jit(
        lambda s, vp, b, k: stepper.step(tx1, s, vp, b, k)
    )(state1, vq_params, batch, jax.random.key(7))

    state2, tx2 = init_train_state(params, optim)
    s_acc, m_acc = jax.jit(
        lambda s, vp, b, k: stepper.step(tx2, s, vp, b, k, accum=2)
    )(state2, vq_params, batch, jax.random.key(7))

    np.testing.assert_allclose(float(m_acc["loss"]), float(m_big["loss"]), rtol=1e-5)
    flat_big = jax.tree_util.tree_leaves(s_big.params)
    flat_acc = jax.tree_util.tree_leaves(s_acc.params)
    for a, b in zip(flat_acc, flat_big):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_separator_train_step_runs(rng):
    """separator=True training: labels must include separator-class targets
    aligned with the spliced sequence (reference:
    train_control_var_hpu.py:216-228); logits/labels shapes agree and the
    step runs."""
    import dataclasses

    cfg = dataclasses.replace(CFG, separator=True)
    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(cfg)
    params = model.init_params(jax.random.key(1))
    optim = OptimConfig(base_lr=1e-3, total_batch_size=512)
    state, tx = init_train_state(params, optim)
    stepper = ControlVARTrainStep(model, vqvae, optim, max_steps=100, warmup_steps=2)
    state2, m = jax.jit(lambda s, vp, b, k: stepper.step(tx, s, vp, b, k))(
        state, vq_params, _batch(rng), jax.random.key(3)
    )
    assert np.isfinite(float(m["loss"]))
    # label layout check: separator targets land at the spliced slots
    ids = [jnp.zeros((2, p * p), jnp.int32) for p in cfg.patch_nums]
    labels, _ = interleave_tokens(
        ids, ids, [jnp.zeros((2, p * p, 4)) for p in cfg.patch_nums[1:]],
        [jnp.zeros((2, p * p, 4)) for p in cfg.patch_nums[1:]],
        separator=True, vocab_size=cfg.vocab_size,
    )
    assert labels.shape == (2, cfg.seq_len)
    # scale 1 segment: [c(4), sp, i(4), sp]
    assert int(labels[0, 2 + 4]) == cfg.vocab_size + 0
    assert int(labels[0, 2 + 9]) == cfg.vocab_size + 1


def test_splice_separator_ones_layout():
    """Weight-1 columns land exactly at separator slots: the spliced mask
    must align with separator-spliced labels (the reference dataset emits
    the 1378-long mask directly, datasets/imagenetC.py:152-183)."""
    import jax.numpy as jnp
    import numpy as np

    from controlvar_tpu.train.train_step import splice_separator_ones

    patch_nums = (1, 2, 3)
    B = 2
    segs = []
    for pn in patch_nums:
        for _ in range(2):
            segs.append(np.full((B, pn * pn), 0.5, np.float32))
    ign = jnp.asarray(np.concatenate(segs, axis=1))
    out = np.asarray(splice_separator_ones(ign, patch_nums))
    # 6 segments, separators after every segment except the scale-0 pair
    n_sep = 2 * len(patch_nums) - 2
    assert out.shape == (B, ign.shape[1] + n_sep)
    # walk the spliced layout: seg, seg, (seg, 1)*
    off = 0
    for i, pn in enumerate([1, 1, 2, 2, 3, 3]):
        seg = out[:, off:off + pn * pn]
        np.testing.assert_array_equal(seg, 0.5)
        off += pn * pn
        if i >= 2:
            np.testing.assert_array_equal(out[:, off], 1.0)
            off += 1
    assert off == out.shape[1]


def test_mid_epoch_resume_matches_uninterrupted_run(tmp_path):
    """Stopping at step 3 and resuming to step 6 must consume EXACTLY the
    batches and rng keys of an uninterrupted 6-step run (deterministic
    per-epoch shuffle + skip; the reference's mid-epoch batch skip is a
    broken no-op stub, train_control_var_hpu.py:138-143). Verified bitwise
    on the exported weights."""
    from controlvar_tpu.cli.main import main
    from controlvar_tpu.ckpt.torch_import import load_torch_state_dict

    COMMON = ["--depth", "2", "--vae_ch", "32", "--patch_nums", "1", "2", "4",
              "--seed", "0", "--batch_size", "8", "--data", "synthetic",
              "--epochs", "1", "--lr", "0.01"]

    def export(ckpt_dir, out):
        main(["export", *COMMON[:10], "--ckpt_dir", ckpt_dir, "--out", out])
        return load_torch_state_dict(out)

    # --stop_after keeps the lr horizon at the full epochs*spe in ALL runs
    # (exactly a preemption), unlike --steps which also rescales the anneal
    a = str(tmp_path / "a")
    main(["train", *COMMON, "--stop_after", "6", "--ckpt_dir", a])
    w_straight = export(a, str(tmp_path / "a.pth"))

    b = str(tmp_path / "b")
    main(["train", *COMMON, "--stop_after", "3", "--ckpt_dir", b])
    main(["train", *COMMON, "--stop_after", "6", "--ckpt_dir", b])  # resume at 3
    w_resumed = export(b, str(tmp_path / "b.pth"))

    assert set(w_straight) == set(w_resumed)
    for k in w_straight:
        np.testing.assert_array_equal(w_straight[k], w_resumed[k], err_msg=k)
