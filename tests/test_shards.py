"""Tar-shard reader + offline tokenization round trip + token train step."""
import io
import json
import os
import tarfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlvar_tpu.config import ControlVARConfig, OptimConfig, VQVAEConfig
from controlvar_tpu.data.build import Loader, create_dataset
from controlvar_tpu.data.shards import (
    TarShardReader,
    TokenShardDataset,
    pretokenize,
    read_token_shard,
    write_token_shard,
)
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.train.train_step import ControlVARTrainStep, init_train_state

VQ_CFG = VQVAEConfig(ch=32, patch_nums=(1, 2, 4), vocab_size=128)
CFG = ControlVARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 4),
    vocab_size=128, cvae=32, num_classes=8, mask_factor=2, multi_cond=True,
)


def test_tar_shard_reader(tmp_path, rng):
    from PIL import Image

    shard = tmp_path / "train-000.tar"
    with tarfile.open(shard, "w") as tf:
        for i in range(3):
            img = Image.fromarray((rng.random((80, 100, 3)) * 255).astype(np.uint8))
            for suffix, im in (("image.png", img), ("control.png", img)):
                buf = io.BytesIO()
                im.save(buf, format="PNG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"sample{i}.{suffix}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
            meta = json.dumps({"cls": i, "type": 1}).encode()
            info = tarfile.TarInfo(f"sample{i}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))

    reader = TarShardReader(str(tmp_path / "train-*.tar"), image_size=64,
                            random_crop=False)
    samples = list(reader)
    assert len(samples) == 3
    assert samples[0]["image"].shape == (64, 64, 3)
    assert int(samples[2]["cls"]) == 2 and int(samples[0]["type"]) == 1


def test_token_shard_roundtrip(tmp_path, rng):
    ctrl = [rng.integers(0, 128, (4, pn * pn)).astype(np.int32) for pn in (1, 2, 4)]
    img = [rng.integers(0, 128, (4, pn * pn)).astype(np.int32) for pn in (1, 2, 4)]
    ign = (rng.random((4, 42)) > 0.3).astype(np.float32)
    path = str(tmp_path / "tok.npz")
    write_token_shard(path, ctrl, img, np.arange(4), np.zeros(4), ign)
    back = read_token_shard(path)
    for a, b in zip(back["ctrl_ids"], ctrl):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(back["ignore_mask"], ign)


def test_pretokenize_and_token_train_step(tmp_path, rng):
    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    ds = create_dataset("synthetic", image_size=64, length=4,
                        patch_nums=(1, 2, 4), num_classes=8)
    loader = Loader(ds, batch_size=2, num_workers=1)
    n = pretokenize(vqvae, vq_params, loader, str(tmp_path / "tok"),
                    compute_dtype=jnp.float32)
    assert n == 2
    shards = TokenShardDataset(str(tmp_path / "tok" / "*.npz"))
    assert len(shards) == 2

    model = ControlVARModel(CFG)
    params = model.init_params(jax.random.key(1))
    optim = OptimConfig(total_batch_size=2)
    state, tx = init_train_state(params, optim)
    stepper = ControlVARTrainStep(model, vqvae, optim, max_steps=10, warmup_steps=1)
    step = jax.jit(
        lambda s, vp, b, k: stepper.step(tx, s, vp, b, k, from_tokens=True)
    )
    batch = next(iter(shards))
    batch = {
        "ctrl_ids": [jnp.asarray(t) for t in batch["ctrl_ids"]],
        "img_ids": [jnp.asarray(t) for t in batch["img_ids"]],
        "cls": jnp.asarray(batch["cls"]),
        "type": jnp.asarray(batch["type"]),
    }
    state, m = step(state, vq_params, batch, jax.random.key(2))
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_token_shard_loader_shards_and_skip(tmp_path, rng):
    """TokenShardLoader mirrors data.build.Loader semantics: padded even
    split across pod shards, seed-deterministic per-epoch shuffle,
    skip_batches for mid-epoch resume."""
    from controlvar_tpu.data.shards import TokenShardLoader

    for i in range(5):
        ctrl = [rng.integers(0, 128, (2, pn * pn)).astype(np.int32) for pn in (1, 2)]
        write_token_shard(str(tmp_path / f"tokens_000_{i:06d}.npz"),
                          ctrl, ctrl, np.full(2, i), np.zeros(2))
    pattern = str(tmp_path / "tokens_*.npz")

    full = TokenShardLoader(pattern, seed=7)
    assert full.steps_per_epoch() == 5
    e0 = [int(b["cls"][0]) for b in full.epoch(0)]
    assert sorted(e0) == list(range(5))
    assert e0 == [int(b["cls"][0]) for b in full.epoch(0)]  # deterministic
    # skip_batches drops exactly the consumed prefix
    assert [int(b["cls"][0]) for b in full.epoch(0, skip_batches=2)] == e0[2:]

    # two pod shards: padded even split covers every shard, each sees 3
    sh = [TokenShardLoader(pattern, seed=7, shard_id=r, num_shards=2)
          for r in range(2)]
    assert all(s.steps_per_epoch() == 3 for s in sh)
    seen = [int(b["cls"][0]) for s in sh for b in s.epoch(0)]
    assert len(seen) == 6 and set(seen) == set(range(5))  # 1 pad duplicate

    with pytest.raises(FileNotFoundError):
        TokenShardLoader(str(tmp_path / "nope_*.npz"))


def test_token_step_matches_pixel_step(tmp_path, rng):
    """Training from pre-tokenized shards must take the SAME optimizer step
    as the pixel path on the same batch: pretokenize uses the step's own
    tokenize dtype (bf16), so the ids — and therefore the teacher-forcing
    inputs, loss and gradients — are identical."""
    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    ds = create_dataset("synthetic", image_size=64, length=4,
                        patch_nums=(1, 2, 4), num_classes=8)
    loader = Loader(ds, batch_size=4, num_workers=1, shuffle=False)
    pretokenize(vqvae, vq_params, loader, str(tmp_path / "tok"))
    tok_batch = read_token_shard(sorted(
        (tmp_path / "tok").glob("*.npz"))[0].as_posix())
    pix_batch = next(iter(loader.epoch(0)))
    np.testing.assert_array_equal(tok_batch["cls"], pix_batch["cls"])

    model = ControlVARModel(CFG)
    params = model.init_params(jax.random.key(1))
    optim = OptimConfig(total_batch_size=4)
    state, tx = init_train_state(params, optim)
    stepper = ControlVARTrainStep(model, vqvae, optim, max_steps=10,
                                  warmup_steps=1)
    key = jax.random.key(2)
    pix = {k: jnp.asarray(pix_batch[k])
           for k in ("image", "mask", "cls", "type")}
    if "ignore_mask" in pix_batch:
        pix["ignore_mask"] = jnp.asarray(pix_batch["ignore_mask"])
        np.testing.assert_array_equal(  # packbits round trip is exact
            tok_batch["ignore_mask"], pix_batch["ignore_mask"])
    tok = {
        "ctrl_ids": [jnp.asarray(t) for t in tok_batch["ctrl_ids"]],
        "img_ids": [jnp.asarray(t) for t in tok_batch["img_ids"]],
        "cls": jnp.asarray(tok_batch["cls"]),
        "type": jnp.asarray(tok_batch["type"]),
    }
    if "ignore_mask" in tok_batch:
        tok["ignore_mask"] = jnp.asarray(tok_batch["ignore_mask"])

    s_pix, m_pix = jax.jit(
        lambda s, vp, b, k: stepper.step(tx, s, vp, b, k)
    )(state, vq_params, pix, key)
    s_tok, m_tok = jax.jit(
        lambda s, vp, b, k: stepper.step(tx, s, vp, b, k, from_tokens=True)
    )(state, vq_params, tok, key)

    # ids identical => the two steps run the same transformer math; allow
    # only compiler-fusion-level rounding between the two programs
    np.testing.assert_allclose(float(m_tok["loss"]), float(m_pix["loss"]),
                               rtol=0, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6),
        s_tok.params, s_pix.params,
    )
