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
