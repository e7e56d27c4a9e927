"""Sharded dataset IO: tar-shard reading and offline pre-tokenization.

Two pieces:
  * TarShardReader — webdataset-style sequential reader over .tar shards of
    (image, control, metadata) triples (the reference carries an unused
    torchdata pipe for this, reference: datasets/utils.py:80-122);
  * token shards — offline tokenization writes per-batch token .npz shards so
    training skips the 2 VQVAE encoder passes per step entirely (a
    TPU-friendly accelerant the reference lacks: tokenize once, stream
    int16 tokens at ~1/1000th the byte volume of pixels).
"""
from __future__ import annotations

import dataclasses
import glob
import io
import json
import os
import tarfile
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class TarShardReader:
    """Iterates samples from `{prefix}-{idx}.tar` shards.

    Each sample is a basename with member files:
      <key>.image.jpg/png   <key>.control.jpg/png   <key>.json (cls, type)
    """

    pattern: str  # glob, e.g. /data/shards/train-*.tar
    image_size: int = 256
    random_crop: bool = True

    def __post_init__(self):
        from controlvar_tpu.data.transforms import PairedTransform

        self.shards = sorted(glob.glob(self.pattern))
        self.transform = PairedTransform(self.image_size, random_crop=self.random_crop)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from PIL import Image

        rng = np.random.default_rng(0)
        for shard in self.shards:
            with tarfile.open(shard) as tf:
                groups: Dict[str, Dict[str, bytes]] = {}
                for m in tf.getmembers():
                    if not m.isfile():
                        continue
                    base, _, rest = m.name.partition(".")
                    groups.setdefault(base, {})[rest] = tf.extractfile(m).read()
                for key in sorted(groups):
                    g = groups[key]
                    img_bytes = next((g[k] for k in g if k.startswith("image")), None)
                    ctl_bytes = next((g[k] for k in g if k.startswith("control")), None)
                    meta = json.loads(g.get("json", b"{}"))
                    if img_bytes is None:
                        continue
                    image = Image.open(io.BytesIO(img_bytes)).convert("RGB")
                    control = (
                        Image.open(io.BytesIO(ctl_bytes)).convert("RGB")
                        if ctl_bytes is not None else image
                    )
                    img, ctl = self.transform(image, control.resize(image.size), rng=rng)
                    yield {
                        "image": img,
                        "mask": ctl,
                        "cls": np.int32(meta.get("cls", 0)),
                        "type": np.int32(meta.get("type", 0)),
                    }


# ----------------------------------------------------------------------------
# offline tokenization
# ----------------------------------------------------------------------------

def write_token_shard(path: str, ctrl_ids: Sequence[np.ndarray],
                      img_ids: Sequence[np.ndarray], cls: np.ndarray,
                      cond_type: np.ndarray,
                      ignore_mask: Optional[np.ndarray] = None) -> None:
    """One shard = one batch of per-scale token ids (int16: V=4096 fits)."""
    arrays = {
        f"ctrl_{i}": np.asarray(t, np.int16) for i, t in enumerate(ctrl_ids)
    }
    arrays.update({f"img_{i}": np.asarray(t, np.int16) for i, t in enumerate(img_ids)})
    arrays["cls"] = np.asarray(cls, np.int32)
    arrays["type"] = np.asarray(cond_type, np.int32)
    if ignore_mask is not None:
        arrays["ignore_mask"] = np.packbits(
            np.asarray(ignore_mask, np.float32) > 0.5, axis=-1
        )
        arrays["ignore_len"] = np.asarray([ignore_mask.shape[-1]], np.int32)
    np.savez_compressed(path, **arrays)


def read_token_shard(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        num_scales = sum(1 for k in z.files if k.startswith("ctrl_"))
        out = {
            "ctrl_ids": [z[f"ctrl_{i}"].astype(np.int32) for i in range(num_scales)],
            "img_ids": [z[f"img_{i}"].astype(np.int32) for i in range(num_scales)],
            "cls": z["cls"],
            "type": z["type"],
        }
        if "ignore_mask" in z.files:
            L = int(z["ignore_len"][0])
            out["ignore_mask"] = np.unpackbits(
                z["ignore_mask"], axis=-1
            )[..., :L].astype(np.float32)
        return out


def pretokenize(vqvae, vq_params, loader, out_dir: str, epochs: Sequence[int] = (0,),
                compute_dtype=None) -> int:
    """Tokenize a pixel Loader into token shards. Returns shard count."""
    import jax
    import jax.numpy as jnp

    if compute_dtype is None:
        compute_dtype = jnp.bfloat16
    os.makedirs(out_dir, exist_ok=True)
    tok = jax.jit(lambda vp, x: vqvae.img_to_ids(vp, x, compute_dtype=compute_dtype))
    n = 0
    for epoch in epochs:
        for batch in loader.epoch(epoch):
            ctrl = [np.asarray(t) for t in tok(vq_params, jnp.asarray(batch["mask"]))]
            img = [np.asarray(t) for t in tok(vq_params, jnp.asarray(batch["image"]))]
            write_token_shard(
                os.path.join(out_dir, f"tokens_{epoch:03d}_{n:06d}.npz"),
                ctrl, img, batch["cls"], batch["type"],
                batch.get("ignore_mask"),
            )
            n += 1
    return n


@dataclasses.dataclass
class TokenShardDataset:
    """Streams pre-tokenized batches (feed to TokenTrainStep)."""

    pattern: str  # glob over token_*.npz

    def __post_init__(self):
        self.paths = sorted(glob.glob(self.pattern))

    def __len__(self):
        return len(self.paths)

    def __iter__(self):
        for p in self.paths:
            yield read_token_shard(p)


@dataclasses.dataclass
class TokenShardLoader:
    """Trainer-compatible loader over pre-tokenized batch shards.

    Mirrors `data.build.Loader`'s interface (`steps_per_epoch()` /
    `epoch(epoch, skip_batches=)`) so `train.trainer.Trainer` can consume
    token batches through `ControlVARTrainStep.loss_fn_tokens`
    (`from_tokens=True`): one shard file = one training batch, shuffled
    per epoch with a seed-deterministic permutation and split evenly across
    pod processes (padded even split, mirroring the pixel Loader's
    DistributedSampler semantics — reference:
    train_control_var_hpu.py:569-574)."""

    pattern: str  # glob over tokens_*.npz written by `pretokenize`
    shuffle: bool = True
    seed: int = 0
    shard_id: int = 0
    num_shards: int = 1

    def __post_init__(self):
        self.paths = sorted(glob.glob(self.pattern))
        if not self.paths:
            raise FileNotFoundError(f"no token shards match {self.pattern!r}")

    def steps_per_epoch(self) -> int:
        return -(-len(self.paths) // self.num_shards)

    def epoch(self, epoch: int, skip_batches: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        idx = np.arange(len(self.paths))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        pad = np.resize(idx, self.steps_per_epoch() * self.num_shards)
        mine = pad[self.shard_id::self.num_shards]
        for b in mine[max(0, skip_batches):]:
            yield read_token_shard(self.paths[int(b)])
