"""ImageNet-with-conditions dataset (the primary ControlVAR training set).

Pseudo-labeled ImageNet where every image has 4 condition renderings: an
instance mask (COCO-RLE JSON -> colorized), canny / depth / normal JPEGs,
in sibling directories `{split}_{cond}/` mirroring `{split}/`
(reference: datasets/imagenetC.py, README.md:36-48).

Host-side pipeline feeding the TPU: pure numpy/PIL, no torch. Batches are
NHWC float32; the per-token ignore-mask zeroes loss on black mask regions at
scales >= 5 in both mask-first and image-first orders
(reference: imagenetC.py:152-183).
"""
from __future__ import annotations

import dataclasses
import glob
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from controlvar_tpu.config import COND_TYPES, PATCH_NUMS_DEFAULT
from controlvar_tpu.data.colormap import grid_color_map, render_instance_mask
from controlvar_tpu.data.transforms import PairedTransform

COND_IDX = {"mask": 0, "canny": 1, "depth": 2, "normal": 3}


def _nearest_downsample(m: np.ndarray, out: int) -> np.ndarray:
    """torch F.interpolate(mode='nearest') semantics: src = floor(i*n/out)."""
    n = m.shape[0]
    idx = np.minimum((np.arange(out) * n / out).astype(np.int64), n - 1)
    return m[np.ix_(idx, idx)]


def token_ignore_masks(
    cond_img: np.ndarray,
    patch_nums: Sequence[int] = PATCH_NUMS_DEFAULT,
    separator: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-token loss weights from a normalized control image (H, W, 3).

    Black pixels (normalized sum == -3) are unlabeled background: their
    mask-segment tokens at scales >= 5 are zero-weighted. Returns
    (mask_first_weights, image_first_weights), each (L,) float32.
    """
    ignore = (cond_img.sum(axis=-1) != -3.0).astype(np.float32)  # (H, W)
    out_mf: List[np.ndarray] = []
    out_if: List[np.ndarray] = []
    for si, pn in enumerate(patch_nums):
        num_sp = 1 if (si != 0 and separator) else 0
        ones = np.ones((pn * pn + num_sp,), np.float32)
        if si < 5:
            out_mf.extend([ones, ones])
            out_if.extend([ones, ones])
        else:
            ds = _nearest_downsample(ignore, pn).reshape(-1)
            if separator:
                ds = np.concatenate([np.ones((1,), np.float32), ds])
            out_mf.extend([ds, ones])
            out_if.extend([ones, ds])
    return np.concatenate(out_mf), np.concatenate(out_if)


@dataclasses.dataclass
class ImagenetCDataset:
    """Index-addressable sample source (wrap in data.build.Loader to batch)."""

    root: str
    split: str = "train"
    image_size: int = 256
    patch_nums: Sequence[int] = PATCH_NUMS_DEFAULT
    separator: bool = False
    val_cond: str = "depth"
    random_crop: Optional[bool] = None  # default: train=True, val=False

    def __post_init__(self):
        self._load_paths()
        classes = sorted(
            e.name for e in os.scandir(os.path.join(self.root, self.split)) if e.is_dir()
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.colormap = grid_color_map()
        self.transform = PairedTransform(
            self.image_size,
            random_crop=(self.split == "train") if self.random_crop is None else self.random_crop,
        )
        self.cond_paths = {
            "mask": self.mask_paths,
            "canny": self.canny_paths,
            "depth": self.depth_paths,
            "normal": self.normal_paths,
        }

    def _load_paths(self):
        cache = os.path.join(self.root, f"{self.split}_cond_info.json")
        if os.path.exists(cache):
            with open(cache) as f:
                info = json.load(f)
            self.mask_paths = info["mask"]
            self.canny_paths = info["canny"]
            self.depth_paths = info["depth"]
            self.normal_paths = info["normal"]
            return
        pat = lambda cond, ext: sorted(
            glob.glob(os.path.join(self.root, f"{self.split}_{cond}", "*", f"*.{ext}"))
        )
        self.mask_paths = pat("mask", "json")
        self.canny_paths = pat("canny", "jpeg")
        self.depth_paths = pat("depth", "jpeg")
        self.normal_paths = pat("normal", "jpeg")
        with open(cache, "w") as f:
            json.dump(
                {
                    "mask": self.mask_paths,
                    "canny": self.canny_paths,
                    "depth": self.depth_paths,
                    "normal": self.normal_paths,
                },
                f,
            )

    def __len__(self) -> int:
        return max(len(p) for p in (self.mask_paths, self.canny_paths,
                                    self.depth_paths, self.normal_paths))

    def sample(self, index: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        if self.split == "val":
            cond_type = self.val_cond
        else:
            cond_type = COND_TYPES[int(rng.integers(0, 4))]
        paths = self.cond_paths[cond_type]
        cond_path = paths[index % len(paths)]
        image_path = (
            cond_path.replace(f"{self.split}_{cond_type}", self.split)
            .replace(".json", ".JPEG")
            .replace(".jpeg", ".JPEG")
        )
        cls = self.class_to_idx[os.path.basename(os.path.dirname(image_path))]
        image = Image.open(image_path).convert("RGB")

        if cond_type == "mask":
            with open(cond_path) as f:
                anns = json.load(f)
            # 512 is the fixed labelling resolution (reference: imagenetC.py:143)
            cond = Image.fromarray(
                render_instance_mask(anns, 512, self.colormap).astype(np.uint8)
            )
        else:
            cond = Image.open(cond_path).convert("RGB")
        cond = cond.resize(image.size)

        img_arr, cond_arr = self.transform(image, cond, rng=rng)

        if cond_type == "mask":
            ign_mf, ign_if = token_ignore_masks(cond_arr, self.patch_nums, self.separator)
        else:
            L = sum(pn * pn * 2 for pn in self.patch_nums)
            if self.separator:
                L += (len(self.patch_nums) - 1) * 2
            ign_mf = np.ones((L,), np.float32)
            ign_if = np.ones((L,), np.float32)

        return {
            "image": img_arr,
            "mask": cond_arr,
            "cls": np.int32(cls),
            "type": np.int32(COND_IDX[cond_type]),
            "ignore_mask": ign_mf,
            "ignore_mask_": ign_if,
        }


@dataclasses.dataclass
class SyntheticControlDataset:
    """Random-data stand-in with the same sample schema (tests, benches,
    smoke training without the 400 GB condition dataset)."""

    image_size: int = 256
    num_classes: int = 1000
    patch_nums: Sequence[int] = PATCH_NUMS_DEFAULT
    separator: bool = False
    length: int = 10000

    def __len__(self):
        return self.length

    def sample(self, index: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        hw = self.image_size
        L = sum(pn * pn * 2 for pn in self.patch_nums)
        if self.separator:
            L += (len(self.patch_nums) - 1) * 2
        return {
            "image": rng.random((hw, hw, 3), np.float32) * 2 - 1,
            "mask": rng.random((hw, hw, 3), np.float32) * 2 - 1,
            "cls": np.int32(rng.integers(0, self.num_classes)),
            "type": np.int32(rng.integers(0, 4)),
            "ignore_mask": np.ones((L,), np.float32),
            "ignore_mask_": np.ones((L,), np.float32),
        }
