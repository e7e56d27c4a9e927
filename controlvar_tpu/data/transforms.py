"""Paired image+control transforms (host side, PIL + numpy).

The image and its control map must be processed with IDENTICAL parameters
(reference: datasets/transforms_image.py:103-121): Lanczos resize of the
shorter side to round(1.125 * size), Random/CenterCrop to size, random
horizontal flip, then scale to [-1, 1] float (ToTensor + Normalize(.5,.5)).
Output layout is NHWC float32 (TPU-native), not NCHW.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
from PIL import Image


def _resize_shorter(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    if w <= h:
        new = (size, max(1, round(h * size / w)))
    else:
        new = (max(1, round(w * size / h)), size)
    return img.resize(new, Image.LANCZOS)


def _to_array(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0  # Normalize(mean=.5, std=.5)


@dataclasses.dataclass
class PairedTransform:
    image_size: int = 256
    random_crop: bool = False  # True for train, False for val
    flip_prob: float = 0.5
    mid_res: float = 1.125

    def __call__(
        self,
        image: Image.Image,
        control: Optional[Image.Image] = None,
        rng: Optional[np.random.Generator] = None,
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        rng = rng or np.random.default_rng()
        size = self.image_size
        mid = round(self.mid_res * size)
        image = _resize_shorter(image, mid)
        if control is not None:
            control = _resize_shorter(control, mid)
        w, h = image.size
        if self.random_crop:
            top = int(rng.integers(0, h - size + 1))
            left = int(rng.integers(0, w - size + 1))
        else:
            top = (h - size) // 2
            left = (w - size) // 2
        box = (left, top, left + size, top + size)
        image = image.crop(box)
        if control is not None:
            control = control.crop(box)
        if self.random_crop and rng.random() < self.flip_prob:
            image = image.transpose(Image.FLIP_LEFT_RIGHT)
            if control is not None:
                control = control.transpose(Image.FLIP_LEFT_RIGHT)
        return _to_array(image), None if control is None else _to_array(control)
