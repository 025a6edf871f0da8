"""Transforms / collators / samplers tests (reference ships none, SURVEY.md §4)."""
import numpy as np
import pytest

from easyhec_tpu.data.batching import (
    ImageSizeBatchSampler,
    IterationBasedBatchSampler,
    OrderedShardSampler,
    default_collate,
    padded_collate,
)
from easyhec_tpu.data.transforms import (
    CenterCrop,
    ClipRange,
    ColorJitter,
    Compose,
    Normalize,
    RandomHorizontalFlip,
    Resize,
    ToFloat,
    build_transforms,
)


def test_tofloat_normalize():
    img = (np.ones((4, 4, 3)) * 255).astype(np.uint8)
    t = Compose([ToFloat(), Normalize(mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5])])
    out, _, _ = t(img)
    assert out.dtype == np.float32
    assert np.allclose(out, 1.0)


def test_resize_min_max():
    img = np.random.default_rng(0).random((100, 200, 3)).astype(np.float32)
    mask = (img[..., 0] > 0.5).astype(np.float32)
    out, m, _ = Resize(min_size=50, max_size=80)(img, mask)
    assert min(out.shape[:2]) <= 50 and max(out.shape[:2]) <= 80
    assert m.shape == out.shape[:2]
    assert set(np.unique(m)).issubset({0.0, 1.0})  # nearest keeps mask binary


def test_center_crop_shifts_K():
    img = np.zeros((100, 200, 3), np.float32)
    K = np.array([[100.0, 0, 100], [0, 100, 50], [0, 0, 1]], np.float32)
    out, _, aux = CenterCrop(width=100, height=60)(img, None, K=K)
    assert out.shape[:2] == (60, 100)
    assert aux["K"][0, 2] == pytest.approx(100 - 50)
    assert aux["K"][1, 2] == pytest.approx(50 - 20)


def test_flip_and_jitter_deterministic():
    rng = np.random.default_rng(1)
    img = np.arange(12, dtype=np.float32).reshape(2, 2, 3) / 12
    out, _, _ = RandomHorizontalFlip(prob=1.0, rng=rng)(img)
    assert np.allclose(out[:, 0], img[:, 1])
    out2, _, _ = ColorJitter(brightness=0.5, rng=np.random.default_rng(2))(img)
    assert out2.shape == img.shape and out2.min() >= 0 and out2.max() <= 1


def test_clip_range_and_builder():
    t = build_transforms(
        [{"name": "clip_range", "range": [0.2, 0.8]}, {"name": "to_float"}]
    )
    out, _, _ = t(np.linspace(0, 1, 10, dtype=np.float32))
    assert out.min() == pytest.approx(0.2) and out.max() == pytest.approx(0.8)


def test_default_collate():
    items = [{"a": np.ones(3), "b": 2.0}, {"a": np.zeros(3), "b": 3.0}]
    out = default_collate(items)
    assert out["a"].shape == (2, 3) and out["b"].shape == (2,)


def test_padded_collate_ragged():
    items = [
        {"img": np.ones((4, 6)), "name": "x"},
        {"img": np.ones((3, 8)), "name": "y"},
    ]
    out = padded_collate(items)
    assert out["img"].shape == (2, 4, 8)
    assert out["img_valid"].sum() == 4 * 6 + 3 * 8
    assert out["name"] == ["x", "y"]


def test_iteration_based_sampler():
    batches = [[0, 1], [2, 3], [4, 5]]
    s = IterationBasedBatchSampler(batches, num_iterations=7)
    got = list(s)
    assert len(got) == 7
    assert got[3] == [0, 1]  # wraps around


def test_image_size_batch_sampler():
    s = ImageSizeBatchSampler(range(10), batch_size=4, drop_last=False,
                              min_size=32, max_size=64, size_int=8, seed=0)
    batches = list(s)
    assert len(batches) == 3
    for b in batches:
        hs = {h for _, h, _ in b}
        ws = {w for _, _, w in b}
        assert len(hs) == 1 and len(ws) == 1  # one static shape per batch
        (h,), (w,) = hs, ws
        assert 32 <= h <= 64 and h % 8 == 0 and 32 <= w <= 64 and w % 8 == 0


def test_ordered_shard_sampler_covers_all():
    n, world = 10, 4
    all_idx = []
    for r in range(world):
        s = OrderedShardSampler(n, r, world)
        assert len(s) == 3
        all_idx.extend(list(s))
    assert sorted(set(all_idx)) == list(range(n))  # full coverage with padding
