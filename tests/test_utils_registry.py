"""Registry / evaluators / visualizers / imaging / run-dir utils tests."""
import numpy as np
import pytest

from easyhec_tpu.evaluators import build_evaluators
from easyhec_tpu.registry import EVALUATORS, VISUALIZERS, Registry
from easyhec_tpu.utils import (
    archive_runs,
    image_grid,
    padded_stack,
    random_choice,
    to_array,
    vis_mask,
)
from easyhec_tpu.visualizers import build_visualizer


def test_registry_register_and_duplicate():
    r = Registry()

    @r.register("a")
    def f():
        return 1

    assert r.build("a") == 1  # build() invokes the registered callable
    with pytest.raises(KeyError):
        r.register("a")(lambda: 2)
    with pytest.raises(KeyError):
        r.build("missing")


def test_global_registries_populated():
    assert "mask_iou" in EVALUATORS and "pose_error" in EVALUATORS
    assert "hover_mask" in VISUALIZERS and "error_mask" in VISUALIZERS


def test_mask_iou_evaluator():
    ref = np.zeros((2, 8, 8))
    ref[:, 2:6, 2:6] = 1
    out = build_evaluators(["mask_iou"])[0](
        {"rendered_masks": ref.copy(), "ref_masks": ref}
    )
    assert out["mask_iou"] == pytest.approx(1.0)
    half = ref.copy()
    half[:, :, :4] = 0
    out2 = build_evaluators(["mask_iou"])[0](
        {"rendered_masks": half, "ref_masks": ref}
    )
    assert 0 < out2["mask_iou"] < 1
    assert out2["mask_precision"] == pytest.approx(1.0)


def test_visualizer_writes_panels(tmp_path):
    rgbs = np.random.default_rng(0).integers(0, 255, (3, 16, 16, 3), dtype=np.uint8)
    masks = np.zeros((3, 16, 16))
    masks[:, 4:10, 4:10] = 1
    panel = build_visualizer("hover_mask", tmp_path)(rgbs, masks)
    assert panel.exists()
    assert len(list(tmp_path.glob("overlay_0*.png"))) == 3
    p2 = build_visualizer("error_mask", tmp_path)(
        {"rendered_masks": masks, "ref_masks": masks}
    )
    assert p2.exists()


def test_image_grid_and_vis_mask():
    imgs = [np.full((4, 6), 0.5) for _ in range(5)]
    grid = image_grid(imgs, cols=3, pad=1)
    assert grid.dtype == np.uint8 and grid.shape[-1] == 3
    assert grid.shape == (2 * 4 + 3 * 1, 3 * 6 + 4 * 1, 3)
    img = np.zeros((8, 8, 3), np.uint8)
    mask = np.zeros((8, 8))
    mask[2:6, 2:6] = 1
    ov = vis_mask(img, mask, color=(0, 255, 0), alpha=0.5)
    assert ov[4, 4, 1] > 0 and ov[0, 0, 1] == 0
    assert tuple(ov[2, 2]) == (0, 255, 0)  # contour solid


def test_array_utils():
    a = to_array([1.0, 2.0])
    assert a.dtype == np.float64 and a.shape == (2,)
    batch, valid = padded_stack([np.ones((2, 3)), np.ones((3, 2))])
    assert batch.shape == (2, 3, 3) and valid.sum() == 12
    rows, idx = random_choice(np.arange(10), 4, rng=np.random.default_rng(0))
    assert rows.shape == (4,) and len(set(idx.tolist())) == 4


def test_archive_runs(tmp_path):
    run = tmp_path / "run"
    run.mkdir()
    (run / "old.txt").write_text("x")
    dst = archive_runs(run)
    assert dst is not None
    assert not (run / "old.txt").exists()
    assert (dst / "old.txt").read_text() == "x"
    assert archive_runs(run) is None  # only archive/ left -> nothing to move
