"""Prompt-based annotation tests (PromptDrawer/PointDrawer capability)."""
import numpy as np

from easyhec_tpu.io.annotate import PromptMasker, Prompts


def _scene():
    """Synthetic scene: bright square object on dark background."""
    rng = np.random.default_rng(0)
    rgb = (rng.normal(30, 5, (64, 64, 3))).clip(0, 255).astype(np.uint8)
    rgb[20:44, 24:48] = rng.normal(200, 10, (24, 24, 3)).clip(0, 255)
    gt = np.zeros((64, 64), np.float32)
    gt[20:44, 24:48] = 1
    return rgb, gt


def test_grabcut_box_prompt():
    rgb, gt = _scene()
    prompts = Prompts()
    prompts.add_box(18, 16, 52, 48)
    mask = PromptMasker().predict(rgb, prompts)
    inter = ((mask > 0.5) & (gt > 0.5)).sum()
    union = ((mask > 0.5) | (gt > 0.5)).sum()
    assert inter / union > 0.7


def test_negative_point_removes_component():
    rgb, gt = _scene()
    # second bright blob that a neg point should remove
    rgb[4:10, 4:10] = 210
    prompts = Prompts()
    prompts.add_box(0, 0, 63, 63)
    prompts.add_point(6, 6, label=0)
    mask = PromptMasker().predict(rgb, prompts)
    assert mask[6, 6] < 0.5
    assert mask[30, 36] > 0.5  # main object survives


def test_model_backend_with_box_gate():
    rgb, gt = _scene()

    class FakeModel:
        def predict(self, rgb):
            return gt.copy()

    prompts = Prompts()
    prompts.add_box(0, 0, 35, 63)  # keep only left part
    mask = PromptMasker(backend=FakeModel()).predict(rgb, prompts)
    assert mask[:, :36].sum() > 0
    assert mask[:, 36:].sum() == 0


def test_prompts_undo_reset():
    p = Prompts()
    p.add_box(0, 0, 5, 5)
    p.add_point(1, 1, 1)
    p.undo()
    assert not p.points and len(p.boxes) == 1
    p.undo()
    assert not p.boxes
    p.add_point(2, 2, 0)
    p.reset()
    assert not p.points and not p.labels
