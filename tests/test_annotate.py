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


def test_model_backend_hysteresis_click_recovers_missed_region():
    """A positive click in a region the THRESHOLDED model mask missed (but
    where the model assigns probability above the hysteresis) admits that
    low-confidence connected component — the dark-gripper recovery path
    (reference analog: SAM point prompts, utils/prompt_drawer.py)."""
    rgb, gt = _scene()

    class ProbModel:
        def predict(self, rgb):
            return (self.predict_prob(rgb) > 0.5).astype("float32")

        def predict_prob(self, rgb):
            import numpy as np

            prob = np.zeros(rgb.shape[:2], np.float32)
            prob[10:30, 5:25] = 0.9   # confidently predicted part
            prob[35:50, 5:25] = 0.35  # near-miss region (e.g. dark part)
            return prob

    masker = PromptMasker(backend=ProbModel(), hysteresis=0.2)
    base = masker.predict(rgb, Prompts())
    assert base[40, 10] == 0  # missed without the click

    prompts = Prompts()
    prompts.add_point(10, 40, 1)  # click inside the near-miss region
    mask = masker.predict(rgb, prompts)
    assert mask[40, 10] == 1 and mask[45, 20] == 1  # component admitted
    assert mask[10 - 5, 40] == 0  # background untouched
    # probability below hysteresis is never admitted
    masker_hi = PromptMasker(backend=ProbModel(), hysteresis=0.4)
    assert masker_hi.predict(rgb, prompts)[40, 10] == 0


def test_model_backend_negative_click_bounded_by_confidence():
    """A negative click on a low-confidence false-positive region that is
    ATTACHED to the true mask removes only that weak sub-region — not the
    whole connected blob (which would nuke the annotation); a click on a
    confident pixel still removes the full component."""
    import numpy as np

    rgb, _ = _scene()

    class ProbModel:
        def predict(self, rgb):
            return (self.predict_prob(rgb) > 0.5).astype("float32")

        def predict_prob(self, rgb):
            prob = np.zeros(rgb.shape[:2], np.float32)
            prob[10:30, 5:25] = 0.95   # true region (confident)
            prob[10:30, 25:40] = 0.6   # attached weak FP strip
            return prob

    masker = PromptMasker(backend=ProbModel())
    p = Prompts()
    p.add_point(30, 20, 0)  # negative click inside the weak strip
    mask = masker.predict(rgb, p)
    assert mask[20, 10] == 1   # confident region survives
    assert mask[20, 30] == 0   # weak attached strip removed
    # a negative click on the CONFIDENT region removes its whole component
    p2 = Prompts()
    p2.add_point(10, 20, 0)
    mask2 = masker.predict(rgb, p2)
    assert mask2[20, 10] == 0


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


def test_annotation_session_incremental():
    from easyhec_tpu.io.annotate import AnnotationSession

    rgb, gt = _scene()
    s = AnnotationSession(rgb)
    assert s.stats()["area_px"] == 0
    m1 = s.add_box(10, 10, 60, 50)
    a1 = (m1 > 0.5).sum()
    assert a1 > 0
    # negative point punches the component, undo restores it
    yx = np.argwhere(m1 > 0.5)[0]
    m2 = s.add_point(int(yx[1]), int(yx[0]), 0)
    assert (m2 > 0.5).sum() < a1
    m3 = s.undo()
    assert (m3 > 0.5).sum() == a1
    s.reset()
    assert s.stats()["area_px"] == 0 and s.stats()["n_prompts"] == 0
    # preview renders without error and marks mask cells
    s.add_box(10, 10, 60, 50)
    prev = s.ascii_preview(width=32)
    assert "#" in prev or "+" in prev


def test_annotate_repl_scripted(tmp_path):
    from easyhec_tpu.io.annotate import annotate_repl

    rgb, gt = _scene()
    cmds = iter([
        "help", "box 10 10 60 50", "show", "bogus", "undo",
        "box 10 10 60 50", "accept",
    ])
    log = []
    mask = annotate_repl(
        rgb, input_fn=lambda *_: next(cmds), echo=log.append,
        overlay_path=str(tmp_path / "ov.png"),
    )
    assert mask is not None and (mask > 0.5).sum() > 0
    assert (tmp_path / "ov.png").exists()
    assert any("unknown command" in str(x) for x in log)

    mask2 = annotate_repl(rgb, input_fn=lambda *_: next(iter(["skip"])),
                          echo=lambda *_: None)
    assert mask2 is None
