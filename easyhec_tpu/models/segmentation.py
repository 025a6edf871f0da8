"""Robot mask segmentation: compact U-Net in flax, trained on synthetic data.

Capability replacement for the reference's perception services (SURVEY.md
§2.3): PointRend/detectron2 inference (easyhec/utils/pointrend_api.py) and
its synthetic-data training pipeline (tools/simulate/
gen_data_for_mask_training.py + a detectron2 fine-tune). Here the entire
loop is first-party and TPU-native: synthetic shaded renders + GT masks from
our own rasterizer (easyhec_tpu.data.synthetic) train a small U-Net whose
inference plugs in as a MaskSource for the online calibration loop.

Not a port of PointRend: robot-arm mask prediction is a single-class
problem on a controlled scene — a compact U-Net is the right-sized,
MXU-friendly architecture (convs = matmuls, static shapes, bf16-ready).
"""
from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

try:
    from flax import linen as nn
except Exception:  # pragma: no cover
    nn = None

__all__ = ["UNet", "train_segmenter", "SegmenterMaskSource", "save_params", "load_params"]


if nn is not None:

    class _ConvBlock(nn.Module):
        features: int

        @nn.compact
        def __call__(self, x):
            x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
            x = nn.GroupNorm(num_groups=min(8, self.features))(x)
            x = nn.relu(x)
            x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
            x = nn.GroupNorm(num_groups=min(8, self.features))(x)
            return nn.relu(x)

    class UNet(nn.Module):
        """3-level U-Net, ~0.5M params at base=16. Input [B,H,W,3] float in
        [0,1]; output logits [B,H,W]."""

        base: int = 16

        @nn.compact
        def __call__(self, x):
            c1 = _ConvBlock(self.base)(x)
            d1 = nn.max_pool(c1, (2, 2), strides=(2, 2))
            c2 = _ConvBlock(self.base * 2)(d1)
            d2 = nn.max_pool(c2, (2, 2), strides=(2, 2))
            c3 = _ConvBlock(self.base * 4)(d2)
            u2 = jax.image.resize(c3, d1.shape[:1] + c2.shape[1:3] + c3.shape[-1:], "nearest")
            m2 = _ConvBlock(self.base * 2)(jnp.concatenate([u2, c2], axis=-1))
            u1 = jax.image.resize(m2, x.shape[:1] + c1.shape[1:3] + m2.shape[-1:], "nearest")
            m1 = _ConvBlock(self.base)(jnp.concatenate([u1, c1], axis=-1))
            return nn.Conv(1, (1, 1))(m1)[..., 0]

else:  # pragma: no cover

    class UNet:  # type: ignore
        def __init__(self, *a, **k):
            raise RuntimeError("flax unavailable")


def _bce_loss(logits, targets):
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def train_segmenter(
    rgb: np.ndarray,
    masks: np.ndarray,
    steps: int = 500,
    batch_size: int = 4,
    lr: float = 1e-3,
    base: int = 16,
    seed: int = 0,
    augment: bool = True,
    init_params=None,
):
    """Train the U-Net on [N,H,W,3] uint8 images + [N,H,W] masks.
    Returns (params, final_loss). Small data is fine — synthetic scenes are
    controlled and the task is near-template matching.

    init_params: warm-start for fine-tuning (the reference fine-tunes its
    pretrained PointRend on synthetic data the same way — pass a lower lr
    and fewer steps; e.g. real-photo pseudo-label self-training)."""
    import optax

    model = UNet(base=base)
    key = jax.random.PRNGKey(seed)
    if init_params is not None:
        params = jax.tree.map(jnp.asarray, init_params)
    else:
        x0 = jnp.zeros((1,) + rgb.shape[1:3] + (3,), jnp.float32)
        params = model.init(key, x0)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    imgs = jnp.asarray(rgb, jnp.float32) / 255.0
    tgts = jnp.asarray(masks, jnp.float32)
    n = imgs.shape[0]

    # imgs/tgts enter as jit ARGUMENTS, not closure captures: a closed-over
    # array is baked into the program as a constant, and a 100s-of-MB
    # training set blows the remote-compile payload limit on tunneled TPU
    # runtimes (HTTP 413) — as an argument it transfers once and stays
    # device-resident.
    @jax.jit
    def step(params, opt_state, key, imgs, tgts):
        k1, k2, k3 = jax.random.split(key, 3)
        idx = jax.random.randint(k1, (batch_size,), 0, n)
        xb, yb = imgs[idx], tgts[idx]
        if augment:
            # brightness/contrast jitter — the sim-to-real gap reducer
            scale = 1.0 + 0.3 * jax.random.normal(k2, (batch_size, 1, 1, 1))
            shift = 0.1 * jax.random.normal(k3, (batch_size, 1, 1, 1))
            xb = jnp.clip(xb * scale + shift, 0.0, 1.0)

        def loss_fn(p):
            return _bce_loss(model.apply(p, xb), yb)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = jnp.inf
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub, imgs, tgts)
    return params, float(loss)


class SegmenterMaskSource:
    """MaskSource backed by a trained U-Net (drop-in for the reference's
    pointrend_api mask prediction in the online loop)."""

    def __init__(self, params, base: int = 16, threshold: float = 0.5):
        self._model = UNet(base=base)
        self._params = params
        self._threshold = threshold

        @jax.jit
        def infer(x):
            return jax.nn.sigmoid(self._model.apply(self._params, x))

        self._infer = infer

    def predict(self, rgb: np.ndarray) -> np.ndarray:
        return (self.predict_prob(rgb) > self._threshold).astype(np.float32)

    def predict_prob(self, rgb: np.ndarray) -> np.ndarray:
        """Raw foreground probability [H, W] in [0, 1]. PromptMasker uses
        this for probability-hysteresis positive points: a click in a
        region the thresholded mask missed admits the connected component
        above a LOWER threshold around the click (SAM-like click
        semantics for near-miss regions, e.g. dark parts)."""
        x = jnp.asarray(rgb, jnp.float32)[None] / 255.0
        return np.asarray(self._infer(x))[0]


def save_params(path: str | Path, params) -> None:
    import pickle

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = jax.tree.map(np.asarray, params)
    with open(path, "wb") as f:
        pickle.dump(flat, f)


def load_params(path: str | Path):
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)
