"""Learning-rate range test ("LR finder").

Parity with the reference trainer's find_lr (easyhec/trainer/base.py:280-340:
exponential LR sweep from start to end over the training batches, EMA-smooth
the loss, stop on divergence, suggest the steepest-descent LR). Here the
whole sweep is ONE jitted lax.scan over a generic loss function, so it also
works for the 6-DoF calibration loss with the fused renderer.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["LRFindResult", "find_lr"]


@dataclass
class LRFindResult:
    lrs: np.ndarray  # [N] swept learning rates
    losses: np.ndarray  # [N] raw losses
    smoothed: np.ndarray  # [N] EMA-smoothed losses
    suggestion: float  # LR at the steepest smoothed descent
    diverged_at: int  # first index where loss > divergence_th * best (or N)


def find_lr(
    loss_fn,
    params,
    start_lr: float = 1e-6,
    end_lr: float = 1.0,
    num_steps: int = 100,
    beta: float = 0.9,
    divergence_th: float = 4.0,
    optimizer: str = "adam",
) -> LRFindResult:
    """Exponential LR range test on `loss_fn(params) -> scalar`.

    Runs SGD/Adam steps with lr growing geometrically from start_lr to
    end_lr, recording the loss BEFORE each step (reference base.py:301-331).
    The suggestion is the lr at the minimum d(smoothed loss)/d(log lr),
    restricted to the pre-divergence prefix.
    """
    gamma = (end_lr / start_lr) ** (1.0 / max(num_steps - 1, 1))
    lrs = start_lr * gamma ** jnp.arange(num_steps)

    if optimizer == "adam":
        opt = optax.scale_by_adam()
    elif optimizer == "sgd":
        opt = optax.identity()
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")

    vg = jax.value_and_grad(loss_fn)

    @jax.jit
    def sweep(p0):
        def step(carry, lr):
            p, s = carry
            loss, g = vg(p)
            u, s = opt.update(g, s, p)
            p = jax.tree.map(lambda a, b: a - lr * b, p, u)
            return (p, s), loss

        (_, _), losses = jax.lax.scan(step, (p0, opt.init(p0)), lrs)
        return losses

    losses = np.asarray(sweep(params))
    lrs_np = np.asarray(lrs)

    # EMA smoothing with bias correction (reference base.py:311-315)
    sm = np.empty_like(losses)
    avg = 0.0
    for i, x in enumerate(losses):
        avg = beta * avg + (1 - beta) * float(x)
        sm[i] = avg / (1 - beta ** (i + 1))

    best = np.minimum.accumulate(sm)
    div = np.nonzero((sm > divergence_th * best) | ~np.isfinite(sm))[0]
    end = int(div[0]) if len(div) else num_steps

    if end > 2:
        d = np.gradient(sm[:end], np.log(lrs_np[:end]))
        suggestion = float(lrs_np[:end][int(np.argmin(d))])
    else:
        suggestion = float(start_lr)
    return LRFindResult(
        lrs=lrs_np, losses=losses, smoothed=sm,
        suggestion=suggestion, diverged_at=end,
    )
