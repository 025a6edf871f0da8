"""Optimizer + LR schedule factories (optax).

Replaces the reference's torch solver stack (easyhec/solver/build.py:13-96,
easyhec/solver/lr_scheduler.py — WarmupMultiStepLR / OneCycle / cosine /
exponential classes) with optax equivalents. The shipped configs only ever
use Adam + constant LR (reference easyhec/config/defaults.py:150-151), which
stays the default here.
"""
from __future__ import annotations

import optax

__all__ = ["make_optimizer", "make_schedule"]


def make_schedule(
    name: str,
    max_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    gamma: float = 0.99,
):
    name = name.lower()
    if name == "constant":
        sched = optax.constant_schedule(max_lr)
    elif name == "cosine":
        sched = optax.cosine_decay_schedule(max_lr, max(total_steps - warmup_steps, 1))
    elif name == "exponential":
        sched = optax.exponential_decay(
            max_lr, transition_steps=max(total_steps // 100, 1), decay_rate=gamma
        )
    elif name == "onecycle":
        return optax.cosine_onecycle_schedule(total_steps, peak_value=max_lr)
    else:
        raise ValueError(f"unknown scheduler {name!r}")
    if warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, max_lr, warmup_steps)
        return optax.join_schedules([warmup, sched], [warmup_steps])
    return sched


def make_optimizer(
    name: str = "adam",
    max_lr: float = 3e-3,
    total_steps: int = 1000,
    scheduler: str = "constant",
    grad_clip: float = 0.0,
    weight_decay: float = 0.0,
    warmup_steps: int = 0,
) -> optax.GradientTransformation:
    sched = make_schedule(scheduler, max_lr, total_steps, warmup_steps)
    name = name.lower()
    if name == "adam":
        core = optax.adam(sched) if weight_decay == 0 else optax.adamw(sched, weight_decay=weight_decay)
    elif name == "sgd":
        core = optax.sgd(sched, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    parts = []
    if grad_clip > 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(core)
    return optax.chain(*parts) if len(parts) > 1 else core
