"""Optimizer + LR schedule factories (optax).

Replaces the reference's torch solver stack (easyhec/solver/build.py:13-96,
easyhec/solver/lr_scheduler.py:7-132) with optax equivalents, covering every
scheduler the reference registers:

  reference name          -> here
  ConstantScheduler       -> "constant"
  WarmupMultiStepLR       -> "warmup_multistep"   (milestones, gamma, warmup)
  OneCycleScheduler       -> "onecycle"
  WarmupCosineLR          -> "warmup_cosine"
  ExponentialScheduler    -> "exponential"        (gamma ** (step / decay_steps))
  WarmupExponentialScheduler -> "warmup_exponential"
  ExponentialStep         -> "exponential_step"   (exp(t * log(min_factor)))
  CosineAnnealingLR       -> "cosine"             (anneal to ~0 over total steps)

plus the per-parameter-group behavior of the reference's make_optimizer
(bias params get lr * bias_lr_factor and their own weight decay,
easyhec/solver/build.py:15-24) via `bias_lr_factor` — relevant for training
the segmentation net; the 6-DoF pose model has a single parameter vector.

The shipped calibration configs only ever use Adam + constant LR
(reference easyhec/config/defaults.py:150-151), which stays the default.
Schedules are pure step->lr functions, usable inside jitted lax.scan loops.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax

__all__ = ["make_optimizer", "make_schedule"]


def _with_warmup(sched, max_lr, warmup_steps, warmup_factor, warmup_method):
    """Reference warmup semantics (easyhec/solver/lr_scheduler.py:36-50):
    'linear' ramps the multiplier warmup_factor -> 1 over warmup_iters;
    'constant' holds lr * warmup_factor until warmup_iters."""
    if warmup_steps <= 0:
        return sched
    if warmup_method == "linear":
        warm = optax.linear_schedule(max_lr * warmup_factor, max_lr, warmup_steps)
    elif warmup_method == "constant":
        warm = optax.constant_schedule(max_lr * warmup_factor)
    else:
        raise ValueError(f"unknown warmup_method {warmup_method!r}")
    return optax.join_schedules([warm, sched], [warmup_steps])


def make_schedule(
    name: str,
    max_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    gamma: float = 0.1,
    milestones: tuple[int, ...] = (),
    decay_steps: int = 250_000,
    min_factor: float = 0.1,
    warmup_factor: float = 1.0 / 3,
    warmup_method: str = "linear",
):
    name = name.lower()
    if name == "constant":
        return optax.constant_schedule(max_lr)
    if name in ("cosine", "cosine_annealing"):
        sched = optax.cosine_decay_schedule(max_lr, max(total_steps - warmup_steps, 1))
        return _with_warmup(sched, max_lr, warmup_steps, warmup_factor, warmup_method)
    if name == "warmup_cosine":
        sched = optax.cosine_decay_schedule(max_lr, max(total_steps - warmup_steps, 1))
        return _with_warmup(
            sched, max_lr, max(warmup_steps, 1), warmup_factor, warmup_method
        )
    if name in ("multistep", "warmup_multistep"):
        # Milestones are ABSOLUTE steps (reference lr_scheduler.py:36-50:
        # lr = base * warmup_mult(step) * gamma ** bisect(milestones, step)),
        # so implement directly rather than via join_schedules (which would
        # shift the inner schedule's step by the warmup length).
        ms = jnp.asarray(sorted(int(m) for m in milestones), jnp.float32)

        def sched(step):
            step = jnp.asarray(step, jnp.float32)
            mult = gamma ** jnp.sum(step >= ms) if ms.size else 1.0
            if warmup_steps > 0:
                if warmup_method == "linear":
                    a = jnp.clip(step / warmup_steps, 0.0, 1.0)
                    wmult = warmup_factor * (1 - a) + a
                elif warmup_method == "constant":
                    wmult = jnp.where(step < warmup_steps, warmup_factor, 1.0)
                else:
                    raise ValueError(f"unknown warmup_method {warmup_method!r}")
            else:
                wmult = 1.0
            return max_lr * mult * wmult

        return sched
    if name == "exponential":
        # NeRF-style continuous decay: lr * gamma ** (step / decay_steps)
        # (reference easyhec/solver/lr_scheduler.py:98-111).
        def sched(step):
            return max_lr * gamma ** (jnp.asarray(step, jnp.float32) / decay_steps)

        return sched
    if name == "warmup_exponential":
        def body(step):
            return max_lr * gamma ** (jnp.asarray(step, jnp.float32) / decay_steps)

        return _with_warmup(body, max_lr, max(warmup_steps, 1), 0.0, "linear")
    if name == "exponential_step":
        # lr * exp(t * log(min_factor)), t = clip(step/total, 0, 1)
        # (reference easyhec/solver/build.py:83-91).
        def sched(step):
            t = jnp.clip(jnp.asarray(step, jnp.float32) / total_steps, 0.0, 1.0)
            return max_lr * jnp.exp(t * jnp.log(min_factor))

        return sched
    if name == "onecycle":
        return optax.cosine_onecycle_schedule(total_steps, peak_value=max_lr)
    raise ValueError(f"unknown scheduler {name!r}")


def _is_bias(path) -> bool:
    return any("bias" in str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def make_optimizer(
    name: str = "adam",
    max_lr: float = 3e-3,
    total_steps: int = 1000,
    scheduler: str = "constant",
    grad_clip: float = 0.0,
    grad_clip_value: float = 0.0,
    weight_decay: float = 0.0,
    warmup_steps: int = 0,
    momentum: float = 0.9,
    bias_lr_factor: float = 1.0,
    weight_decay_bias: float = 0.0,
    **sched_kwargs,
) -> optax.GradientTransformation:
    """Build the full gradient transformation.

    Mirrors the reference's make_optimizer/make_lr_scheduler pair
    (easyhec/solver/build.py:13-29,32-81) plus its trainer-side grad clipping
    (easyhec/trainer/base.py grad_clip by norm or value).
    """
    sched = make_schedule(
        scheduler, max_lr, total_steps, warmup_steps=warmup_steps, **sched_kwargs
    )

    def core_for(lr_scale: float, wd: float) -> optax.GradientTransformation:
        def scaled(step):
            return sched(step) * lr_scale

        lname = name.lower()
        if lname == "adam":
            return optax.adam(scaled) if wd == 0 else optax.adamw(scaled, weight_decay=wd)
        if lname == "sgd":
            return optax.sgd(scaled, momentum=momentum)
        raise ValueError(f"unknown optimizer {name!r}")

    if bias_lr_factor != 1.0 or weight_decay_bias != weight_decay:
        # Per-param groups: bias leaves get lr * bias_lr_factor and their own
        # weight decay (reference easyhec/solver/build.py:15-24).
        import jax

        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "bias" if _is_bias(path) else "weight", params
            )

        core = optax.multi_transform(
            {
                "weight": core_for(1.0, weight_decay),
                "bias": core_for(bias_lr_factor, weight_decay_bias),
            },
            label_fn,
        )
    else:
        core = core_for(1.0, weight_decay)

    parts: list[optax.GradientTransformation] = []
    if grad_clip > 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if grad_clip_value > 0:
        parts.append(optax.clip(grad_clip_value))
    parts.append(core)
    return optax.chain(*parts) if len(parts) > 1 else core
