"""SE(3) exponential / logarithm maps and rigid-transform helpers.

Convention (deliberately different from the reference, which inherited
pytorch3d's row-vector/transposed matrices — see SURVEY.md appendix;
reference: easyhec/utils/pytorch3d_se3.py:130 returns Tᵀ and every call
site re-permutes): here everything is plain column-vector homogeneous 4×4,

    T = [[R, t], [0, 1]],   y = T @ [x; 1]

and the twist vector is `xi = [v(3), w(3)]` with

    T = exp([[hat(w), v], [0, 0]])  =>  R = exp(w),  t = V(w) @ v .

So `xi[:3]` is the *log-map translation* (V⁻¹ t), matching the reference's
dof ordering (translation first, rotation second) used for its err_x/y/z
metrics (reference: easyhec/modeling/models/rb_solve/rb_solver.py:82-91).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import so3


def _V_coeffs(theta2: jax.Array):
    """Coefficients for V = I + B·W + C·W², V⁻¹ = I - W/2 + D·W².

    B = (1-cosθ)/θ², C = (θ-sinθ)/θ³, D = (1 - A/(2B))/θ² with A=sinθ/θ.

    The Taylor branch covers θ < 0.2, NOT just θ→0: the closed forms
    cancel catastrophically in float32 well before underflow — at θ=1e-3,
    1−cosθ ≈ 5e-7 carries only ~1 significant f32 digit, and D amplifies
    that noise by 1/θ² (measured: 0.03 absolute error in log-translation
    at θ=1e-3 under the old θ<1e-4 switch; caught by the executable
    reference-parity test, tests/test_reference_parity.py). Three series
    terms keep truncation below f32 eps up to θ=0.2, where the closed
    forms are conditioned again.
    """
    small = theta2 < 0.04  # θ < 0.2
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    t2 = theta2
    A = jnp.where(
        small, 1.0 - t2 / 6.0 + t2 * t2 / 120.0, sin_t / theta
    )
    B = jnp.where(
        small, 0.5 - t2 / 24.0 + t2 * t2 / 720.0,
        (1.0 - cos_t) / theta2_safe,
    )
    C = jnp.where(
        small, 1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0,
        (theta - sin_t) / (theta2_safe * theta),
    )
    D = jnp.where(
        small, 1.0 / 12.0 + t2 / 720.0 + t2 * t2 / 30240.0,
        (1.0 - 0.5 * A / B) / theta2_safe,
    )
    return A, B, C, D


def exp(xi: jax.Array) -> jax.Array:
    """SE(3) exponential: twist [..., 6] (v, w) -> [..., 4, 4] transform.

    All small-matrix products are written as cross/outer products so they stay
    on the VPU in exact float32 (a 3×3 `@` would hit the MXU with bf16
    rounding on TPU — see so3._hat_sq).
    """
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, C, _ = _V_coeffs(theta2)
    W = so3.hat(w)
    W2 = so3._hat_sq(w, theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + A[..., None, None] * W + B[..., None, None] * W2
    # t = V v with V = I + B·W + C·W²:  t = v + B (w×v) + C (w(w·v) − θ² v)
    wxv = jnp.cross(w, v)
    wdotv = jnp.sum(w * v, axis=-1, keepdims=True)
    t = v + B[..., None] * wxv + C[..., None] * (w * wdotv - theta2[..., None] * v)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def log(T: jax.Array) -> jax.Array:
    """SE(3) logarithm: [..., 4, 4] -> twist [..., 6] (v, w)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3.log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    _, _, _, D = _V_coeffs(theta2)
    # v = V⁻¹ t with V⁻¹ = I − W/2 + D·W²:  v = t − (w×t)/2 + D (w(w·t) − θ² t)
    wxt = jnp.cross(w, t)
    wdott = jnp.sum(w * t, axis=-1, keepdims=True)
    v = t - 0.5 * wxt + D[..., None] * (w * wdott - theta2[..., None] * t)
    return jnp.concatenate([v, w], axis=-1)


def from_rt(R: jax.Array, t: jax.Array) -> jax.Array:
    """[..., 3, 3], [..., 3] -> [..., 4, 4]."""
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def inverse(T: jax.Array) -> jax.Array:
    """Rigid-transform inverse (uses Rᵀ, cheaper + stabler than matrix inverse)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum(
        "...ij,...j->...i", Rt, t, precision=jax.lax.Precision.HIGHEST
    )
    return from_rt(Rt, t_inv)


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply [..., 4, 4] to points [..., N, 3] -> [..., N, 3].

    HIGHEST precision: keeps f32 accuracy on TPU (default matmul precision
    would round inputs to bf16 on the MXU).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    out = jnp.einsum(
        "...ij,...nj->...ni", R, pts, precision=jax.lax.Precision.HIGHEST
    )
    return out + t[..., None, :]


def matrix_3x4_to_4x4(M: jax.Array) -> jax.Array:
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=M.dtype), M.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([M, bottom], axis=-2)
