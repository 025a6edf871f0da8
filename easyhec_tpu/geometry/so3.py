"""SO(3) maps: hat/vee, exponential and logarithm, rotation utilities.

Pure JAX, jit/vmap/grad-safe everywhere (no data-dependent branching; all
special cases handled with `jnp.where` on Taylor-safe expressions).

Capability parity with the reference's vendored pytorch3d SO(3)/SE(3) maps
(reference: easyhec/utils/pytorch3d_se3.py:12-258 and the OpenCV-Rodrigues
hybrid in easyhec/utils/utils_3d.py:303-335), redesigned as closed-form
branch-free functions so they trace once under jit and vectorize with vmap.

Convention: column vectors, `R @ x`; angle-axis vector `w` with θ = |w|.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix such that hat(w) @ x = w × x."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of hat: [..., 3, 3] skew matrix -> [..., 3] vector."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta2: jax.Array):
    """Return A = sin(θ)/θ and B = (1-cos(θ))/θ² with Taylor fallbacks near 0.

    theta2 is θ² (avoids a sqrt-of-zero NaN in gradients at the identity).
    """
    # Guard the sqrt so its gradient is finite at θ=0; the Taylor branch is
    # selected there so the guarded value never leaks into the result.
    # θ < 0.2 switch (not θ→0 only): (1−cosθ)/θ² cancels badly in f32 for
    # small-but-finite θ — see se3._V_coeffs for the measured failure.
    small = theta2 < 0.04
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    A = jnp.where(
        small, 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0,
        jnp.sin(theta) / theta,
    )
    B = jnp.where(
        small, 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0,
        (1.0 - jnp.cos(theta)) / theta2_safe,
    )
    return A, B


def _hat_sq(w: jax.Array, theta2: jax.Array) -> jax.Array:
    """hat(w)² = w wᵀ − θ² I, as an outer product.

    Deliberately NOT `W @ W`: on TPU a 3×3 matmul lands on the MXU with bf16
    input rounding (~1e-3 error); the outer-product form stays on the VPU in
    exact float32.
    """
    outer = w[..., :, None] * w[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), outer.shape)
    return outer - theta2[..., None, None] * eye


def exp(w: jax.Array) -> jax.Array:
    """SO(3) exponential map (Rodrigues): [..., 3] -> [..., 3, 3]."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B = _sinc_coeffs(theta2)
    W = hat(w)
    W2 = _hat_sq(w, theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def log(R: jax.Array) -> jax.Array:
    """SO(3) logarithm: [..., 3, 3] -> [..., 3] angle-axis (principal, |w| ≤ π).

    Branch-free (jnp.where-selected) with two well-conditioned regimes:
    - θ ≤ π/2: w = θ/(2 sinθ) · vee(R − Rᵀ), Taylor near 0 (sinθ ≥ √2/2 here).
    - θ > π/2: axis from the symmetric part, aᵢ² = (Rᵢᵢ − cosθ)/(1 − cosθ)
      (1 − cosθ ≥ 1 here), signs from off-diagonal products and the skew part.
      This stays accurate through θ = π where the skew formula blows up.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    skew = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sinθ · axis

    # --- regime 1: θ ≤ π/2 ---
    small = theta < 1e-4
    use_sym = theta > (jnp.pi / 2)
    sin_theta = jnp.sin(theta)
    sin_safe = jnp.where(small | use_sym, 1.0, sin_theta)
    # θ/(2 sinθ) with Taylor 1/2 + θ²/12 near 0
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * sin_safe))
    w_skew = scale[..., None] * skew

    # --- regime 2: θ > π/2 — axis² from diagonal of symmetric part ---
    one_minus_cos = jnp.where(use_sym, 1.0 - cos_theta, 1.0)  # ≥ 1 where used
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_abs = jnp.sqrt(
        jnp.clip((diag - cos_theta[..., None]) / one_minus_cos[..., None], 0.0, None)
    )
    # Off-diagonal symmetric entries: (Rᵢⱼ+Rⱼᵢ)/2 = (1−cosθ) aᵢaⱼ → carry sign of aᵢaⱼ.
    m01 = R[..., 0, 1] + R[..., 1, 0]
    m02 = R[..., 0, 2] + R[..., 2, 0]
    m12 = R[..., 1, 2] + R[..., 2, 1]
    # Choose dominant component k = argmax aᵢ², take a_k > 0, sign others
    # relative to it via sign(aᵢ a_k). Branch-free via one-hot selects.
    prod = jnp.stack(  # prod[..., k, i] ∝ sign(a_i a_k), diag entries positive
        [
            jnp.stack([jnp.ones_like(m01), m01, m02], axis=-1),
            jnp.stack([m01, jnp.ones_like(m01), m12], axis=-1),
            jnp.stack([m02, m12, jnp.ones_like(m01)], axis=-1),
        ],
        axis=-2,
    )
    k = jnp.argmax(axis_abs, axis=-1)
    onehot = jax.nn.one_hot(k, 3, dtype=R.dtype)
    rel = jnp.einsum("...k,...ki->...i", onehot, prod)
    signs = jnp.where(rel < 0, -1.0, 1.0)
    axis_sym = axis_abs * signs
    # Overall sign from the skew part (sinθ > 0 for θ < π); at exactly π the
    # skew part vanishes and either sign is a valid principal log.
    align = jnp.sum(axis_sym * skew, axis=-1, keepdims=True)
    axis_sym = jnp.where(align < 0, -axis_sym, axis_sym)
    # θ from arccos(trace) loses ~√eps accuracy at θ→π; |skew| = 2 sinθ gives a
    # well-conditioned θ = π − arcsin(sinθ) in this regime (θ > π/2).
    sin_from_skew = jnp.clip(
        0.5 * jnp.sqrt(jnp.sum(skew * skew, axis=-1)), 0.0, 1.0
    )
    theta_sym = jnp.pi - jnp.arcsin(sin_from_skew)
    w_sym = theta_sym[..., None] * axis_sym

    return jnp.where(use_sym[..., None], w_sym, w_skew)


def geodesic_distance(R1: jax.Array, R2: jax.Array) -> jax.Array:
    """Rotation angle in radians between two rotations: [..., 3, 3] -> [...].

    Uses trace(R1ᵀ R2) = Σ R1⊙R2 (elementwise — keeps it off the MXU, exact f32).
    """
    trace = jnp.sum(R1 * R2, axis=(-1, -2))
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


def rotx(a):
    a = jnp.asarray(a)
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        -2,
    )


def roty(a):
    a = jnp.asarray(a)
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        -2,
    )


def rotz(a):
    a = jnp.asarray(a)
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )
