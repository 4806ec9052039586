"""Batched 3-vector math on trailing axis (-1).

All framework geometry is stored SoA-style as `[..., 3]` float32 arrays; these
helpers operate on the trailing axis so they vmap/shard transparently.
Equivalents of the reference's GLM wrappers (math/math.h:92-101).
"""

import jax.numpy as jnp

from qaray_tpu.core import constants


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def vdot(a, b):
    """Dot product keeping the trailing axis (for broadcasting back onto vectors)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length2(a):
    return jnp.sum(a * a, axis=-1)


def length(a):
    return jnp.sqrt(length2(a))


def normalize(a, eps=0.0):
    """Normalize along the trailing axis.

    With eps=0 this matches glm::normalize (NaN for zero vectors); pass a tiny
    eps where the reference guarantees non-zero inputs but we want NaN-safety.
    """
    n2 = jnp.sum(a * a, axis=-1, keepdims=True)
    if eps:
        n2 = jnp.maximum(n2, eps)
    return a * jnp.reciprocal(jnp.sqrt(n2))


def luma(c):
    """Rec.709 luma; reference math/math.h ColorLuma."""
    return (
        constants.LUMA_R * c[..., 0]
        + constants.LUMA_G * c[..., 1]
        + constants.LUMA_B * c[..., 2]
    )


def reflect(v, n):
    """Reflect view direction V about normal N: 2N(N.V) - V.

    Matches the reference convention (MtlBlinn_PathTracing.cpp:108) where V
    points AWAY from the surface; the result also points away.
    """
    return 2.0 * n * vdot(n, v) - v


def to_local_frame(n, sample):
    """Map a tangent-space sample (z-up) onto the frame around normal `n`.

    Exact port of the reference's frame construction (math/math.cpp:37-46):
      Z = N
      Y = |Z.x|>|Z.y| ? norm(Z.z, 0, -Z.x) : norm(0, -Z.z, Z.y)
      X = norm(Y x Z)
    Matching the construction bit-for-bit matters: a different (valid) frame
    changes every sampled direction and therefore every MC image.
    """
    z = n
    zx, zy, zz = z[..., 0], z[..., 1], z[..., 2]
    use_a = jnp.abs(zx) > jnp.abs(zy)
    ya = jnp.stack([zz, jnp.zeros_like(zx), -zx], axis=-1)
    yb = jnp.stack([jnp.zeros_like(zx), -zz, zy], axis=-1)
    y = normalize(jnp.where(use_a[..., None], ya, yb))
    x = normalize(cross(y, z))
    unit = normalize(sample)
    return (
        unit[..., 0:1] * x + unit[..., 1:2] * y + unit[..., 2:3] * z
    )


def clamp01(x):
    return jnp.clip(x, 0.0, 1.0)


def pow_safe(base, exponent):
    """x^g for cosine-lobe terms, differentiable w.r.t. the exponent.

    d/dg x^g = x^g ln(x) is NaN at x = 0; clamping the base to 1e-6 leaves
    the primal unchanged within float32 (1e-6^20 == 0) while keeping
    glossiness gradients finite.
    """
    return jnp.power(jnp.maximum(base, 1e-6), exponent)


def linear_to_srgb(c):
    """Reference renderers/renderer.cpp:34-39."""
    a = 0.055
    return jnp.where(
        c < 0.0031308,
        12.92 * c,
        (1.0 + a) * jnp.power(jnp.maximum(c, 1e-12), 1.0 / 2.4) - a,
    )
