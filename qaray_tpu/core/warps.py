"""Sampling warps, batched.

Ports of the reference's warp functions (core/sampler.cpp:42-167) driven by
explicit uniforms instead of a stateful RNG, so every draw is a pure function
of its counters and the warps can run inside jit/shard_map/Pallas.

Note on UniformBall: the reference's rejection loop (core/sampler.cpp:42-53)
has a known quirk — it assigns `p.z = (2*r2-1)*radius`, reusing r2, so the
sample actually lives on the x = r1, y = z = r2 degenerate slab. We replicate
that quirk behind `uniform_ball_ref` (for image parity with glossy materials)
and also provide a correct `uniform_ball`. Rejection loops are re-expressed as
a fixed number of attempts with select (TPU-friendly, statistically identical
up to the tiny probability that all attempts miss, in which case the last
accepted candidate is scaled into the ball).
"""

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def uniform_sphere(u):
    """u: [..., 2] uniforms -> unit vectors [..., 3]. PDF = 1/4pi.

    Port of Sampler::UniformSphere (core/sampler.cpp:55-70).
    """
    r1 = u[..., 0] * 2.0 - 1.0
    cos_t = r1
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - r1 * r1))
    phi = TWO_PI * u[..., 1]
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def uniform_hemisphere(u):
    """PDF = 1/2pi. Port of core/sampler.cpp:72-86 (z-up)."""
    cos_t = u[..., 0]
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = TWO_PI * u[..., 1]
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def cos_weighted_hemisphere(u):
    """PDF = cos(theta)/pi. Port of core/sampler.cpp:88-104 (z-up)."""
    cos_t = jnp.sqrt(u[..., 0])
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - u[..., 0]))
    phi = TWO_PI * u[..., 1]
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def cos_lobe_weighted_hemisphere(u, n):
    """PDF = (n+1) cos^n(theta) / 2pi (theta_max=90 branch of sampler.cpp:136-153)."""
    cos_t = jnp.power(u[..., 0], 1.0 / (n + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = TWO_PI * u[..., 1]
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def uniform_ball(u3, radius):
    """Exactly uniform in a ball of `radius` via the polar method.

    u3: [..., 3] uniforms. radius: scalar or [...] broadcastable.
    """
    d = uniform_sphere(u3[..., :2])
    r = jnp.power(u3[..., 2], 1.0 / 3.0)
    if jnp.ndim(radius):
        radius = radius[..., None]
    return d * (r[..., None] * radius)


def uniform_ball_ref(u_attempts, radius):
    """Reference-quirk UniformBall (core/sampler.cpp:42-53).

    The reference draws (r1, r2, r3) but uses r2 for BOTH y and z, then
    rejects while |p| > radius. We replicate with A fixed attempts:
    u_attempts: [..., A, 2] uniforms (r1, r2 per attempt). Returns [..., 3].
    The first in-ball attempt wins (matching sequential rejection); if all
    miss (prob < (1 - pi/6)^A) the last attempt is radially clamped.
    """
    r1 = u_attempts[..., 0] * 2.0 - 1.0
    r2 = u_attempts[..., 1] * 2.0 - 1.0
    p = jnp.stack([r1, r2, r2], axis=-1)  # [..., A, 3] in units of radius
    norm = jnp.sqrt(jnp.sum(p * p, axis=-1))  # [..., A]
    ok = norm <= 1.0
    # Index of first success; fall back to the last attempt.
    num_a = u_attempts.shape[-2]
    idx_arr = jnp.arange(num_a)
    first = jnp.min(jnp.where(ok, idx_arr, num_a - 1), axis=-1)
    pick = jnp.take_along_axis(p, first[..., None, None], axis=-2)[..., 0, :]
    pick_norm = jnp.sqrt(jnp.sum(pick * pick, axis=-1, keepdims=True))
    pick = jnp.where(pick_norm > 1.0, pick / jnp.maximum(pick_norm, 1e-12), pick)
    if jnp.ndim(radius):
        radius = radius[..., None]
    return pick * radius


def concentric_disc(u, radius):
    """DoF lens sample: r = R*sqrt(u1), t = 2pi*u2 (scene/scene.cpp:104-111)."""
    r = radius * jnp.sqrt(u[..., 0])
    t = TWO_PI * u[..., 1]
    return jnp.stack([r * jnp.cos(t), r * jnp.sin(t)], axis=-1)
