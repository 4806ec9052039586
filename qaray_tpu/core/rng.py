"""Deterministic counter-based RNG for the wavefront integrators.

The reference seeds a thread-local xorshift from time(NULL)
(samplers/Sampler_Marsaglia.cpp:33-41), which makes renders nondeterministic
and rank-count dependent. The TPU-native design replaces that with stateless
threefry keys folded per (pixel, sample, bounce, purpose): every lane of a
megabatch derives its own stream with no cross-lane coupling, so images are
bit-reproducible at any sharding.

Purpose tags keep the draw streams of different decision points independent
even though they execute at the same (ray, bounce) coordinates.
"""

import jax
import jax.numpy as jnp

# Purpose tags (arbitrary distinct ints).
P_LOBE_SELECT = 0
P_LOBE_SAMPLE = 1
P_DOF = 2
P_SHADOW = 3
P_PHOTON_EMIT = 4
P_PIXEL = 5
P_LIGHT_SELECT = 6
P_GLOSSY = 7


def ray_keys(base_key, ray_ids):
    """Vector of per-ray keys from integer ray ids [B]."""
    return jax.vmap(lambda i: jax.random.fold_in(base_key, i))(ray_ids)


def fold(keys, tag):
    """Fold a static or traced scalar tag into a batch of keys [B, 2]."""
    return jax.vmap(lambda k: jax.random.fold_in(k, tag))(keys)


def uniform(keys, shape_suffix=()):
    """One uniform draw (or a small tuple) per key. keys: [B,2] -> [B,*suffix]."""
    def draw(k):
        return jax.random.uniform(k, shape_suffix, dtype=jnp.float32)

    return jax.vmap(draw)(keys)
