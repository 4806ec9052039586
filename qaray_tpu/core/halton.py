"""Vectorized Halton / radical-inverse sequences.

The reference uses Halton(s, 11)/Halton(s, 13) for sub-pixel jitter
(scene/scene.cpp:99-102) and Halton(i, 2)/Halton(i, 3) for the stochastic
texture footprint filter (core/texture.cpp:38-39). This is a batched port of
the scalar radical inverse at core/sampler.cpp:31-40.
"""

import numpy as np
import jax.numpy as jnp


def halton_np(index, base):
    """NumPy host-side radical inverse; `index` may be an int or array."""
    index = np.asarray(index, dtype=np.int64)
    r = np.zeros(index.shape, dtype=np.float64)
    f = np.full(index.shape, 1.0 / base, dtype=np.float64)
    i = index.copy()
    while np.any(i > 0):
        r = r + f * (i % base)
        f = f / base
        i = i // base
    return r.astype(np.float32)


def halton(index, base, num_iters=None):
    """JAX radical inverse. `index`: int32 array; `base`: static Python int."""
    index = jnp.asarray(index, dtype=jnp.int32)
    if num_iters is None:
        # Enough digits for indices up to 2^31 in the given base.
        num_iters = int(np.ceil(31 / np.log2(base))) + 1
    r = jnp.zeros(index.shape, dtype=jnp.float32)
    f = jnp.full(index.shape, 1.0 / base, dtype=jnp.float32)
    i = index
    for _ in range(num_iters):
        r = r + f * (i % base).astype(jnp.float32)
        f = f / base
        i = i // base
    return r
