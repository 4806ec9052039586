"""Threefry-2x32 primitives as pure jnp on uint32 arrays — usable INSIDE
Pallas kernels (and testable outside them).

Why this exists: the megakernel (ops/pallas_pathtrace.py) fuses the whole
per-bounce pipeline into one Pallas kernel, so its random draws must be
generated in-kernel. To keep bit-parity with the XLA wavefront engine
(core/rng.py -> jax.random), this module reimplements exactly the pieces of
JAX's threefry PRNG the engine touches:

  fold2(k0, k1, d)   == key_data(jax.random.fold_in(key, d))
  draw_at(k0,k1,f)   == jax.random.uniform(key, shape)[f-th flat element]
                        under the DEFAULT jax.config.threefry_partitionable
                        path (bits = w0 ^ w1 of cipher(key, hi(f), lo(f)));
                        verified bit-exact in tests/test_kernel_rng.py.

The cipher is the standard Threefry-2x32 with 20 rounds (rotation schedule
[13,15,26,6] / [17,29,16,24], key injections every 4 rounds) — the same
computation jax._src.prng._threefry2x32_lowering performs.

The reference renderer, by contrast, seeds thread-local xorshift from
time(NULL) (samplers/Sampler_Marsaglia.cpp:33-41); counter-based streams are
the determinism upgrade documented in core/rng.py.
"""

import jax
import jax.numpy as jnp

U32 = jnp.uint32


def _rotl(x, r: int):
    return (x << U32(r)) | (x >> U32(32 - r))


def cipher2x32(k0, k1, x0, x1):
    """Threefry-2x32-20 block cipher. All args uint32 arrays (broadcast ok).

    Returns the two output words.
    """
    ks0, ks1 = k0, k1
    ks2 = k0 ^ k1 ^ U32(0x1BD11BDA)
    x0 = x0 + ks0
    x1 = x1 + ks1
    rot = ((13, 15, 26, 6), (17, 29, 16, 24))
    ks = (ks0, ks1, ks2)
    for i in range(5):
        for r in rot[i % 2]:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + U32(i + 1)
    return x0, x1


def fold2(k0, k1, data):
    """jax.random.fold_in for threefry keys, on raw words.

    data: int32/uint32 array (int32 wraps to uint32 exactly like
    jnp.asarray(data, uint32) in jax's fold_in).
    """
    if data.dtype != U32:
        data = data.astype(U32)
    return cipher2x32(k0, k1, jnp.zeros_like(data), data)


def u01(bits):
    """uint32 bits -> float32 uniform in [0, 1): (bits>>9 | 1.0-exponent)
    bitcast minus 1 — jax.random.uniform's mantissa trick."""
    f = jax.lax.bitcast_convert_type(
        (bits >> U32(9)) | U32(0x3F800000), jnp.float32
    )
    return f - 1.0


def draw_at(k0, k1, f: int):
    """Flat element `f` of jax.random.uniform(key, shape) (partitionable
    threefry path): bits = w0 ^ w1 of cipher(key, hi64(f), lo64(f))."""
    hi = jnp.full_like(k0, f >> 32)
    lo = jnp.full_like(k0, f & 0xFFFFFFFF)
    w0, w1 = cipher2x32(k0, k1, hi, lo)
    return u01(w0 ^ w1)
