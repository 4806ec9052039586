"""Warp statistics: unit norms, hemisphere support, cosine weighting."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from qaray_tpu.core import warps
from qaray_tpu.core.vecmath import to_local_frame, normalize

pytestmark = pytest.mark.quick


def _uniforms(n, k, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n, k))


def test_uniform_sphere_unit():
    d = np.asarray(warps.uniform_sphere(_uniforms(4096, 2)))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # Mean should be near zero for a uniform sphere.
    assert np.abs(d.mean(axis=0)).max() < 0.05


def test_uniform_hemisphere_up():
    d = np.asarray(warps.uniform_hemisphere(_uniforms(4096, 2)))
    assert (d[:, 2] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_cos_weighted_mean():
    d = np.asarray(warps.cos_weighted_hemisphere(_uniforms(1 << 16, 2)))
    assert (d[:, 2] >= 0).all()
    # E[cos(theta)] = 2/3 for cosine-weighted hemisphere.
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01


def test_uniform_ball_ref_inside():
    u = _uniforms(1024, 8).reshape(1024, 4, 2)
    p = np.asarray(warps.uniform_ball_ref(u, 2.0))
    assert (np.linalg.norm(p, axis=-1) <= 2.0 + 1e-5).all()
    # Reference quirk: y == z component.
    np.testing.assert_allclose(p[:, 1], p[:, 2], atol=1e-6)


def test_local_frame_orthonormal():
    n = np.asarray(normalize(jnp.asarray(np.random.RandomState(0).randn(256, 3))))
    z = jnp.asarray(np.tile([0.0, 0.0, 1.0], (256, 1)))
    out = np.asarray(to_local_frame(jnp.asarray(n), z))
    np.testing.assert_allclose(out, n, atol=1e-5)
