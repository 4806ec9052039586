"""Closed-form intersection cases for sphere/plane/triangle kernels."""

import jax.numpy as jnp
import pytest
import numpy as np

from qaray_tpu.core.constants import BIGFLOAT
from qaray_tpu.ops import intersect as I
from qaray_tpu.scene.arrays import KIND_PLANE, KIND_SPHERE, AnalyticPrims

pytestmark = pytest.mark.quick


def _prims(kinds, mats, scales=None, offsets=None):
    n = len(kinds)
    scales = scales or [1.0] * n
    offsets = offsets or [np.zeros(3)] * n
    m = np.stack([np.eye(3) / s for s in scales]).astype(np.float32)
    t = np.stack(offsets).astype(np.float32)
    return AnalyticPrims(
        kind=jnp.asarray(np.array(kinds, np.int32)),
        mtl=jnp.asarray(np.array(mats, np.int32)),
        m_w2o=jnp.asarray(m),
        t_o2w=jnp.asarray(t),
    )


def test_unit_sphere_head_on():
    prims = _prims([KIND_SPHERE], [0])
    p = jnp.asarray([[0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, idx = I.closest_analytic(p, d, prims)
    np.testing.assert_allclose(np.asarray(t), [4.0], atol=1e-5)
    attrs = I.analytic_hit_attrs(p, d, t, idx, prims)
    np.testing.assert_allclose(np.asarray(attrs["n"]), [[0, 0, 1]], atol=1e-5)
    assert bool(attrs["front"][0])


def test_sphere_from_inside_hits_back():
    prims = _prims([KIND_SPHERE], [0])
    p = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, idx = I.closest_analytic(p, d, prims)
    np.testing.assert_allclose(np.asarray(t), [1.0], atol=1e-5)
    attrs = I.analytic_hit_attrs(p, d, t, idx, prims)
    assert not bool(attrs["front"][0])


def test_scaled_translated_sphere():
    prims = _prims([KIND_SPHERE], [0], scales=[2.0], offsets=[np.array([0, 0, 10.0])])
    p = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t, idx = I.closest_analytic(p, d, prims)
    np.testing.assert_allclose(np.asarray(t), [8.0], atol=1e-4)


def test_plane_bounds():
    prims = _prims([KIND_PLANE], [0])
    p = jnp.asarray([[0.5, 0.5, 3.0], [1.5, 0.0, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t, idx = I.closest_analytic(p, d, prims)
    np.testing.assert_allclose(np.asarray(t)[0], 3.0, atol=1e-5)
    assert np.asarray(t)[1] >= BIGFLOAT  # outside the unit square


def test_sphere_uv():
    prims = _prims([KIND_SPHERE], [0])
    # Hit at +z pole: v = 0.5 + asin(1)/pi = 1.0
    p = jnp.asarray([[0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, idx = I.closest_analytic(p, d, prims)
    attrs = I.analytic_hit_attrs(p, d, t, idx, prims)
    np.testing.assert_allclose(float(attrs["uvw"][0, 1]), 1.0, atol=1e-5)


def test_triangle_hit_and_bary():
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    v1 = jnp.asarray([[1.0, 0.0, 0.0]])
    v2 = jnp.asarray([[0.0, 1.0, 0.0]])
    p = jnp.asarray([[0.25, 0.25, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, bary, front, hit = I.intersect_triangles(p, d, v0, v1, v2, jnp.asarray([BIGFLOAT]))
    assert bool(hit[0])
    np.testing.assert_allclose(np.asarray(t), [1.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(bary)[0], [0.5, 0.25, 0.25], atol=1e-5)


def test_triangle_miss_outside():
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    v1 = jnp.asarray([[1.0, 0.0, 0.0]])
    v2 = jnp.asarray([[0.0, 1.0, 0.0]])
    p = jnp.asarray([[0.9, 0.9, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    _, _, _, hit = I.intersect_triangles(p, d, v0, v1, v2, jnp.asarray([BIGFLOAT]))
    assert not bool(hit[0])
