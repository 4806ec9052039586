"""BVH build + traversal vs brute-force triangle intersection."""

import jax.numpy as jnp
import pytest
import numpy as np

from qaray_tpu.core.constants import BIGFLOAT
from qaray_tpu.ops.bvh_traverse import traverse_bvh
from qaray_tpu.ops.intersect import intersect_triangles
from qaray_tpu.scene import bvh as bvh_mod
from qaray_tpu.scene.arrays import MeshArrays

pytestmark = pytest.mark.quick


def _random_soup(n_tris, seed=0):
    rs = np.random.RandomState(seed)
    centers = rs.uniform(-2, 2, (n_tris, 1, 3))
    tris = centers + rs.uniform(-0.4, 0.4, (n_tris, 3, 3))
    return tris.astype(np.float32)


def _mesh_arrays(tri_v):
    bvh = bvh_mod.build_bvh(tri_v, max_leaf=4)
    f = tri_v.shape[0]
    return (
        MeshArrays(
            tri_v=jnp.asarray(tri_v),
            tri_n=jnp.asarray(np.zeros_like(tri_v)),
            tri_uv=jnp.asarray(np.zeros((f, 3, 2), np.float32)),
            tri_has_uv=jnp.asarray(np.zeros(f, bool)),
            tri_mtl=jnp.asarray(np.zeros(f, np.int32)),
            bvh_bounds=jnp.asarray(bvh.bounds),
            bvh_left=jnp.asarray(bvh.left),
            bvh_right=jnp.asarray(bvh.right),
            bvh_count=jnp.asarray(bvh.count),
            bvh_elems=jnp.asarray(bvh.elems),
        ),
        bvh_mod.bvh_depth(bvh),
    )


def _brute_force(tri_v, p, d):
    best = np.full(p.shape[0], BIGFLOAT, np.float32)
    for f in range(tri_v.shape[0]):
        v0 = jnp.broadcast_to(tri_v[f, 0], p.shape)
        v1 = jnp.broadcast_to(tri_v[f, 1], p.shape)
        v2 = jnp.broadcast_to(tri_v[f, 2], p.shape)
        t, _, _, hit = intersect_triangles(
            jnp.asarray(p), jnp.asarray(d), v0, v1, v2, jnp.asarray(best)
        )
        t = np.asarray(t)
        hit = np.asarray(hit)
        best = np.where(hit & (t < best), t, best)
    return best


def test_bvh_matches_brute_force():
    tri_v = _random_soup(200)
    rs = np.random.RandomState(1)
    n_rays = 256
    p = rs.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    d = rs.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    mesh, depth = _mesh_arrays(tri_v)
    roots = jnp.zeros(n_rays, jnp.int32)
    t, tri, bary, front = traverse_bvh(
        jnp.asarray(p), jnp.asarray(d), roots,
        jnp.full(n_rays, BIGFLOAT), mesh, stack_size=depth + 2,
    )
    expect = _brute_force(tri_v, p, d)
    np.testing.assert_allclose(np.asarray(t), expect, rtol=1e-5)
    # Hit flags consistent.
    assert ((np.asarray(tri) >= 0) == (expect < BIGFLOAT)).all()


def test_bvh_any_hit_occlusion():
    tri_v = _random_soup(100, seed=2)
    rs = np.random.RandomState(3)
    n_rays = 128
    p = rs.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    d = rs.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = np.full(n_rays, 5.0, np.float32)

    mesh, depth = _mesh_arrays(tri_v)
    roots = jnp.zeros(n_rays, jnp.int32)
    t, tri, _, _ = traverse_bvh(
        jnp.asarray(p), jnp.asarray(d), roots, jnp.asarray(t_max),
        mesh, stack_size=depth + 2, any_hit=True,
    )
    occluded = (np.asarray(tri) >= 0) & (np.asarray(t) < t_max)
    expect = _brute_force(tri_v, p, d) < t_max
    np.testing.assert_array_equal(occluded, expect)


def test_bvh_build_covers_all_tris():
    tri_v = _random_soup(500, seed=4)
    bvh = bvh_mod.build_bvh(tri_v, max_leaf=4)
    assert sorted(bvh.elems.tolist()) == list(range(500))
    leaf = bvh.left < 0
    assert (bvh.count[leaf] > 0).all()
    assert (bvh.count[leaf] <= 4).all()


def _packed(tri_v):
    from qaray_tpu.ops.bvh_packed import pack_bvh

    bvh = bvh_mod.build_bvh(tri_v, max_leaf=4)
    pnodes, ltri, ref = pack_bvh(
        bvh.bounds, bvh.left, bvh.right, bvh.count, bvh.elems, tri_v
    )
    return jnp.asarray(pnodes), jnp.asarray(ltri), int(ref[0])


def test_packed_walk_matches_stacked():
    """Packed fat-node traversal returns bitwise-identical closest hits."""
    from qaray_tpu.ops.bvh_packed import traverse_bvh_packed

    tri_v = _random_soup(300, seed=7)
    rs = np.random.RandomState(8)
    n_rays = 512
    p = rs.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    d = rs.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    mesh, depth = _mesh_arrays(tri_v)
    roots = jnp.zeros(n_rays, jnp.int32)
    t_init = jnp.full(n_rays, BIGFLOAT)
    t_s, tri_s, bary_s, front_s = traverse_bvh(
        jnp.asarray(p), jnp.asarray(d), roots, t_init, mesh,
        stack_size=depth + 2,
    )
    pnodes, ltri, root_ref = _packed(tri_v)
    t_p, tri_p, bary_p, front_p = traverse_bvh_packed(
        jnp.asarray(p), jnp.asarray(d),
        jnp.full(n_rays, root_ref, jnp.int32), t_init, pnodes, ltri,
        stack_size=depth + 2,
    )
    np.testing.assert_array_equal(np.asarray(t_s), np.asarray(t_p))
    np.testing.assert_array_equal(np.asarray(tri_s), np.asarray(tri_p))
    np.testing.assert_array_equal(np.asarray(bary_s), np.asarray(bary_p))
    np.testing.assert_array_equal(np.asarray(front_s), np.asarray(front_p))


def test_packed_walk_any_hit():
    from qaray_tpu.ops.bvh_packed import traverse_bvh_packed

    tri_v = _random_soup(100, seed=2)
    rs = np.random.RandomState(3)
    n_rays = 128
    p = rs.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    d = rs.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = np.full(n_rays, 5.0, np.float32)

    pnodes, ltri, root_ref = _packed(tri_v)
    _, depth = _mesh_arrays(tri_v)
    t, tri, _, _ = traverse_bvh_packed(
        jnp.asarray(p), jnp.asarray(d),
        jnp.full(n_rays, root_ref, jnp.int32), jnp.asarray(t_max),
        pnodes, ltri, stack_size=depth + 2, any_hit=True,
    )
    occluded = (np.asarray(tri) >= 0) & (np.asarray(t) < t_max)
    expect = _brute_force(tri_v, p, d) < t_max
    np.testing.assert_array_equal(occluded, expect)


def test_packed_single_leaf_root():
    """A BVH whose root is a leaf: the packed walk must handle a popped
    leaf ref (the degenerate path through slot 0)."""
    from qaray_tpu.ops.bvh_packed import traverse_bvh_packed

    tri_v = _random_soup(3, seed=5)  # <= max_leaf, so root is a leaf
    rs = np.random.RandomState(6)
    n_rays = 64
    p = rs.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    d = rs.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    pnodes, ltri, root_ref = _packed(tri_v)
    assert root_ref < 0  # leaf-encoded
    t, tri, _, _ = traverse_bvh_packed(
        jnp.asarray(p), jnp.asarray(d),
        jnp.full(n_rays, root_ref, jnp.int32),
        jnp.full(n_rays, BIGFLOAT), pnodes, ltri, stack_size=4,
    )
    expect = _brute_force(tri_v, p, d)
    np.testing.assert_allclose(np.asarray(t), expect, rtol=1e-5)


def test_stream_matches_bvh_walk():
    """Dense streaming sweep finds the same closest hits as the BVH walk
    (winner re-derived with reference-exact numerics)."""
    from qaray_tpu.ops.mesh_stream import (
        build_stream, exact_winner, stream_closest, stream_any_hit,
    )

    tri_v = _random_soup(300, seed=11)
    rs = np.random.RandomState(12)
    n_rays = 512
    p = rs.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    d = rs.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pj, dj = jnp.asarray(p), jnp.asarray(d)

    mesh, depth = _mesh_arrays(tri_v)
    roots = jnp.zeros(n_rays, jnp.int32)
    t_init = jnp.full(n_rays, BIGFLOAT)
    t_s, tri_s, bary_s, front_s = traverse_bvh(
        pj, dj, roots, t_init, mesh, stack_size=depth + 2
    )

    stream = build_stream(tri_v)
    t_sw, gid, _gid2 = stream_closest(pj, dj, t_init, stream)
    t_e, bary_e, front_e, valid = exact_winner(pj, dj, gid, jnp.asarray(tri_v))

    hit_bvh = np.asarray(tri_s) >= 0
    hit_stream = np.asarray(valid)
    np.testing.assert_array_equal(hit_bvh, hit_stream)
    both = hit_bvh & hit_stream
    # Same winning triangle modulo exact-t ties; t must agree to fp tolerance.
    np.testing.assert_allclose(
        np.asarray(t_s)[both], np.asarray(t_e)[both], rtol=1e-5
    )
    same = np.asarray(tri_s)[both] == np.asarray(gid)[both]
    assert same.mean() > 0.99  # ties between coplanar soup tris may differ
    np.testing.assert_array_equal(
        np.asarray(front_s)[both][same], np.asarray(front_e)[both][same]
    )
    np.testing.assert_allclose(
        np.asarray(bary_s)[both][same], np.asarray(bary_e)[both][same],
        atol=1e-5,
    )

    # Any-hit occlusion agrees with brute force.
    t_max = np.full(n_rays, 5.0, np.float32)
    occ = np.asarray(stream_any_hit(pj, dj, jnp.asarray(t_max), stream))
    expect = _brute_force(tri_v, p, d) < t_max
    np.testing.assert_array_equal(occ, expect)
