"""Tiled packet-culled mesh traversal vs the flat dense sweep and brute
force: identical winners (exact re-test) for closest hit, identical
occlusion for any-hit, across coherent and incoherent ray sets."""

import numpy as np
import pytest
import jax.numpy as jnp

from qaray_tpu.core.constants import BIGFLOAT
from qaray_tpu.ops.mesh_stream import build_stream, exact_winner, stream_closest, stream_any_hit
from qaray_tpu.ops.mesh_tiles import (
    build_tiles,
    exact_winner_rows,
    tiled_sweep,
)

pytestmark = pytest.mark.quick


def _mesh(n_tri=3000, seed=0):
    rs = np.random.RandomState(seed)
    # Triangle soup in [-2,2]^3, small triangles so clusters stay tight.
    c = rs.uniform(-2, 2, (n_tri, 1, 3))
    off = rs.uniform(-0.08, 0.08, (n_tri, 3, 3))
    return (c + off).astype(np.float32)


def _rays(n, seed=1, coherent=True):
    rs = np.random.RandomState(seed)
    if coherent:
        side = int(np.sqrt(n))
        u = (np.arange(n) % side) / side - 0.5
        v = (np.arange(n) // side % side) / side - 0.5
        p = np.tile(np.array([[0.0, 0.0, 6.0]], np.float32), (n, 1))
        d = np.stack([u * 1.2, v * 1.2, -np.ones(n)], -1).astype(np.float32)
    else:
        p = rs.uniform(-3, 3, (n, 3)).astype(np.float32)
        d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return p, d


@pytest.mark.parametrize("coherent", [True, False])
def test_tiled_closest_matches_stream(coherent):
    tri_v = _mesh()
    tiles = build_tiles(tri_v, cluster=64)
    stream = build_stream(tri_v, chunk=64)
    tv = jnp.asarray(tri_v)
    n = 1024
    p_np, d_np = _rays(n, coherent=coherent)
    p, d = jnp.asarray(p_np), jnp.asarray(d_np)
    t_init = jnp.full((n,), BIGFLOAT)

    t_s, gid_s, gid2_s = stream_closest(p, d, t_init, stream, chunk=64)
    te_s, _, _, valid_s = exact_winner(p, d, gid_s, tv)

    t_t, rows, rows2 = tiled_sweep(
        p, d, t_init, tiles, packet=256, cluster=64
    )
    te_t, _, _, valid_t, gid_t = exact_winner_rows(p, d, rows, tiles, tv)

    # Same hit/miss pattern and same distance (the winning triangle can
    # differ only at exact ties).
    assert np.array_equal(np.asarray(valid_s), np.asarray(valid_t)), (
        f"hit sets differ: {np.asarray(valid_s).sum()} vs "
        f"{np.asarray(valid_t).sum()}"
    )
    hs = np.asarray(valid_s)
    np.testing.assert_allclose(
        np.asarray(te_s)[hs], np.asarray(te_t)[hs], rtol=1e-6, atol=1e-6
    )
    agree = np.mean(np.asarray(gid_s)[hs] == np.asarray(gid_t)[hs])
    assert agree > 0.999, f"winner ids agree only {agree:.4f}"


@pytest.mark.parametrize("coherent", [True, False])
def test_tiled_anyhit_matches_stream(coherent):
    tri_v = _mesh(seed=3)
    tiles = build_tiles(tri_v, cluster=64)
    stream = build_stream(tri_v, chunk=64)
    n = 1024
    p_np, d_np = _rays(n, seed=4, coherent=coherent)
    p, d = jnp.asarray(p_np), jnp.asarray(d_np)
    t_max = jnp.full((n,), 5.0)

    occ_s = stream_any_hit(p, d, t_max, stream, chunk=64)
    occ_t = tiled_sweep(
        p, d, t_max, tiles, packet=256, cluster=64, any_hit=True
    )
    assert np.array_equal(np.asarray(occ_s), np.asarray(occ_t))


def test_tiled_render_matches_bvh_walk(monkeypatch):
    """Full render through trace.py with the tiled path forced: identical
    image to the BVH-walk path (threefry draws are layout-independent, and
    both paths produce reference-exact winners)."""
    import os

    from qaray_tpu.renderer import Renderer, RendererParam
    from qaray_tpu.scene.xml_parser import load_scene

    assets = os.path.join(os.path.dirname(__file__), "assets")

    def render(env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        scene = load_scene(f"{assets}/mesh_scene.xml")
        scene.camera.img_width = 64
        scene.camera.img_height = 48
        r = Renderer(RendererParam(spp_min=2, spp_max=2, max_bounce=2,
                                   integrator="pathtrace", shadow_spp=4,
                                   rng_impl="threefry2x32"))
        r.compute_scene(scene)
        fb = r.render()
        for k in env:
            monkeypatch.delenv(k)
        return fb.mean.copy()

    # Tiny budget forces the compiler to build tiles instead of the stream.
    img_tiles = render({"QARAY_STREAM_MAX_TRIS": "1", "QARAY_MESH_PATH": "tiles"})
    img_bvh = render({"QARAY_MESH_PATH": "bvh"})
    np.testing.assert_allclose(img_tiles, img_bvh, atol=2e-6)


def test_tiled_runner_up_fallback():
    """Rows map to original ids; runner-up rows valid where present."""
    tri_v = _mesh(n_tri=500, seed=7)
    tiles = build_tiles(tri_v, cluster=64)
    n = 256
    p_np, d_np = _rays(n, seed=8, coherent=True)
    p, d = jnp.asarray(p_np), jnp.asarray(d_np)
    t_init = jnp.full((n,), BIGFLOAT)
    t_t, rows, rows2 = tiled_sweep(p, d, t_init, tiles, packet=256, cluster=64)
    gid = np.asarray(tiles.gid)
    rows_np = np.asarray(rows)
    assert (gid[rows_np[rows_np >= 0]] >= 0).all()

    # Empty mesh handles cleanly.
    tiles0 = build_tiles(np.zeros((0, 3, 3), np.float32))
    t0, r0, r20 = tiled_sweep(p, d, t_init, tiles0, packet=256)
    assert (np.asarray(r0) == -1).all()
