"""Photon map: gather math vs a direct NumPy port of cyPhotonMap, and an
end-to-end photon-mapped render."""

import jax.numpy as jnp
import numpy as np
import pytest

from qaray_tpu.photon.gather import PhotonMapData, estimate_irradiance

pytestmark = pytest.mark.quick


def _make_map(n=300, radius=0.5, seed=0):
    rs = np.random.RandomState(seed)
    pos = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    power = rs.uniform(0, 0.1, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return PhotonMapData(
        pos=jnp.asarray(pos),
        power=jnp.asarray(power),
        max_power=jnp.asarray(power.max(axis=1)),
        direction=jnp.asarray(d),
        radius=jnp.asarray(np.float32(radius)),
        valid=jnp.asarray(np.ones(n, bool)),
    ), pos, power, d


def _reference_estimate(pos, power, pdir, radius, q, max_photons=100):
    """Direct port of EstimateIrradiance<100> (quadratic filter): when more
    than max_photons photons lie inside the radius, the kd heap's dist2[0]
    shrinks to the kth-nearest distance, used by filter AND area
    (cyPhotonMap.h:356-357,376-385)."""
    r2 = radius * radius
    d2 = np.sum((pos - q) ** 2, axis=1)
    if max_photons is not None and (d2 < r2).sum() > max_photons:
        r_eff2 = np.sort(d2)[max_photons - 1]
    else:
        r_eff2 = r2
    sel = d2 < r_eff2
    w = (1.0 - d2 / r_eff2)[sel]
    irrad = (w[:, None] * power[sel]).sum(axis=0) / (np.pi * 0.5 * r_eff2)
    maxp = power[sel].max(axis=1) if sel.any() else np.zeros(0)
    dsum = (w[:, None] * maxp[:, None] * pdir[sel]).sum(axis=0)
    norm = np.linalg.norm(dsum)
    direction = dsum / norm if norm > 0 else dsum
    return irrad, direction


def test_estimate_matches_reference_port():
    pmap, pos, power, pdir = _make_map()
    qs = np.random.RandomState(1).uniform(-1, 1, (32, 3)).astype(np.float32)
    irrad, direction = estimate_irradiance(pmap, jnp.asarray(qs), chunk=64)
    irrad = np.asarray(irrad)
    direction = np.asarray(direction)
    for i, q in enumerate(qs):
        expect_i, expect_d = _reference_estimate(pos, power, pdir, 0.5, q)
        np.testing.assert_allclose(irrad[i], expect_i, rtol=1e-4, atol=1e-5)
        if np.linalg.norm(expect_d) > 0:
            np.testing.assert_allclose(direction[i], expect_d, atol=1e-4)


def test_knn_cap_binds_like_reference_heap():
    """Dense cluster: >100 photons inside the radius must shrink the
    effective radius to the 100th-nearest distance (EstimateIrradiance<100>);
    exactly-100 and fewer-than-100 regions must keep the full radius."""
    rs = np.random.RandomState(7)
    pos = (rs.uniform(-0.2, 0.2, (400, 3))).astype(np.float32)  # dense ball
    power = rs.uniform(0, 0.1, (400, 3)).astype(np.float32)
    d = rs.normal(size=(400, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pmap = PhotonMapData(
        pos=jnp.asarray(pos),
        power=jnp.asarray(power),
        max_power=jnp.asarray(power.max(axis=1)),
        direction=jnp.asarray(d),
        radius=jnp.asarray(np.float32(0.5)),
        valid=jnp.asarray(np.ones(400, bool)),
    )
    qs = np.concatenate(
        [np.zeros((1, 3)), np.array([[5.0, 0, 0]]), rs.uniform(-0.3, 0.3, (6, 3))]
    ).astype(np.float32)
    assert ((pos - qs[0]) ** 2).sum(axis=1).__lt__(0.25).sum() > 100  # binds
    irrad, direction = estimate_irradiance(pmap, jnp.asarray(qs))
    for i, q in enumerate(qs):
        expect_i, expect_d = _reference_estimate(pos, power, d, 0.5, q)
        np.testing.assert_allclose(
            np.asarray(irrad)[i], expect_i, rtol=2e-4, atol=1e-5
        )
        if np.linalg.norm(expect_d) > 0:
            np.testing.assert_allclose(
                np.asarray(direction)[i], expect_d, atol=2e-4
            )


def test_streaming_gather_matches_dense():
    """The large-map two-pass streaming gather (_estimate_capped_stream)
    must produce the dense capped sweep's estimates exactly (same math,
    different photon-axis blocking), including where the 100-NN radius cap
    binds."""
    from qaray_tpu.photon.gather import (
        _estimate_capped,
        _estimate_capped_stream,
    )

    rs = np.random.RandomState(3)
    n = 5000
    # Half uniform, half clustered at the origin so the cap binds there.
    pos = np.concatenate(
        [
            rs.uniform(-1, 1, (n // 2, 3)),
            rs.uniform(-0.1, 0.1, (n // 2, 3)),
        ]
    ).astype(np.float32)
    power = rs.uniform(0, 0.1, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pmap = PhotonMapData(
        pos=jnp.asarray(pos),
        power=jnp.asarray(power),
        max_power=jnp.asarray(power.max(axis=1)),
        direction=jnp.asarray(d),
        radius=jnp.asarray(np.float32(0.4)),
        valid=jnp.asarray(np.arange(n) < n - 17),  # some padding lanes
    )
    qs = np.concatenate(
        [np.zeros((4, 3)), rs.uniform(-1, 1, (60, 3))]
    ).astype(np.float32)
    i_dense, d_dense = _estimate_capped(pmap, jnp.asarray(qs), 100, 32)
    i_stream, d_stream = _estimate_capped_stream(pmap, jnp.asarray(qs), 100, 32)
    np.testing.assert_allclose(
        np.asarray(i_dense), np.asarray(i_stream), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(d_dense), np.asarray(d_stream), rtol=1e-4, atol=1e-5
    )


def test_padding_invariance():
    """Chunk padding lanes must not contribute."""
    pmap, pos, power, pdir = _make_map(n=100)
    q = jnp.asarray(np.zeros((4, 3), np.float32))
    i1, _ = estimate_irradiance(pmap, q, chunk=64)  # pad 28 lanes
    i2, _ = estimate_irradiance(pmap, q, chunk=100)  # no pad
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), rtol=1e-5)


@pytest.mark.slow
def test_photon_mapped_render(inputs_dir):
    from qaray_tpu.renderer import Renderer, RendererParam
    from qaray_tpu.scene.xml_parser import load_scene

    scene = load_scene(f"{inputs_dir}/trc_mtl_glass.xml")
    scene.camera.img_width, scene.camera.img_height = 60, 45
    p = RendererParam(
        spp_min=1, spp_max=1, integrator="photonmap", use_photon_map=True,
        photon_map_size=500, caustics_map_size=100,
        photon_map_bounce=6, caustics_map_bounce=6,
    )
    r = Renderer(p)
    r.compute_scene(scene)
    gmap, cmap = r.photon_maps
    assert int(np.asarray(gmap.valid).sum()) == 500
    fb = r.render()
    img = fb.img.reshape(45, 60, 3)
    assert np.isfinite(img).all()
    assert img.sum() > 0


# ---------------------------------------------------------------------------
# Pallas cluster-culled gather (ops/pallas_photon.py)
# ---------------------------------------------------------------------------


def test_pallas_gather_matches_float64():
    """Cluster sweep == the float64 EstimateIrradiance formula (r_eff = r).

    The incumbent XLA `_estimate_capped` drifts ~1e-3 at batch shapes (XLA
    rewrites the [Q,P] squared-distance into a cancellation-prone matmul
    form); the Pallas sweep stays within float32 ulp of the float64
    reference, so the comparison is against float64, not the XLA path.
    """
    from qaray_tpu.ops.pallas_photon import pallas_gather
    from qaray_tpu.photon.cluster import cluster_photon_map

    pmap, pos, power, pdir = _make_map(n=300, radius=0.5)
    pmap = pmap._replace(valid=jnp.asarray(np.arange(300) < 283))
    pmap = cluster_photon_map(pmap)
    qs = np.random.RandomState(1).uniform(-1, 1, (64, 3)).astype(np.float32)

    irr_s, dsum_s, cnt = pallas_gather(
        pmap.ctable, pmap.cbounds, pmap.radius, jnp.asarray(qs),
        interpret=True,
    )
    r2 = 0.25
    area = np.pi * 0.5 * r2
    irr = np.asarray(irr_s) / area

    pv = pos[:283].astype(np.float64)
    pw = power[:283].astype(np.float64)
    pd64 = (pdir[:283] * power[:283].max(axis=1, keepdims=True)).astype(
        np.float64
    )
    d2 = ((qs[:, None, :].astype(np.float64) - pv[None]) ** 2).sum(-1)
    w = np.maximum(0.0, 1.0 - d2 / r2) * (d2 < r2)
    np.testing.assert_allclose(irr, (w @ pw) / area, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dsum_s), w @ pd64, rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(cnt), (d2 < r2).sum(-1))

    # Masked lanes gather nothing.
    act = np.zeros(64, np.float32)
    act[:10] = 1.0
    irr_m, _, cnt_m = pallas_gather(
        pmap.ctable, pmap.cbounds, pmap.radius, jnp.asarray(qs),
        jnp.asarray(act), interpret=True,
    )
    assert np.all(np.asarray(cnt_m)[10:] == 0)
    np.testing.assert_allclose(np.asarray(irr_m)[:10], np.asarray(irr_s)[:10])


def test_pallas_gather_empty_map():
    """An all-invalid (empty) map packs to a never-overlapping cluster."""
    from qaray_tpu.ops.pallas_photon import pallas_gather
    from qaray_tpu.photon.cluster import cluster_photon_map

    pmap, *_ = _make_map(n=64)
    pmap = pmap._replace(valid=jnp.zeros(64, bool))
    pmap = cluster_photon_map(pmap)
    qs = jnp.asarray(np.zeros((8, 3), np.float32))
    irr, dsum, cnt = pallas_gather(pmap.ctable, pmap.cbounds, pmap.radius,
                                   qs, interpret=True)
    assert np.all(np.asarray(irr) == 0)
    assert np.all(np.asarray(cnt) == 0)


def test_caustics_map_degrades_to_empty(inputs_dir):
    """Scenes where every material has diffuse luma > 0 can never store a
    caustics photon (renderer.cpp:248-271 sets hasDiffuseHit at the FIRST
    photon-surface hit) — the reference's `while (true)` build loop spins
    forever on its own caustics flagship. We degrade to an empty map."""
    from qaray_tpu.photon.build import _build_one_map
    from qaray_tpu.renderer import RendererParam
    from qaray_tpu.scene.compiler import compile_scene
    from qaray_tpu.scene.xml_parser import load_scene

    desc = load_scene(
        f"{inputs_dir}/example_project12_caustics_glossy.xml"
    )
    desc.camera.img_width, desc.camera.img_height = 40, 30
    scene, meta = compile_scene(desc)
    cmap = _build_one_map(scene, meta, RendererParam(), 100, 6, 1.0,
                          caustics=True, seed=7, batch=512)
    assert int(np.asarray(cmap.valid).sum()) == 0


def test_renderer_escalation_splice(monkeypatch, inputs_dir):
    """End-to-end: lanes whose gather exceeds the 100-photon cap are
    re-rendered on the exact XLA path and folded with exact per-pixel
    counts (renderer._accumulate_escalated). A blown-up global-map radius
    forces escalation on most gathering lanes; the megakernel render must
    equal the pure-XLA render to quantization."""
    import jax
    import jax.numpy as jnp

    from qaray_tpu.renderer import Renderer, RendererParam

    def run(mega: bool):
        jax.clear_caches()  # env-dependent routing is read at trace time
        if mega:
            monkeypatch.setenv("QARAY_MEGAKERNEL", "1")
            monkeypatch.delenv("QARAY_NO_MEGAKERNEL", raising=False)
        else:
            monkeypatch.delenv("QARAY_MEGAKERNEL", raising=False)
            monkeypatch.setenv("QARAY_NO_MEGAKERNEL", "1")
        from qaray_tpu.scene.xml_parser import load_scene

        scene = load_scene(f"{inputs_dir}/trc_mtl_glass.xml")
        scene.camera.img_width, scene.camera.img_height = 40, 30
        p = RendererParam(spp_min=1, spp_max=1, integrator="photonmap",
                          use_photon_map=True, photon_map_size=300,
                          caustics_map_size=80, photon_map_bounce=6,
                          caustics_map_bounce=6, rng_impl="threefry2x32",
                          max_bounce=3, shadow_spp=2, shadow_spp_max=4)
        r = Renderer(p)
        r.compute_scene(scene)
        g, c = r.photon_maps
        r.photon_maps = (g._replace(radius=jnp.asarray(np.float32(50.0))), c)
        fb = r.render()
        return np.asarray(fb.img, np.int32), r

    img_m, rm = run(True)
    img_x, _ = run(False)
    assert rm._mega_photon
    d = np.abs(img_m - img_x)
    assert d.max() <= 3 and (d > 1).mean() < 0.01, (
        f"max {d.max()}, frac>1 {(d > 1).mean():.3f}"
    )
