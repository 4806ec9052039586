"""End-to-end render sanity tests on reference scenes (shrunk, CPU)."""

import numpy as np
import pytest

from qaray_tpu.renderer import Renderer, RendererParam
from qaray_tpu.scene.xml_parser import load_scene


def _render(inputs_dir, name, w=80, h=60, integrator="photonmap", spp=2,
            **kw):
    scene = load_scene(f"{inputs_dir}/{name}")
    scene.camera.img_width = w
    scene.camera.img_height = h
    p = RendererParam(spp_min=spp, spp_max=spp, integrator=integrator, **kw)
    r = Renderer(p)
    r.compute_scene(scene)
    return r.render()


def test_blinn_scene_photonmap(inputs_dir):
    fb = _render(inputs_dir, "example_project2_blinn.xml")
    img = fb.img.reshape(60, 80, 3).astype(np.float32)
    # Scene covers ~1/3 of the frame; background is black.
    coverage = (img.sum(axis=-1) > 0).mean()
    assert 0.2 < coverage < 0.7
    # Depth map must show hits in a plausible range.
    z = fb.zbuffer[fb.zbuffer < 1e29]
    assert z.size > 0 and 10 < z.min() < z.max() < 200
    assert np.isfinite(img).all()


def test_blinn_scene_pathtrace(inputs_dir):
    fb = _render(inputs_dir, "example_project2_blinn.xml", integrator="pathtrace")
    img = fb.img.reshape(60, 80, 3)
    assert (img.sum(axis=-1) > 0).mean() > 0.2
    assert np.isfinite(img).all()


def test_box_scene(inputs_dir):
    fb = _render(inputs_dir, "example_project3_box.xml")
    img = fb.img.reshape(60, 80, 3).astype(np.float32)
    # The ellipsoid walls cover most of the frame (corners see background).
    assert (img.sum(axis=-1) > 0).mean() > 0.8
    # Left wall is red-tinted, right wall blue-tinted in the box scene.
    left = img[:, :10].mean(axis=(0, 1))
    right = img[:, -10:].mean(axis=(0, 1))
    assert left[0] > left[2]
    assert right[2] > right[0]


def test_deterministic(inputs_dir):
    fb1 = _render(inputs_dir, "example_project2_blinn.xml", w=40, h=30)
    fb2 = _render(inputs_dir, "example_project2_blinn.xml", w=40, h=30)
    np.testing.assert_array_equal(fb1.img, fb2.img)


@pytest.mark.parametrize(
    "integrator,scene_name",
    [
        ("basic", "example_project2_blinn.xml"),
        ("phong", "example_project2_phong.xml"),
        ("mcgi", "example_project3_box.xml"),
        ("basic", "trc_mtl_glass.xml"),
        ("pathtrace", "trc_mtl_glossy.xml"),
    ],
)
def test_all_integrators_finite(inputs_dir, integrator, scene_name):
    fb = _render(inputs_dir, scene_name, w=60, h=45, integrator=integrator)
    img = fb.img.reshape(45, 60, 3)
    assert np.isfinite(img).all()
    assert img.sum() > 0


def test_adaptive_spp_counts(inputs_dir):
    scene = load_scene(f"{inputs_dir}/example_project2_blinn.xml")
    scene.camera.img_width = 40
    scene.camera.img_height = 30
    p = RendererParam(spp_min=2, spp_max=6)
    r = Renderer(p)
    r.compute_scene(scene)
    fb = r.render()
    assert fb.count.min() >= 2
    assert fb.count.max() <= 6
