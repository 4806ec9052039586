"""World-space merged BVH (scene/compiler.py:_build_world_mesh_arrays) vs the
per-instance object-space loop: same images, same hit records.

The world mode bakes every mesh instance's triangles to world space at
compile time and traces ONE tree; the fallback mode transforms rays per
instance (the literal translation of the reference's node walk,
scene/scene.cpp:50-76). Both must agree: on identity-transform scenes
bitwise, on transformed instances up to FP reassociation (the MC estimator
consumes identical random streams, so disagreement is confined to lanes
where a floating-point comparison flips).
"""

import numpy as np
import pytest

from qaray_tpu.renderer import Renderer, RendererParam
from qaray_tpu.scene.compiler import compile_scene
from qaray_tpu.scene.xml_parser import load_scene

ASSETS = __file__.rsplit("/", 1)[0] + "/assets"


def _render(scene_file, world):
    scene = load_scene(f"{ASSETS}/{scene_file}")
    scene.camera.img_width = 80
    scene.camera.img_height = 60
    p = RendererParam(spp_min=4, spp_max=4, integrator="photonmap")
    r = Renderer(p)
    r.compute_scene(scene, world_bvh=world)
    return np.asarray(r.render().img, np.float32) / 255.0


def test_world_bvh_compile_modes():
    scene = load_scene(f"{ASSETS}/grid_scene.xml")
    aw, mw = compile_scene(scene, world_bvh=True)
    ao, mo = compile_scene(scene, world_bvh=False)
    assert mw.world_bvh and not mo.world_bvh
    assert mw.num_mesh_instances == 1
    assert mo.num_mesh_instances == 25
    # Duplicated per instance: 25 x 320 icosphere faces.
    assert mw.num_tris == 25 * mo.num_tris
    # Identity instance transform in world mode.
    assert np.allclose(np.asarray(aw.instances.m_w2o[0]), np.eye(3))


def test_world_bvh_image_parity_identity():
    """mesh_scene has near-identity instancing: images must match bitwise."""
    a = _render("mesh_scene.xml", True)
    b = _render("mesh_scene.xml", False)
    assert np.array_equal(a, b)


def test_world_bvh_image_parity_transformed():
    """25 scaled+translated instances: agreement up to FP-flip lanes."""
    a = _render("grid_scene.xml", True)
    b = _render("grid_scene.xml", False)
    # Identical RNG streams => all but a vanishing fraction of pixels equal.
    frac_diff = (np.abs(a - b).max(axis=-1) > 2 / 255.0).mean()
    assert frac_diff < 0.005, f"{frac_diff:.4%} of pixels differ"


def test_world_bvh_mirror_instance():
    """Negative-determinant instancing flips winding; the compile-time corner
    swap must keep front-face classification (and thus shading) unchanged."""
    import textwrap

    xml = textwrap.dedent(
        """\
        <xml><scene>
        <object type="obj" name="icosphere.obj" material="m">
          <scale x="-1" y="1" z="1"/>
        </object>
        <material type="blinn" name="m"><diffuse r="0.7" g="0.3" b="0.2"/></material>
        <light type="point" name="l"><intensity value="40"/><position x="3" y="-4" z="6"/></light>
        </scene>
        <camera><position x="0" y="-6" z="0"/><target x="0" y="0" z="0"/>
        <up x="0" y="0" z="1"/><fov value="40"/>
        <width value="64"/><height value="48"/></camera></xml>
        """
    )
    path = f"{ASSETS}/mirror_scene.xml"
    with open(path, "w") as f:
        f.write(xml)
    a = _render("mirror_scene.xml", True)
    b = _render("mirror_scene.xml", False)
    frac_diff = (np.abs(a - b).max(axis=-1) > 2 / 255.0).mean()
    assert frac_diff < 0.005, f"{frac_diff:.4%} of pixels differ"
    # And the object must actually be visible (front faces preserved).
    assert a.mean() > 0.01
