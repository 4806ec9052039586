"""XML dialect parsing against known facts of the reference inputs."""

import numpy as np
import pytest

from qaray_tpu.scene.xml_parser import load_scene

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def blinn(inputs_dir):
    return load_scene(f"{inputs_dir}/example_project2_blinn.xml")


def test_camera(blinn):
    cam = blinn.camera
    np.testing.assert_allclose(cam.pos, [0, 0, 10])
    d = np.array([0, 50, 0]) - np.array([0, 0, 10])
    np.testing.assert_allclose(cam.dir, d / np.linalg.norm(d), atol=1e-6)
    assert cam.fovy == 40
    assert (cam.img_width, cam.img_height) == (800, 600)
    # up is re-orthogonalized against dir (xmlload.cpp:140-144)
    assert abs(np.dot(cam.up, cam.dir)) < 1e-6


def test_materials(blinn):
    m1 = blinn.find_material("mtl1")
    np.testing.assert_allclose(m1.diffuse.color, [0.8, 0.2, 0.2])
    # specular has value=0.7 multiplier
    np.testing.assert_allclose(m1.specular.color, [0.7, 0.7, 0.7])
    assert m1.glossiness == 20


def test_lights(blinn):
    kinds = [l.kind for l in blinn.lights]
    assert kinds == ["ambient", "direct", "point"]
    amb = blinn.lights[0]
    np.testing.assert_allclose(amb.intensity, [0.1, 0.1, 0.1])
    direct = blinn.lights[1]
    d = np.array([1, 0.5, -1.0])
    np.testing.assert_allclose(direct.direction, d / np.linalg.norm(d), atol=1e-6)


def test_node_tree(blinn):
    root = blinn.root
    assert len(root.children) == 2
    s2 = root.children[1]
    assert s2.obj_type == "sphere"
    assert len(s2.children) == 1  # nested sphere3
    # scale value=8 uniform
    np.testing.assert_allclose(np.diag(s2.xform.m @ s2.xform.m.T) ** 0.5,
                               [8, 8, 8], atol=1e-5)


def test_transform_composition_order(blinn):
    """sphere1: scale(25,25,3) then translate(0,50,0)."""
    s1 = blinn.root.children[0]
    p_local = np.array([1.0, 0.0, 1.0])
    p_world = s1.xform.m @ p_local + s1.xform.t
    np.testing.assert_allclose(p_world, [25, 50, 3], atol=1e-5)


def test_all_reference_scenes_parse(inputs_dir):
    """Every scene in the reference corpus parses without raising."""
    import glob
    import os

    for f in sorted(glob.glob(os.path.join(inputs_dir, "*.xml"))):
        scene = load_scene(f)
        assert scene.camera.img_width > 0
