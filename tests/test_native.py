"""Native C++ host library vs the pure-python fallbacks."""

import os
import tempfile

import numpy as np
import pytest

from qaray_tpu import native
from qaray_tpu.scene import bvh as bvh_mod

pytestmark = [
    pytest.mark.quick,
    pytest.mark.skipif(not native.available(), reason="native library unavailable"),
]


def _soup(n, seed=0):
    rs = np.random.RandomState(seed)
    c = rs.uniform(-2, 2, (n, 1, 3))
    return (c + rs.uniform(-0.3, 0.3, (n, 3, 3))).astype(np.float32)


@pytest.mark.parametrize("method", ["mean", "sah"])
def test_bvh_native_matches_numpy(method):
    tri = _soup(500)
    a = bvh_mod.build_bvh(tri, use_native=True, method=method)
    b = (
        bvh_mod._build_bvh_sah_numpy(tri)
        if method == "sah"
        else bvh_mod._build_bvh_numpy(tri)
    )
    np.testing.assert_array_equal(a.left, b.left)
    np.testing.assert_array_equal(a.right, b.right)
    np.testing.assert_array_equal(a.count, b.count)
    np.testing.assert_array_equal(a.elems, b.elems)
    np.testing.assert_allclose(a.bounds, b.bounds, rtol=1e-6)


def test_bvh_native_empty():
    a = bvh_mod.build_bvh(np.zeros((0, 3, 3), np.float32))
    assert a.left[0] == -1 and a.count[0] == 0


def test_png_native_roundtrip():
    img = (np.random.RandomState(0).rand(33, 47, 3) * 255).astype(np.uint8)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "t.png")
        assert native.png_write_native(path, img)
        from PIL import Image

        back = np.asarray(Image.open(path).convert("RGB"))
        np.testing.assert_array_equal(back, img)


def test_png_native_grey():
    img = (np.random.RandomState(1).rand(20, 21) * 255).astype(np.uint8)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "g.png")
        assert native.png_write_native(path, img)
        from PIL import Image

        back = np.asarray(Image.open(path).convert("L"))
        np.testing.assert_array_equal(back, img)


def test_obj_native_matches_python():
    obj_path = os.path.join(
        os.path.dirname(__file__), "assets", "icosphere.obj"
    )
    out = native.obj_load_native(obj_path)
    assert out is not None
    v, vn, vt, f_v, f_vt, f_vn = out
    from qaray_tpu.scene.obj_loader import load_obj

    mesh = load_obj(obj_path)
    np.testing.assert_allclose(v, mesh.vertices, rtol=1e-6)
    np.testing.assert_array_equal(f_v, mesh.faces)
    np.testing.assert_allclose(vn, mesh.normals, rtol=1e-6)
