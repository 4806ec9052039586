"""Checkpoint/resume: an interrupted render resumed from disk must produce
bitwise-identical accumulation to an uninterrupted one.

Exactness requires the threefry RNG: the default `rbg` impl is faster but
its draws depend on the dispatch batch layout (statistically fine, not
bitwise stable across layouts — see RendererParam.rng_impl)."""

import os
import tempfile

import numpy as np

from qaray_tpu.renderer import Renderer, RendererParam
from qaray_tpu.scene.xml_parser import load_scene


def _scene(inputs_dir):
    scene = load_scene(f"{inputs_dir}/example_project2_blinn.xml")
    scene.camera.img_width = 40
    scene.camera.img_height = 30
    return scene


def test_resume_matches_uninterrupted(inputs_dir):
    # Full 4-spp render.
    r_full = Renderer(RendererParam(spp_min=4, spp_max=4, rng_impl="threefry2x32"))
    r_full.compute_scene(_scene(inputs_dir))
    fb_full = r_full.render()

    with tempfile.TemporaryDirectory() as td:
        ckpt = os.path.join(td, "ck.npz")
        # Render only 2 spp, checkpoint, then resume to 4.
        # batch_pixels=1200 forces one sample per dispatch so the 2-spp
        # checkpoint lands on a round boundary.
        r_a = Renderer(RendererParam(spp_min=2, spp_max=2, batch_pixels=1200, rng_impl="threefry2x32"))
        r_a.compute_scene(_scene(inputs_dir))
        r_a.render()
        r_a.fb.save_state(ckpt)

        r_b = Renderer(RendererParam(spp_min=4, spp_max=4, batch_pixels=1200, rng_impl="threefry2x32"))
        r_b.compute_scene(_scene(inputs_dir))
        r_b.load_checkpoint(ckpt)
        fb_resumed = r_b.render()

    np.testing.assert_allclose(fb_resumed.mean, fb_full.mean, atol=1e-6)
    np.testing.assert_array_equal(fb_resumed.count, fb_full.count)
