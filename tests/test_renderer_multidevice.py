"""End-to-end Renderer over the 8-device CPU mesh + cooperative cancellation.

The reference's MPI renderer (Renderer_MPI.cpp:103-207) distributes tiles
over ranks and composites rank buffers; here the same render driven through
`Renderer(num_devices=8)` (adaptive compaction, checkpointing, packed
dispatches) must produce the image of the single-device renderer. Under
threefry RNG the samples are bit-stable per (pixel, sample) regardless of
batch layout or device count, so the comparison is exact.
"""

import os

import numpy as np
import pytest

from qaray_tpu.renderer import Renderer, RendererParam
from qaray_tpu.scene.xml_parser import load_scene


def _scene(inputs_dir):
    sd = load_scene(f"{inputs_dir}/example_project2_blinn.xml")
    sd.camera.img_width = 48
    sd.camera.img_height = 36
    return sd


def _param(**kw):
    kw.setdefault("spp_min", 2)
    kw.setdefault("spp_max", 4)
    kw.setdefault("max_bounce", 2)
    kw.setdefault("shadow_spp", 4)
    kw.setdefault("shadow_spp_max", 8)
    kw.setdefault("integrator", "pathtrace")
    kw.setdefault("rng_impl", "threefry2x32")
    return RendererParam(**kw)


@pytest.mark.quick
def test_renderer_8device_matches_single(inputs_dir):
    r1 = Renderer(_param())
    r1.compute_scene(_scene(inputs_dir))
    fb1 = r1.render()

    r8 = Renderer(_param(num_devices=8))
    r8.compute_scene(_scene(inputs_dir))
    fb8 = r8.render()

    assert np.array_equal(fb1.count, fb8.count), "adaptive spp counts differ"
    np.testing.assert_allclose(fb1.mean, fb8.mean, atol=1e-6)
    assert np.array_equal(fb1.img, fb8.img)


@pytest.mark.quick
def test_renderer_8device_cancel_checkpoint_resume(inputs_dir, tmp_path):
    """Cooperative stop between dispatches (reference signal_stop polled at
    renderer.cpp:402) on the 8-device mesh: batch_pixels pins one sample
    per dispatch, the callback stops the render after 2 spp, the
    checkpoint written at that round boundary resumes in a fresh renderer,
    and the resumed image equals an uninterrupted render exactly."""
    ckpt = str(tmp_path / "ck.npz")
    sd = _scene(inputs_dir)
    # 48*36 = 1728 pixels <= 2048 => pack == 1 => one sample per dispatch.
    r = Renderer(
        _param(
            spp_min=4, spp_max=4, num_devices=8, batch_pixels=2048,
            checkpoint_every=2, checkpoint_path=ckpt,
        )
    )
    r.compute_scene(sd)

    def cb(done, total):
        if done >= 2:
            r.signal_stop()

    r.set_progress_callback(cb)
    fb = r.render()
    got = int(fb.count.max())
    assert got == 2, f"expected cancellation at 2 spp, got {got}"
    assert fb.count.min() == fb.count.max(), "round boundary not respected"
    assert os.path.exists(ckpt)

    r2 = Renderer(_param(spp_min=4, spp_max=4, num_devices=8))
    r2.compute_scene(sd)
    r2.load_checkpoint(ckpt)
    assert int(r2.fb.count.min()) == 2
    fb_res = r2.render()

    r_ref = Renderer(_param(spp_min=4, spp_max=4))
    r_ref.compute_scene(sd)
    fb_ref = r_ref.render()
    np.testing.assert_allclose(fb_ref.mean, fb_res.mean, atol=1e-6)
    assert np.array_equal(fb_ref.count, fb_res.count)


def test_renderer_8device_photon_map(inputs_dir):
    """Photon-mapped render over the 8-device mesh == single device.

    Exercises the sharded dispatch with the photon-maps pytree replicated
    (the MPI analog: every rank loads the scene AND builds the same maps)
    and the device accumulator over sharded outputs."""
    sd = load_scene(f"{inputs_dir}/trc_mtl_glass.xml")
    sd.camera.img_width, sd.camera.img_height = 40, 30

    def param(**kw):
        return _param(
            integrator="photonmap", use_photon_map=True,
            photon_map_size=200, caustics_map_size=60,
            photon_map_bounce=6, caustics_map_bounce=6,
            spp_min=2, spp_max=2, **kw,
        )

    r1 = Renderer(param())
    r1.compute_scene(sd)
    fb1 = r1.render()

    r8 = Renderer(param(num_devices=8, batch_pixels=512))
    r8.compute_scene(sd)
    fb8 = r8.render()

    assert np.isfinite(fb8.mean).all()
    np.testing.assert_allclose(fb1.mean, fb8.mean, atol=1e-5)
    assert np.array_equal(fb1.count, fb8.count)
