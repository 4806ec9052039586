"""Scenes referencing missing OBJ/texture assets render the remaining
geometry (reference behavior: error printed, node left empty —
xmlload.cpp:226-227). The reference repo ships none of the trc2017/teapot
assets, so trc_scene_simple is the natural end-to-end case."""

import numpy as np

from qaray_tpu.renderer import Renderer, RendererParam
from qaray_tpu.scene.xml_parser import load_scene


def test_trc_scene_simple_renders_partial(inputs_dir, capsys):
    scene = load_scene(f"{inputs_dir}/trc_scene_simple.xml")
    err = capsys.readouterr().err
    assert "Cannot load file" in err  # missing OBJ assets reported
    scene.camera.img_width = 60
    scene.camera.img_height = 45
    r = Renderer(RendererParam(spp_min=1, spp_max=1))
    r.compute_scene(scene)
    fb = r.render()
    img = fb.img.reshape(45, 60, 3)
    assert np.isfinite(img).all()
    # The analytic geometry that did load still renders.
    assert img.sum() > 0
