"""Interactive preview server (qaray_tpu/viz/serve.py) — the GUI viewport
replacement: live frames, status, probe, restart, camera orbit."""

import json
import time
import urllib.request

import numpy as np
import pytest

from qaray_tpu.renderer import Renderer, RendererParam
from qaray_tpu.scene.xml_parser import load_scene
from qaray_tpu.viz.serve import RenderServer


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=30) as r:
        return r.status, r.read()


@pytest.mark.quick
def test_serve_lifecycle(tmp_path):
    scene = load_scene("/root/reference/inputs/example_project2_blinn.xml")
    scene.camera.img_width, scene.camera.img_height = 64, 48
    r = Renderer(RendererParam(spp_min=2, spp_max=2, max_bounce=2))
    srv = RenderServer(r, scene, port=0).serve(block=False)
    try:
        # wait for the first frame
        deadline = time.time() + 120
        while time.time() < deadline:
            st = json.loads(_get(srv.port, "/status")[1])
            if not st["rendering"] and st["spp"] >= 2:
                break
            time.sleep(0.3)
        assert st["spp"] >= 2 and not st["rendering"], st

        code, body = _get(srv.port, "/image.png")
        assert code == 200 and body[:4] == b"\x89PNG"
        first = body
        code, page = _get(srv.port, "/")
        assert b"preview" in page
        code, z = _get(srv.port, "/depth.png")
        assert z[:4] == b"\x89PNG"
        code, probe = _get(srv.port, "/probe?x=32&y=24")
        assert b"Color3c" in probe
        # Irradiance debug plane endpoint (GUI view mode 5).
        code, irr = _get(srv.port, "/irradiance.png")
        assert code == 200 and irr[:4] == b"\x89PNG"

        # orbit: camera moves -> re-render -> different image
        gen0 = st["generation"]
        _get(srv.port, "/orbit?dyaw=30")
        deadline = time.time() + 120
        while time.time() < deadline:
            st = json.loads(_get(srv.port, "/status")[1])
            if st["generation"] > gen0 and not st["rendering"] \
                    and st["spp"] >= 2:
                break
            time.sleep(0.3)
        code, body2 = _get(srv.port, "/image.png")
        assert body2 != first, "orbit did not change the image"
    finally:
        srv.shutdown()
