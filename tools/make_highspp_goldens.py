#!/usr/bin/env python3
"""High-spp reference renders for statistical parity (BASELINE.md bar).

Renders three scenes with the patched reference build (/tmp/qref/qaray,
see tools/build_reference.sh) at >=256 spp and 200x150. `-spp N` pins
sppMin == sppMax (main.cpp:21-24) so adaptive sampling is off and both
renderers integrate exactly N samples per pixel; at these sample counts the
MC noise floor is low enough that a per-pixel mean-abs diff <= 0.005 in
sRGB space is a meaningful estimator-parity bar
(tests/test_golden.py::TestHighSppParity consumes these).

Run: python tools/make_highspp_goldens.py  (takes tens of minutes on CPU)
"""

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(__file__))
from make_goldens import INPUTS, resize_scene  # noqa: E402

SCENES = [
    ("example_project3_box.xml", 1024, 200, 150),
    ("trc_mtl_glass.xml", 512, 200, 150),
    ("trc_scene_xmas.xml", 256, 200, 150),
]


def main():
    binary = sys.argv[1] if len(sys.argv) > 1 else "/tmp/qref/qaray"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "tests/goldens"
    os.makedirs(out_dir, exist_ok=True)
    for scene, spp, w, h in SCENES:
        name = scene.replace(".xml", f"_{spp}spp.png")
        if os.path.exists(os.path.join(out_dir, name)):
            print(f"skip (exists): {name}")
            continue
        with tempfile.TemporaryDirectory() as td:
            xml = os.path.join(td, scene)
            resize_scene(os.path.join(INPUTS, scene), xml, w, h)
            subprocess.run(
                [binary, xml, "-batch", "-spp", str(spp)],
                cwd=td,
                check=True,
                capture_output=True,
            )
            os.replace(
                os.path.join(td, "colorBuffer.png"), os.path.join(out_dir, name)
            )
            print(f"golden: {name}", flush=True)


if __name__ == "__main__":
    main()
