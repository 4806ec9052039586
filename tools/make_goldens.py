#!/usr/bin/env python3
"""Generate golden images with the reference C++ renderer for parity tests.

Usage: python tools/make_goldens.py [qaray_binary] [out_dir]

The reference build (patched copy: the upstream tree has two compile bugs in
the non-MPI path — `renderImage->` member access and a missing <memory>
include) is expected at /tmp/qref/qaray; see tests/test_golden.py for how
these images are consumed. Scenes are rendered at reduced resolution with a
fixed spp so CPU render time stays in seconds.
"""

import os
import re
import subprocess
import sys
import tempfile

SCENES = [
    # (scene, spp, width, height)
    ("example_project2_blinn.xml", 16, 200, 150),
    # example_project2_phong.xml: the reference SEGFAULTS on it — its parser
    # only knows type="blinn" (xmlload.cpp:337), leaving nodes with a null
    # material that Shade() then dereferences. No golden possible.
    ("example_project3_box.xml", 16, 200, 150),
    ("example_project3_sphere.xml", 16, 200, 150),
    ("example_project4.xml", 16, 200, 150),
    ("trc_mtl_glass.xml", 32, 200, 150),
    ("trc_mtl_glossy.xml", 32, 200, 150),
    ("trc_mtl_coffee.xml", 32, 200, 150),
    # Full-coverage sweep: every remaining inputs/ scene. OBJ meshes are
    # missing upstream (assets/ ships only renderings), so both renderers
    # skip them identically and the goldens exercise the remaining
    # spheres/planes/lights/materials of each scene.
    ("example_project5_low.xml", 16, 200, 150),
    ("example_project5_high.xml", 16, 200, 150),
    ("example_project6.xml", 16, 200, 150),
    ("example_project7_checkboard.xml", 16, 200, 150),
    ("example_project7_object.xml", 16, 200, 150),
    ("example_project9.xml", 32, 200, 150),
    ("example_project10_banana.xml", 16, 200, 150),
    ("example_project10_objects.xml", 16, 200, 150),
    ("example_project10_test.xml", 16, 200, 150),
    ("example_project11_box.xml", 32, 200, 150),
    ("example_project11_caustics.xml", 32, 200, 150),
    ("example_project11_teapot.xml", 32, 200, 150),
    ("example_project12_box.xml", 32, 200, 150),
    ("example_project12_caustics_glossy.xml", 32, 200, 150),
    ("example_project12_caustics_perfect.xml", 32, 200, 150),
    ("example_project12_example.xml", 32, 200, 150),
    ("example_project13_example.xml", 32, 200, 150),
    ("trc_scene_xmas.xml", 16, 200, 150),
]

INPUTS = "/root/reference/inputs"


def resize_scene(src_path: str, dst_path: str, w: int, h: int):
    xml = open(src_path).read()
    xml = re.sub(r'<width\s+value="\d+"\s*/>', f'<width value="{w}"/>', xml)
    xml = re.sub(r'<height\s+value="\d+"\s*/>', f'<height value="{h}"/>', xml)
    open(dst_path, "w").write(xml)


def main():
    binary = sys.argv[1] if len(sys.argv) > 1 else "/tmp/qref/qaray"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "tests/goldens"
    os.makedirs(out_dir, exist_ok=True)
    for scene, spp, w, h in SCENES:
        with tempfile.TemporaryDirectory() as td:
            xml = os.path.join(td, scene)
            resize_scene(os.path.join(INPUTS, scene), xml, w, h)
            subprocess.run(
                [binary, xml, "-batch", "-spp", str(spp)],
                cwd=td,
                check=True,
                capture_output=True,
            )
            name = scene.replace(".xml", f"_{spp}spp.png")
            os.replace(
                os.path.join(td, "colorBuffer.png"), os.path.join(out_dir, name)
            )
            print(f"golden: {name}")


if __name__ == "__main__":
    main()
