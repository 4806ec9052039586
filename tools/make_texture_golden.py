#!/usr/bin/env python3
"""Golden for texture-footprint filtering: checkerboard ground plane at a
glancing angle (heavy minification at the horizon) + textured sphere.
Only procedural checkerboard is used — the reference repo ships no texture
image files. Writes tests/assets/texture_scene.xml + reference golden."""

import os
import shutil
import subprocess
import tempfile

SCENE = """<xml>
  <scene>
    <object type="plane" name="ground" material="floor">
      <scale value="80"/>
    </object>
    <object type="sphere" name="ball" material="ballmtl">
      <scale value="6"/>
      <translate x="0" y="20" z="6"/>
    </object>
    <material type="blinn" name="floor">
      <diffuse r="1" g="1" b="1" texture="checkerboard">
        <color1 r="0.1" g="0.1" b="0.1"/>
        <color2 r="0.9" g="0.9" b="0.9"/>
        <scale value="0.05"/>
      </diffuse>
      <specular value="0"/>
    </material>
    <material type="blinn" name="ballmtl">
      <diffuse r="1" g="1" b="1" texture="checkerboard">
        <color1 r="0.8" g="0.2" b="0.2"/>
        <color2 r="0.9" g="0.9" b="0.3"/>
        <scale value="0.1"/>
      </diffuse>
      <specular value="0.5"/>
      <glossiness value="20"/>
    </material>
    <light type="ambient" name="amb">
      <intensity value="0.2"/>
    </light>
    <light type="direct" name="sun">
      <intensity value="0.8"/>
      <direction x="0.3" y="0.4" z="-1"/>
    </light>
  </scene>
  <camera>
    <position x="0" y="-70" z="4"/>
    <target x="0" y="0" z="4"/>
    <up x="0" y="0" z="1"/>
    <fov value="40"/>
    <width value="200"/>
    <height value="150"/>
  </camera>
</xml>
"""


def main():
    assets = "tests/assets"
    os.makedirs(assets, exist_ok=True)
    xml_path = os.path.join(assets, "texture_scene.xml")
    open(xml_path, "w").write(SCENE)
    binary = "/tmp/qref/qaray"
    if not os.path.exists(binary):
        print("reference binary missing")
        return
    with tempfile.TemporaryDirectory() as td:
        shutil.copy(xml_path, td)
        subprocess.run(
            [binary, "texture_scene.xml", "-batch", "-spp", "16"],
            cwd=td, check=True, capture_output=True,
        )
        os.makedirs("tests/goldens", exist_ok=True)
        shutil.copy(
            os.path.join(td, "colorBuffer.png"),
            "tests/goldens/texture_scene_16spp.png",
        )
        print("golden: tests/goldens/texture_scene_16spp.png")


if __name__ == "__main__":
    main()
