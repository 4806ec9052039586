#!/usr/bin/env python3
"""Goldens for spot lights, DoF, and soft shadows — features the
asset-complete reference scenes don't cover. Synthesized scenes with no
external assets; rendered by the reference build at /tmp/qref/qaray."""

import os
import shutil
import subprocess
import tempfile

SPOT_SCENE = """<xml>
  <scene>
    <object type="plane" name="floor" material="mat">
      <scale value="40"/>
    </object>
    <object type="sphere" name="ball" material="mat2">
      <scale value="4"/>
      <translate x="0" y="0" z="4"/>
    </object>
    <material type="blinn" name="mat">
      <diffuse value="0.8"/>
      <specular value="0"/>
    </material>
    <material type="blinn" name="mat2">
      <diffuse r="0.2" g="0.6" b="0.9"/>
      <specular value="0.5"/>
      <glossiness value="30"/>
    </material>
    <light type="spot" name="spot1">
      <intensity value="400"/>
      <position x="0" y="0" z="25"/>
      <rotation x="1" angle="0"/>
      <angle value="60"/>
      <blend value="0.4"/>
    </light>
    <light type="ambient" name="amb">
      <intensity value="0.05"/>
    </light>
  </scene>
  <camera>
    <position x="0" y="-40" z="12"/>
    <target x="0" y="0" z="3"/>
    <up x="0" y="0" z="1"/>
    <fov value="45"/>
    <width value="200"/>
    <height value="150"/>
  </camera>
</xml>
"""

# Soft shadows: point light with size > 0.01 (adaptive 16..64 shadow rays in
# the reference; fixed 16 here) + DoF camera.
SOFT_DOF_SCENE = """<xml>
  <scene>
    <object type="plane" name="floor" material="mat">
      <scale value="60"/>
    </object>
    <object type="sphere" name="near" material="mat2">
      <scale value="3"/>
      <translate x="-5" y="-12" z="3"/>
    </object>
    <object type="sphere" name="mid" material="mat2">
      <scale value="3"/>
      <translate x="0" y="0" z="3"/>
    </object>
    <object type="sphere" name="far" material="mat2">
      <scale value="3"/>
      <translate x="6" y="14" z="3"/>
    </object>
    <material type="blinn" name="mat">
      <diffuse value="0.75"/>
      <specular value="0"/>
    </material>
    <material type="blinn" name="mat2">
      <diffuse r="0.85" g="0.3" b="0.25"/>
      <specular value="0.6"/>
      <glossiness value="25"/>
    </material>
    <light type="point" name="area">
      <intensity value="900"/>
      <position x="10" y="-8" z="28"/>
      <size value="3"/>
    </light>
    <light type="ambient" name="amb">
      <intensity value="0.08"/>
    </light>
  </scene>
  <camera>
    <position x="0" y="-35" z="8"/>
    <target x="0" y="0" z="3"/>
    <up x="0" y="0" z="1"/>
    <fov value="40"/>
    <focaldist value="35"/>
    <dof value="0.8"/>
    <width value="200"/>
    <height value="150"/>
  </camera>
</xml>
"""


def make(name: str, xml: str, spp: int):
    assets = "tests/assets"
    os.makedirs(assets, exist_ok=True)
    xml_path = os.path.join(assets, name)
    open(xml_path, "w").write(xml)
    binary = "/tmp/qref/qaray"
    if not os.path.exists(binary):
        print("reference binary missing; golden skipped")
        return
    with tempfile.TemporaryDirectory() as td:
        shutil.copy(xml_path, td)
        subprocess.run(
            [binary, name, "-batch", "-spp", str(spp)],
            cwd=td, check=True, capture_output=True,
        )
        os.makedirs("tests/goldens", exist_ok=True)
        out = f"tests/goldens/{name.replace('.xml', '')}_{spp}spp.png"
        shutil.copy(os.path.join(td, "colorBuffer.png"), out)
        print(f"golden: {out}")


def main():
    make("spot_scene.xml", SPOT_SCENE, 16)
    make("softdof_scene.xml", SOFT_DOF_SCENE, 32)


if __name__ == "__main__":
    main()
