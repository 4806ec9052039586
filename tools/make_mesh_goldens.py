#!/usr/bin/env python3
"""Generate a mesh test scene (OBJ + XML) and its reference golden.

The reference repo ships no OBJ assets (only renderings), so mesh-path
parity needs synthetic geometry: an icosphere (smooth vertex normals +
tri BVH exercised) and a ground plane, lit like example_project2.

Writes tests/assets/{icosphere.obj, mesh_scene.xml} and, when the patched
reference build (/tmp/qref/qaray) exists, tests/goldens/mesh_scene_16spp.png.
"""

import os
import subprocess
import sys

import numpy as np


def icosphere(subdiv=2):
    t = (1.0 + 5**0.5) / 2.0
    verts = [
        (-1, t, 0), (1, t, 0), (-1, -t, 0), (1, -t, 0),
        (0, -1, t), (0, 1, t), (0, -1, -t), (0, 1, -t),
        (t, 0, -1), (t, 0, 1), (-t, 0, -1), (-t, 0, 1),
    ]
    faces = [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ]
    verts = [np.array(v, float) / np.linalg.norm(v) for v in verts]
    cache = {}

    def midpoint(i, j):
        key = (min(i, j), max(i, j))
        if key not in cache:
            m = verts[i] + verts[j]
            verts.append(m / np.linalg.norm(m))
            cache[key] = len(verts) - 1
        return cache[key]

    for _ in range(subdiv):
        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [(a, ab, ca), (ab, b, bc), (ca, bc, c), (ab, bc, ca)]
        faces = new_faces
    return np.array(verts), np.array(faces)


SCENE_XML = """<xml>
  <scene>
    <object type="obj" name="{obj}" material="mtl2">
      <scale value="8.0"/>
      <translate x="0" y="50" z="5.1"/>
    </object>
    <object type="sphere" name="ground" material="mtl1">
      <scale x="25" y="25" z="3"/>
      <translate x="0" y="50" z="0"/>
    </object>
    <material type="blinn" name="mtl1">
      <diffuse  r="0.8" g="0.2" b="0.2"/>
      <specular r="1.0" g="1.0" b="1.0" value="0.7"/>
      <glossiness value="20"/>
    </material>
    <material type="blinn" name="mtl2">
      <diffuse  r="0.1" g="0.1" b="0.9"/>
      <specular r="0.9" g="0.9" b="1.0" value="0.8"/>
      <glossiness value="10"/>
    </material>
    <light type="ambient" name="ambientLight">
      <intensity value="0.1"/>
    </light>
    <light type="direct" name="directionalLight">
      <intensity value="0.5"/>
      <direction x="1" y="0.5" z="-1"/>
    </light>
  </scene>
  <camera>
    <position x="0" y="0" z="10"/>
    <target x="0" y="50" z="0"/>
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
    v, f = icosphere(2)
    obj_path = os.path.join(assets, "icosphere.obj")
    # Normals are written explicitly: the reference's TriMesh::ComputeNormals
    # has a heap overrun when NF > NV (the normalize loop at
    # mesh/TriMesh.cpp:155-157 iterates faces over a vertex-sized array) and
    # segfaults on normal-less OBJs; real assets carry vn, so ship vn too.
    # For a unit icosphere the vertex normal equals the position.
    with open(obj_path, "w") as fh:
        for p in v:
            fh.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for p in v:
            fh.write(f"vn {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for a, b, c in f:
            fh.write(f"f {a + 1}//{a + 1} {b + 1}//{b + 1} {c + 1}//{c + 1}\n")
    xml_path = os.path.join(assets, "mesh_scene.xml")
    with open(xml_path, "w") as fh:
        fh.write(SCENE_XML.format(obj="icosphere.obj"))
    print(f"wrote {obj_path} ({len(f)} faces), {xml_path}")

    # NOTE: must be a -O0/Debug build of the reference. Its TriFace
    # assignment operator is missing `return *this` (mesh/TriMesh.h:58-67) —
    # UB that the face sort hits, crashing every multi-triangle mesh load in
    # optimized builds.
    binary = "/tmp/qref-dbg/qaray"
    if os.path.exists(binary):
        import tempfile, shutil

        with tempfile.TemporaryDirectory() as td:
            shutil.copy(obj_path, td)
            shutil.copy(xml_path, td)
            subprocess.run(
                [binary, "mesh_scene.xml", "-batch", "-spp", "16"],
                cwd=td, check=True, capture_output=True,
            )
            os.makedirs("tests/goldens", exist_ok=True)
            shutil.copy(
                os.path.join(td, "colorBuffer.png"),
                "tests/goldens/mesh_scene_16spp.png",
            )
            print("golden: tests/goldens/mesh_scene_16spp.png")
    else:
        print("reference binary missing; golden not generated", file=sys.stderr)


if __name__ == "__main__":
    main()
