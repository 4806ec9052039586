"""qaray XML scene-dialect parser.

Parses the exact dialect of the reference's parser (parser/xmlload.cpp) with
`xml.etree` so every `inputs/*.xml` scene runs unmodified, including its
quirks:

- `<camera>` target handling: dir defaults to (0,0,-1), `target` is absolute
  and converted to a direction after parsing (xmlload.cpp:115-144),
- value-multiplier convention on vectors/colors (`value` attribute scales the
  component-wise value, xmlload.cpp:527-561),
- transforms applied in document order, composing left-multiplied
  (xmlload.cpp:293-320, core/transform.h:62-75),
- deferred material binding by name (xmlload.cpp:107-113),
- OBJ nodes auto-synthesizing a MultiMtl from .mtl files when no material
  attribute is present (xmlload.cpp:232-273),
- `checkerboard` procedural texture special-case and texture dedup by name
  (xmlload.cpp:575-630).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

import numpy as np

from qaray_tpu.scene import desc as D
from qaray_tpu.scene.obj_loader import load_obj


import re

_FLOAT_RE = re.compile(r"^\s*[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)?")


def _to_float(text: str, default: float) -> float:
    """Leading-float parse, like tinyxml's QueryDoubleAttribute (C strtod):
    trailing garbage such as the 'f' in "0.01f" is ignored."""
    m = _FLOAT_RE.match(text)
    return float(m.group(0)) if m else default


def _read_float(elem, default: float, name: str = "value") -> float:
    v = elem.get(name)
    return _to_float(v, default) if v is not None else default


def _read_vector(elem, default) -> np.ndarray:
    v = np.array(
        [
            _to_float(str(elem.get("x", default[0])), default[0]),
            _to_float(str(elem.get("y", default[1])), default[1]),
            _to_float(str(elem.get("z", default[2])), default[2]),
        ]
    )
    return v * _read_float(elem, 1.0)


def _read_color(elem, default) -> np.ndarray:
    c = np.array(
        [
            _to_float(str(elem.get("r", default[0])), default[0]),
            _to_float(str(elem.get("g", default[1])), default[1]),
            _to_float(str(elem.get("b", default[2])), default[2]),
        ]
    )
    return c * _read_float(elem, 1.0)


class SceneParser:
    def __init__(self, search_paths: Optional[List[str]] = None):
        self.search_paths = list(search_paths or [])
        self.textures: Dict[str, D.TextureDesc] = {}
        self.scene = D.SceneDesc()
        self.meshes: Dict[str, D.MeshDesc] = {}
        self._deferred_bindings: List[tuple] = []

    # -- resource resolution --------------------------------------------------

    def _resolve_path(self, name: str) -> Optional[str]:
        if os.path.isabs(name) and os.path.exists(name):
            return name
        for base in self.search_paths + [os.getcwd()]:
            p = os.path.join(base, name)
            if os.path.exists(p):
                return p
        return None

    # -- entry ----------------------------------------------------------------

    def parse(self, filename: str) -> D.SceneDesc:
        self.search_paths.insert(0, os.path.dirname(os.path.abspath(filename)))
        tree = ET.parse(filename)
        xml = tree.getroot()
        if xml.tag != "xml":
            raise ValueError(f'No "xml" tag found in {filename}')
        scene_elem = xml.find("scene")
        cam_elem = xml.find("camera")
        if scene_elem is None:
            raise ValueError('No "scene" tag found.')
        if cam_elem is None:
            raise ValueError('No "camera" tag found.')

        self._load_scene(scene_elem)

        # Deferred material binding by name (xmlload.cpp:107-113). Unknown
        # names leave the node unbound (rendered with the null material).
        for node, mtl_name in self._deferred_bindings:
            if self.scene.find_material(mtl_name) is not None:
                node.mtl_name = mtl_name
            else:
                node.mtl_name = None

        self._load_camera(cam_elem)
        self.scene.textures = list(self.textures.values())
        return self.scene

    # -- scene ----------------------------------------------------------------

    def _load_scene(self, elem):
        for child in elem:
            if child.tag == "background":
                c = _read_color(child, np.ones(3))
                self.scene.background = D.TexturedColor(c, self._read_texture_map(child))
            elif child.tag == "environment":
                c = _read_color(child, np.ones(3))
                self.scene.environment = D.TexturedColor(c, self._read_texture_map(child))
            elif child.tag == "object":
                self._load_node(self.scene.root, child)
            elif child.tag == "material":
                self._load_material(child)
            elif child.tag == "light":
                self._load_light(child)

    def _load_node(self, parent: D.NodeDesc, elem):
        node = D.NodeDesc(name=elem.get("name", ""))
        parent.children.append(node)

        mtl_name = elem.get("material")
        if mtl_name is not None:
            self._deferred_bindings.append((node, mtl_name))

        obj_type = elem.get("type")
        if obj_type == "sphere":
            node.obj_type = "sphere"
        elif obj_type == "plane":
            node.obj_type = "plane"
        elif obj_type == "obj":
            self._load_obj_node(node, mtl_name)

        for child in elem:
            if child.tag == "object":
                self._load_node(node, child)
        self._load_transform(node.xform, elem)
        return node

    def _load_obj_node(self, node: D.NodeDesc, mtl_name: Optional[str]):
        name = node.name
        mesh = self.meshes.get(name)
        if mesh is None:
            path = self._resolve_path(name)
            if path is None:
                # Reference prints an error and renders the node empty
                # (xmlload.cpp:226-227).
                import sys

                print(f'ERROR: Cannot load file "{name}".', file=sys.stderr)
                return
            mesh = load_obj(path, load_mtl_files=(mtl_name is None))
            self.meshes[name] = mesh
            # Auto MultiMtl synthesis from OBJ .mtl (xmlload.cpp:232-273).
            if mtl_name is None and mesh.obj_materials:
                if self.scene.find_material(name) is None:
                    mm = D.MaterialDesc(name=name, sub_materials=[])
                    for raw in mesh.obj_materials:
                        sub = D.MaterialDesc(name=f"{name}:{raw['name']}")
                        sub.diffuse = D.TexturedColor(np.array(raw["diffuse"]))
                        sub.specular = D.TexturedColor(np.array(raw["specular"]))
                        sub.glossiness = raw["shininess"]
                        sub.ior = raw["ior"]
                        if raw["diffuse_texname"]:
                            sub.diffuse.map = self._file_texture_map(
                                mesh.directory + raw["diffuse_texname"]
                            )
                        if raw["specular_texname"]:
                            # Reference quirk: specular texture is assigned to
                            # the diffuse slot (xmlload.cpp:249-252).
                            sub.diffuse.map = self._file_texture_map(
                                mesh.directory + raw["specular_texname"]
                            )
                        if 2 < raw["illum"] <= 7:
                            sub.reflection = D.TexturedColor(np.array(raw["specular"]))
                            if raw["specular_texname"]:
                                sub.reflection.map = self._file_texture_map(
                                    mesh.directory + raw["specular_texname"]
                                )
                            if raw["illum"] >= 6:
                                sub.refraction = D.TexturedColor(
                                    1.0 - np.array(raw["transmittance"])
                                )
                        mm.sub_materials.append(sub)
                    self.scene.materials.append(mm)
                    self._deferred_bindings.append((node, name))
        node.obj_type = "mesh"
        node.mesh = mesh

    def _load_transform(self, xform: D.Affine, elem):
        for child in elem:
            if child.tag == "scale":
                s = _read_vector(child, np.ones(3))
                xform.scale(s[0], s[1], s[2])
            elif child.tag == "rotate":
                axis = _read_vector(child, np.zeros(3))
                angle = _read_float(child, 0.0, "angle")
                xform.rotate(axis, angle)
            elif child.tag == "translate":
                xform.translate(_read_vector(child, np.zeros(3)))

    # -- materials ------------------------------------------------------------

    def _load_material(self, elem):
        # The reference only understands type="blinn" and SEGFAULTS on scenes
        # whose materials it skips (null-material deref; e.g.
        # example_project2_phong.xml). We accept "phong" with the same
        # parameter schema — the shading model is an integrator-level choice
        # here, not a material-type one.
        if elem.get("type") not in ("blinn", "phong"):
            return
        m = D.MaterialDesc(name=elem.get("name", ""))
        for child in elem:
            tag = child.tag
            if tag == "diffuse":
                m.diffuse = D.TexturedColor(
                    _read_color(child, np.ones(3)), self._read_texture_map(child)
                )
            elif tag == "specular":
                m.specular = D.TexturedColor(
                    _read_color(child, np.ones(3)), self._read_texture_map(child)
                )
            elif tag == "glossiness":
                m.glossiness = _read_float(child, 1.0)
            elif tag == "emission":
                m.emission = D.TexturedColor(
                    _read_color(child, np.ones(3)), self._read_texture_map(child)
                )
            elif tag == "reflection":
                m.reflection = D.TexturedColor(
                    _read_color(child, np.ones(3)), self._read_texture_map(child)
                )
                m.reflection_glossiness = _read_float(child, 0.0, "glossiness")
            elif tag == "refraction":
                m.refraction = D.TexturedColor(
                    _read_color(child, np.ones(3)), self._read_texture_map(child)
                )
                m.ior = _read_float(child, 1.0, "index")
                m.refraction_glossiness = _read_float(child, 0.0, "glossiness")
            elif tag == "absorption":
                m.absorption = _read_color(child, np.ones(3))
        self.scene.materials.append(m)

    # -- lights ---------------------------------------------------------------

    def _load_light(self, elem):
        kind = elem.get("type")
        if kind not in ("ambient", "direct", "point", "spot"):
            return
        light = D.LightDesc(kind=kind, name=elem.get("name", ""))
        if kind == "spot":
            # SpotLight ctor default (lights/lights.h:126); overwritten by a
            # <rotation> child if present.
            light.direction = np.array([1.0, 0.0, 0.0])
        for child in elem:
            tag = child.tag
            if tag == "intensity":
                light.intensity = _read_color(child, np.ones(3))
            elif tag == "direction":
                d = _read_vector(child, np.ones(3))
                light.direction = d / np.linalg.norm(d)
            elif tag == "position":
                light.position = _read_vector(child, np.zeros(3))
            elif tag == "size":
                light.size = _read_float(child, 0.0)
            elif tag == "rotation":
                # Spot light: rotate (0,0,-1) by angle around axis
                # (lights/lights.cpp:115-119).
                axis = _read_vector(child, np.zeros(3))
                angle = _read_float(child, 0.0, "angle")
                a = D.Affine()
                a.rotate(axis, angle)
                d = a.m @ np.array([0.0, 0.0, -1.0])
                light.direction = d / np.linalg.norm(d)
            elif tag == "angle":
                light.angle = _read_float(child, 45.0)
            elif tag == "blend":
                light.blend = _read_float(child, 1.0)
        self.scene.lights.append(light)

    # -- textures -------------------------------------------------------------

    def _read_texture_map(self, elem) -> Optional[D.TextureMapDesc]:
        tex_name = elem.get("texture")
        if tex_name is None:
            return None
        if tex_name == "checkerboard":
            tex = D.TextureDesc(name=tex_name, kind="checker")
            for child in elem:
                if child.tag == "color1":
                    tex.color1 = _read_color(child, np.zeros(3))
                elif child.tag == "color2":
                    tex.color2 = _read_color(child, np.zeros(3))
            self.textures[f"checker:{id(tex)}"] = tex
            tmap = D.TextureMapDesc(texture=tex)
        else:
            tmap = self._file_texture_map(tex_name)
            if tmap is None:
                return None
        self._load_transform(tmap.xform, elem)
        return tmap

    def _file_texture_map(self, tex_name: str) -> Optional[D.TextureMapDesc]:
        tex = self.textures.get(tex_name)
        if tex is None:
            path = self._resolve_path(tex_name)
            if path is None:
                import sys

                print(f'ERROR: Cannot load texture "{tex_name}".', file=sys.stderr)
                # The reference KEEPS a failed-to-load texture: TextureFile
                # with width+height==0 samples as (0,0,0)
                # (textures/texture.cpp:97-99), so TexturedColor::Sample
                # returns color*0 = black everywhere. kind='missing' lets the
                # compiler constant-fold that slot to black.
                tex = D.TextureDesc(name=tex_name, kind="missing")
            else:
                from qaray_tpu.scene.textures import load_image

                tex = D.TextureDesc(
                    name=tex_name, kind="file", image=load_image(path)
                )
            self.textures[tex_name] = tex
        return D.TextureMapDesc(texture=tex)

    # -- camera ---------------------------------------------------------------

    def _load_camera(self, elem):
        cam = D.CameraDesc()
        # Reference: dir += pos before parse; target read as absolute point.
        target = cam.pos + cam.dir
        for child in elem:
            tag = child.tag
            if tag == "position":
                cam.pos = _read_vector(child, cam.pos)
            elif tag == "target":
                target = _read_vector(child, target)
            elif tag == "up":
                cam.up = _read_vector(child, cam.up)
            elif tag == "fov":
                cam.fovy = _read_float(child, cam.fovy)
            elif tag == "focaldist":
                cam.focal_distance = _read_float(child, cam.focal_distance)
            elif tag == "dof":
                cam.depth_of_field = _read_float(child, cam.depth_of_field)
            elif tag == "width":
                cam.img_width = int(_read_float(child, cam.img_width))
            elif tag == "height":
                cam.img_height = int(_read_float(child, cam.img_height))
        d = target - cam.pos
        cam.dir = d / np.linalg.norm(d)
        x = np.cross(cam.dir, cam.up)
        up = np.cross(x, cam.dir)
        cam.up = up / np.linalg.norm(up)
        self.scene.camera = cam


def load_scene(filename: str, search_paths: Optional[List[str]] = None) -> D.SceneDesc:
    """Parse a qaray XML scene file into a host-side SceneDesc."""
    return SceneParser(search_paths).parse(filename)
