"""Scene compilation: host SceneDesc -> device SceneArrays.

The reference walks its node tree per ray, transforming rays level by level
(scene/scene.cpp:50-76). We instead bake each leaf object's composed affine
once at compile time, so at render time every primitive is one fused
transform + intersect with no tree walk. Node transform composition follows
Transformation semantics exactly (core/transform.h:36-79): p_obj =
M_w2o @ (p_world - t_o2w) with M_w2o = inv(M_o2w), and normals return
through M_w2o^T (VectorTransformFrom with the inverse matrix).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from qaray_tpu.scene import desc as D
from qaray_tpu.scene import bvh as bvh_mod
from qaray_tpu.scene.arrays import (
    KIND_PLANE,
    KIND_SPHERE,
    LIGHT_AMBIENT,
    LIGHT_DIRECT,
    LIGHT_POINT,
    LIGHT_SPOT,
    NUM_SLOTS,
    TEX_CHECKER,
    TEX_FILE,
    AnalyticPrims,
    CameraArrays,
    EnvColor,
    LightTable,
    MaterialTable,
    MeshArrays,
    MeshInstances,
    SceneArrays,
    SceneMeta,
    TextureAtlas,
)

_LIGHT_KIND = {
    "ambient": LIGHT_AMBIENT,
    "direct": LIGHT_DIRECT,
    "point": LIGHT_POINT,
    "spot": LIGHT_SPOT,
}


@dataclasses.dataclass
class _Builder:
    analytic_kind: list = dataclasses.field(default_factory=list)
    analytic_mtl: list = dataclasses.field(default_factory=list)
    analytic_m: list = dataclasses.field(default_factory=list)
    analytic_t: list = dataclasses.field(default_factory=list)

    inst_mesh: list = dataclasses.field(default_factory=list)
    inst_mtl: list = dataclasses.field(default_factory=list)
    inst_m: list = dataclasses.field(default_factory=list)
    inst_t: list = dataclasses.field(default_factory=list)
    inst_world: list = dataclasses.field(default_factory=list)  # (M_o2w, t)


class SceneCompiler:
    def __init__(
        self,
        scene: D.SceneDesc,
        max_leaf: int = 4,
        world_bvh: bool = True,
        world_bvh_max_tris: int = 8_000_000,
    ):
        self.scene = scene
        if not (1 <= max_leaf <= 7):
            raise ValueError(
                f"max_leaf={max_leaf} out of range: the packed-BVH leaf "
                "encoding holds counts in 3 bits (<= 7 triangles per leaf)"
            )
        self.max_leaf = max_leaf
        # World-space instance baking (one merged BVH, no per-instance loop);
        # falls back to per-mesh object-space BVHs when instancing would
        # duplicate more than world_bvh_max_tris triangles.
        import os

        self.world_bvh = world_bvh and not os.environ.get("QARAY_NO_WORLD_BVH")
        self.world_bvh_max_tris = world_bvh_max_tris
        self.mtl_index: Dict[int, int] = {}  # id(MaterialDesc) -> table index
        self.mtl_multi_base: Dict[int, Tuple[int, int]] = {}  # -> (base, count)
        self.materials: List[D.MaterialDesc] = []
        self.tex_index: Dict[int, int] = {}  # id(TextureDesc) -> atlas index
        self.textures: List[D.TextureDesc] = []
        self.mesh_cache: Dict[int, dict] = {}  # id(MeshDesc) -> mesh record
        self.has_mtl_textures = False  # set by _material_table

    # -- materials ------------------------------------------------------------

    def _intern_texture(self, tex: Optional[D.TextureDesc]) -> int:
        if tex is None:
            return -1
        key = id(tex)
        if key not in self.tex_index:
            self.tex_index[key] = len(self.textures)
            self.textures.append(tex)
        return self.tex_index[key]

    def _intern_material(self, mtl: Optional[D.MaterialDesc]) -> Tuple[int, int, int]:
        """Returns (single_mtl, multi_base, num_sub).

        single_mtl >= 0 for plain materials; for MultiMtl single_mtl == -1 and
        [multi_base, multi_base+num_sub) are the flattened sub-materials.
        """
        if mtl is None:
            mtl = _default_material()
        key = id(mtl)
        if mtl.sub_materials is not None:
            if key not in self.mtl_multi_base:
                base = len(self.materials)
                self.materials.extend(mtl.sub_materials)
                self.mtl_multi_base[key] = (base, len(mtl.sub_materials))
            base, count = self.mtl_multi_base[key]
            return -1, base, count
        if key not in self.mtl_index:
            self.mtl_index[key] = len(self.materials)
            self.materials.append(mtl)
        return self.mtl_index[key], 0, 0

    # -- node flattening ------------------------------------------------------

    def _flatten(self, node: D.NodeDesc, parent_affine: D.Affine, b: _Builder):
        world = parent_affine.compose(node.xform)
        if node.obj_type in ("sphere", "plane"):
            mtl = self.scene.find_material(node.mtl_name) if node.mtl_name else None
            single, _, _ = self._intern_material(mtl)
            b.analytic_kind.append(KIND_SPHERE if node.obj_type == "sphere" else KIND_PLANE)
            b.analytic_mtl.append(single)
            b.analytic_m.append(np.linalg.inv(world.m))
            b.analytic_t.append(world.t)
        elif node.obj_type == "mesh" and node.mesh is not None:
            mtl = self.scene.find_material(node.mtl_name) if node.mtl_name else None
            single, base, nsub = self._intern_material(mtl)
            b.inst_mesh.append((node.mesh, single, base, nsub))
            b.inst_m.append(np.linalg.inv(world.m))
            b.inst_t.append(world.t)
            b.inst_world.append((world.m, world.t))
        for child in node.children:
            self._flatten(child, world, b)

    # -- meshes ---------------------------------------------------------------

    def _build_mesh_arrays(self, meshes: List[D.MeshDesc]):
        """Concatenate unique meshes; return per-mesh (root, tri_offset)."""
        tri_v, tri_n, tri_uv, tri_has_uv, tri_mtl = [], [], [], [], []
        bvh_parts = []
        mesh_records = {}
        tri_offset = 0
        node_offset = 0
        max_depth = 1
        for mesh in meshes:
            key = id(mesh)
            if key in mesh_records:
                continue
            v, n, uv, has_uv, fm = self._mesh_face_data(mesh)

            bvh = bvh_mod.build_bvh(v, self.max_leaf)
            max_depth = max(max_depth, bvh_mod.bvh_depth(bvh))

            mesh_records[key] = {
                "root": node_offset,
                "bbox": np.concatenate([v.reshape(-1, 3).min(0), v.reshape(-1, 3).max(0)])
                if v.size
                else np.array([1, 1, 1, 0, 0, 0], np.float32),
            }
            tri_v.append(v.astype(np.float32))
            tri_n.append(n.astype(np.float32))
            tri_uv.append(uv.astype(np.float32))
            tri_has_uv.append(has_uv)
            tri_mtl.append(fm.astype(np.int32))

            # Offset BVH indices into the global arrays.
            is_leaf = bvh.left < 0
            left = np.where(is_leaf, -1, bvh.left + node_offset)
            right = np.where(is_leaf, bvh.right + tri_offset, bvh.right + node_offset)
            bvh_parts.append(
                (bvh.bounds, left, right, bvh.count, bvh.elems + tri_offset)
            )
            tri_offset += v.shape[0]
            node_offset += len(bvh.left)

        if tri_v:
            from qaray_tpu.ops.bvh_packed import pack_bvh

            all_v = np.concatenate(tri_v)
            g_bounds = np.concatenate([p[0] for p in bvh_parts])
            g_left = np.concatenate([p[1] for p in bvh_parts])
            g_right = np.concatenate([p[2] for p in bvh_parts])
            g_count = np.concatenate([p[3] for p in bvh_parts])
            g_elems = np.concatenate([p[4] for p in bvh_parts])
            pnodes, ltri, node_ref = pack_bvh(
                g_bounds, g_left, g_right, g_count, g_elems, all_v
            )
            for rec in mesh_records.values():
                rec["proot"] = int(node_ref[rec["root"]])
            mesh_arrays = MeshArrays(
                tri_v=jnp.asarray(all_v),
                tri_n=jnp.asarray(np.concatenate(tri_n)),
                tri_uv=jnp.asarray(np.concatenate(tri_uv)),
                tri_has_uv=jnp.asarray(np.concatenate(tri_has_uv)),
                tri_mtl=jnp.asarray(np.concatenate(tri_mtl)),
                bvh_bounds=jnp.asarray(g_bounds),
                bvh_left=jnp.asarray(g_left),
                bvh_right=jnp.asarray(g_right),
                bvh_count=jnp.asarray(g_count),
                bvh_elems=jnp.asarray(g_elems),
                pnodes=jnp.asarray(pnodes),
                ltri=jnp.asarray(ltri),
            )
        else:
            z3 = np.zeros((0, 3, 3), np.float32)
            mesh_arrays = MeshArrays(
                tri_v=jnp.asarray(z3),
                tri_n=jnp.asarray(z3),
                tri_uv=jnp.asarray(np.zeros((0, 3, 2), np.float32)),
                tri_has_uv=jnp.asarray(np.zeros((0,), bool)),
                tri_mtl=jnp.asarray(np.zeros((0,), np.int32)),
                bvh_bounds=jnp.asarray(np.zeros((1, 6), np.float32)),
                bvh_left=jnp.asarray(np.array([-1], np.int32)),
                bvh_right=jnp.asarray(np.array([0], np.int32)),
                bvh_count=jnp.asarray(np.array([0], np.int32)),
                bvh_elems=jnp.asarray(np.zeros((0,), np.int32)),
            )
        return mesh_arrays, mesh_records, max_depth

    def _mesh_face_data(self, mesh: D.MeshDesc):
        """Per-face object-space (v [F,3,3], n [F,3,3], uv [F,3,2],
        has_uv [F], face_mtl [F]) — shared by both BVH build modes."""
        v = mesh.vertices[mesh.faces]  # [F,3,3]
        if mesh.normals is not None and mesh.face_normals is not None:
            fn = np.where(mesh.face_normals < 0, 0, mesh.face_normals)
            n = mesh.normals[fn]
            flat = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
            flat = flat / np.maximum(
                np.linalg.norm(flat, axis=1, keepdims=True), 1e-20
            )
            missing = (mesh.face_normals < 0).any(axis=1)
            n = np.where(missing[:, None, None], flat[:, None, :], n)
        else:
            flat = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
            flat = flat / np.maximum(
                np.linalg.norm(flat, axis=1, keepdims=True), 1e-20
            )
            n = np.repeat(flat[:, None, :], 3, axis=1)
        if mesh.texcoords is not None and mesh.face_texcoords is not None:
            ft = np.where(mesh.face_texcoords < 0, 0, mesh.face_texcoords)
            uv = mesh.texcoords[ft]
            has_uv = ~(mesh.face_texcoords < 0).any(axis=1)
        else:
            uv = np.zeros((v.shape[0], 3, 2), np.float32)
            has_uv = np.zeros((v.shape[0],), bool)
        fm = (
            mesh.face_materials
            if mesh.face_materials is not None
            else -np.ones((v.shape[0],), np.int32)
        )
        return v, n, uv, has_uv, fm

    def _build_world_mesh_arrays(self, b: _Builder):
        """World-space instance baking: every mesh instance's triangles are
        transformed to world space at compile time and ONE merged BVH covers
        them all, so render-time tracing is a single traversal instead of a
        sequential per-instance loop (the reference walks its node tree per
        ray, scene/scene.cpp:50-76; per-instance loops were the literal
        translation — this is the TPU-native fusion of that walk).

        Equivalences preserved exactly:
        - `t` parametrization: the reference intersects in node space with an
          unnormalized transformed direction, so node-space t == world t
          (core/node.cpp:112-126); intersecting world-space triangles yields
          the same t.
        - shading normals: corner normals are pre-multiplied by M_w2o^T
          (Node::FromNodeCoords' inverse-transpose, core/transform.h:52-61)
          *unnormalized*; barycentric interpolation commutes with the linear
          map, and the final normalize matches normalize(M^T (Σ b_i n_i)).
        - front-face: mirror (negative-determinant) instances flip triangle
          winding; corners 1<->2 are swapped so the geometric normal keeps
          its object-space orientation.
        - materials: per-face sub-material ids are resolved to global table
          ids at compile time (instance override / MultiMtl base+clip,
          identical to the render-time resolution in ops/trace.py).

        Returns (MeshArrays, identity-instance arrays dict, bvh_depth).
        """
        wv_l, wn_l, uv_l, huv_l, mtl_l = [], [], [], [], []
        for i, (mesh, single, base, nsub) in enumerate(b.inst_mesh):
            v, n, uv, has_uv, fm = self._mesh_face_data(mesh)
            m_o2w, t = b.inst_world[i]
            m_w2o = b.inst_m[i]
            wv = v @ m_o2w.T + t
            wn = n @ m_w2o  # row form of M_w2o^T @ n, unnormalized
            if np.linalg.det(m_o2w) < 0.0:
                wv = wv[:, [0, 2, 1]]
                wn = wn[:, [0, 2, 1]]
                uv = uv[:, [0, 2, 1]]
            if single >= 0:
                mtl = np.full((v.shape[0],), single, np.int32)
            else:
                mtl = base + np.clip(fm, 0, max(nsub - 1, 0))
            wv_l.append(wv.astype(np.float32))
            wn_l.append(wn.astype(np.float32))
            uv_l.append(uv.astype(np.float32))
            huv_l.append(has_uv)
            mtl_l.append(mtl.astype(np.int32))

        wv = np.concatenate(wv_l)
        bvh = bvh_mod.build_bvh(wv, self.max_leaf)
        depth = bvh_mod.bvh_depth(bvh)
        from qaray_tpu.ops.bvh_packed import pack_bvh
        from qaray_tpu.ops.mesh_stream import build_stream

        pnodes, ltri, node_ref = pack_bvh(
            bvh.bounds, bvh.left, bvh.right, bvh.count, bvh.elems, wv
        )
        # Mesh-path arrays: flat dense sweep under the stream budget, tiled
        # packet-culled sweep above it (ops/mesh_tiles.py) — building only
        # the selected one keeps device memory to one coefficient set.
        tile_kw = {}
        if wv.shape[0] <= _stream_max_tris():
            stream = build_stream(wv)
            tile_kw["stream_coeff"] = stream.coeff
            tile_kw["stream_const"] = stream.const
            from qaray_tpu.ops.pallas_mesh import (
                PALLAS_MESH_MAX_TRIS,
                pack_coeff16,
            )

            if wv.shape[0] <= PALLAS_MESH_MAX_TRIS:
                tile_kw["stream_c16"] = jnp.asarray(
                    pack_coeff16(stream.coeff, stream.const)
                )
        else:
            from qaray_tpu.ops.mesh_tiles import build_tiles

            tiles = build_tiles(wv)
            tile_kw["tile_coeff"] = tiles.coeff
            tile_kw["tile_const"] = tiles.const
            tile_kw["tile_gid"] = tiles.gid
            tile_kw["tile_cbounds"] = tiles.cbounds
            from qaray_tpu.ops.pallas_tiles import pack_coeffT

            tile_kw["tile_c16T"] = jnp.asarray(
                pack_coeffT(tiles.coeff, tiles.const)
            )

        # Megakernel mesh tables: Morton-clustered coefficients + per-row
        # shading attributes, for scenes whose whole mesh fits VMEM
        # (ops/pallas_pathtrace.py). Built alongside whichever trace-level
        # path was selected above.
        wn_all = np.concatenate(wn_l) if wn_l else np.zeros((0, 3, 3))
        mtl_all = np.concatenate(mtl_l) if mtl_l else np.zeros(0, np.int32)
        self._mega_mtls = ()
        self._mega_stream = False
        if 0 < wv.shape[0] <= _mega_stream_max_tris():
            distinct = tuple(sorted(int(m) for m in np.unique(mtl_all)))
            if len(distinct) <= 8:
                from qaray_tpu.ops.pallas_pathtrace import build_mega_mesh

                c16, attr, cb = build_mega_mesh(wv, wn_all, mtl_all)
                if wv.shape[0] <= _mega_mesh_max_tris():
                    # Whole mesh resident in VMEM (fastest).
                    tile_kw["mega_c16"] = jnp.asarray(c16)
                    tile_kw["mega_attr"] = jnp.asarray(attr)
                else:
                    # Cluster-DMA streamed megakernel mesh: tables stay in
                    # HBM as [Fp/8, 128] slabs (8 rows of 16 cols per
                    # 128-lane row — the pack_coeffT shaping, the only HBM
                    # slices Mosaic can DMA), clusters copied into scratch
                    # on demand. Softens the 16k-triangle cliff to 64k.
                    tile_kw["mega_c16"] = jnp.asarray(
                        c16.reshape(-1, 128)
                    )
                    tile_kw["mega_attr"] = jnp.asarray(
                        attr.reshape(-1, 128)
                    )
                    self._mega_stream = True
                tile_kw["mega_cbounds"] = jnp.asarray(cb)
                self._mega_mtls = distinct
        mesh_arrays = MeshArrays(
            tri_v=jnp.asarray(wv),
            tri_n=jnp.asarray(np.concatenate(wn_l)),
            tri_uv=jnp.asarray(np.concatenate(uv_l)),
            tri_has_uv=jnp.asarray(np.concatenate(huv_l)),
            tri_mtl=jnp.asarray(np.concatenate(mtl_l)),
            bvh_bounds=jnp.asarray(bvh.bounds),
            bvh_left=jnp.asarray(bvh.left),
            bvh_right=jnp.asarray(bvh.right),
            bvh_count=jnp.asarray(bvh.count),
            bvh_elems=jnp.asarray(bvh.elems),
            pnodes=jnp.asarray(pnodes),
            ltri=jnp.asarray(ltri),
            **tile_kw,
        )
        bbox = (
            np.concatenate([wv.reshape(-1, 3).min(0), wv.reshape(-1, 3).max(0)])
            if wv.size
            else np.array([1, 1, 1, 0, 0, 0], np.float32)
        )
        ident = {
            "root": np.zeros(1, np.int32),
            "proot": np.asarray([node_ref[0]], np.int32),
            "mtl": -np.ones(1, np.int32),  # resolve via per-face table
            "mtl_base": np.zeros(1, np.int32),
            # tri_mtl already holds final ids; clip must keep them all.
            "num_sub_mtl": np.full(1, max(len(self.materials), 1), np.int32),
            "m_w2o": np.eye(3, dtype=np.float32)[None],
            "t_o2w": np.zeros((1, 3), np.float32),
            "obj_bbox": bbox.astype(np.float32)[None],
        }
        return mesh_arrays, ident, depth

    # -- tables ---------------------------------------------------------------

    def _material_table(self) -> MaterialTable:
        mats = self.materials or [_default_material()]
        m = len(mats)

        def col(get, shape=(3,)):
            return np.stack([np.broadcast_to(np.asarray(get(x), np.float32), shape) for x in mats])

        tex_id = -np.ones((m, NUM_SLOTS), np.int32)
        tex_m = np.broadcast_to(np.eye(3, dtype=np.float32), (m, NUM_SLOTS, 3, 3)).copy()
        tex_t = np.zeros((m, NUM_SLOTS, 3), np.float32)
        slots = ["diffuse", "specular", "emission", "reflection", "refraction"]
        # Slots whose texture failed to load sample as color*0 in the
        # reference (TextureFile::Sample with width+height==0,
        # textures/texture.cpp:97-99) — constant-folded here to a black color
        # with no texture, which is exact for every uv.
        black_slots = set()
        for i, mat in enumerate(mats):
            for s, slot in enumerate(slots):
                tc: D.TexturedColor = getattr(mat, slot)
                if tc.map is not None:
                    if tc.map.texture.kind == "missing":
                        black_slots.add((i, slot))
                        continue
                    tex_id[i, s] = self._intern_texture(tc.map.texture)
                    tex_m[i, s] = np.linalg.inv(tc.map.xform.m).astype(np.float32)
                    tex_t[i, s] = tc.map.xform.t.astype(np.float32)
        self.has_mtl_textures = bool((tex_id >= 0).any())

        def fold_black(name):
            def get(x):
                return getattr(x, name).color

            arr = col(get)
            for (i, slot) in black_slots:
                if slot == name:
                    arr[i] = 0.0
            return arr

        return MaterialTable(
            diffuse=jnp.asarray(fold_black("diffuse")),
            specular=jnp.asarray(fold_black("specular")),
            emission=jnp.asarray(fold_black("emission")),
            reflection=jnp.asarray(fold_black("reflection")),
            refraction=jnp.asarray(fold_black("refraction")),
            absorption=jnp.asarray(col(lambda x: x.absorption)),
            glossiness=jnp.asarray(col(lambda x: x.glossiness, ())),
            reflection_glossiness=jnp.asarray(
                col(lambda x: x.reflection_glossiness, ())
            ),
            refraction_glossiness=jnp.asarray(
                col(lambda x: x.refraction_glossiness, ())
            ),
            ior=jnp.asarray(col(lambda x: x.ior, ())),
            tex_id=jnp.asarray(tex_id),
            tex_m=jnp.asarray(tex_m),
            tex_t=jnp.asarray(tex_t),
        )

    _TEX_SLOTS = ("diffuse", "specular", "emission", "reflection",
                  "refraction")

    def _slot_live_tex(self, mat, slot) -> bool:
        tc = getattr(mat, slot)
        return tc.map is not None and tc.map.texture.kind != "missing"

    def _mega_tex_slots(self):
        """Which material slots carry any live texture (static, per scene)."""
        return tuple(
            any(self._slot_live_tex(m, s) for m in self.materials)
            for s in self._TEX_SLOTS
        )

    def _mega_tex_ok(self, b) -> bool:
        """May the megakernel texture this scene? True iff every live
        material texture is a procedural checker (pure in-kernel math; file
        textures need per-lane texel gathers Mosaic cannot vectorize) and
        no mega-mesh face material is textured (attr16 carries no UVs)."""
        if not self.has_mtl_textures:
            return False
        for m in self.materials:
            for s in self._TEX_SLOTS:
                tc = getattr(m, s)
                if tc.map is not None and tc.map.texture.kind not in (
                    "missing", "checker",
                ):
                    return False
        for row in getattr(self, "_mega_mtls", ()):
            m = self.materials[row]
            if any(self._slot_live_tex(m, s) for s in self._TEX_SLOTS):
                return False
        return True

    def _light_table(self) -> LightTable:
        lights = self.scene.lights
        n = max(len(lights), 1)
        kind = np.zeros(n, np.int32)
        intensity = np.zeros((n, 3), np.float32)
        position = np.zeros((n, 3), np.float32)
        direction = np.tile(np.array([0, 0, 1], np.float32), (n, 1))
        size = np.zeros(n, np.float32)
        inner = np.zeros(n, np.float32)
        outer = np.zeros(n, np.float32)
        for i, l in enumerate(lights):
            kind[i] = _LIGHT_KIND[l.kind]
            intensity[i] = l.intensity
            position[i] = l.position
            direction[i] = l.direction
            size[i] = l.size
            if l.kind == "spot":
                inner[i] = l.inner
                outer[i] = l.outer
        return LightTable(
            kind=jnp.asarray(kind),
            intensity=jnp.asarray(intensity),
            position=jnp.asarray(position),
            direction=jnp.asarray(direction),
            size=jnp.asarray(size),
            inner=jnp.asarray(inner),
            outer=jnp.asarray(outer),
        )

    def _texture_atlas(self) -> TextureAtlas:
        texels = [np.zeros((1, 3), np.float32)]
        offset, width, height, kind, c1, c2 = [], [], [], [], [], []
        cursor = 1
        for tex in self.textures:
            if tex.kind == "checker":
                offset.append(0)
                width.append(0)
                height.append(0)
                kind.append(TEX_CHECKER)
                c1.append(tex.color1)
                c2.append(tex.color2)
            else:
                img = tex.image
                h, w = img.shape[:2]
                texels.append(img.reshape(-1, 3).astype(np.float32))
                offset.append(cursor)
                width.append(w)
                height.append(h)
                kind.append(TEX_FILE)
                c1.append(np.zeros(3))
                c2.append(np.zeros(3))
                cursor += h * w
        k = max(len(self.textures), 1)
        pad = k - len(self.textures)
        return TextureAtlas(
            texels=jnp.asarray(np.concatenate(texels)),
            offset=jnp.asarray(np.array(offset + [0] * pad, np.int32)),
            width=jnp.asarray(np.array(width + [0] * pad, np.int32)),
            height=jnp.asarray(np.array(height + [0] * pad, np.int32)),
            kind=jnp.asarray(np.array(kind + [TEX_FILE] * pad, np.int32)),
            color1=jnp.asarray(
                np.stack(c1 + [np.zeros(3)] * pad).astype(np.float32)
            ),
            color2=jnp.asarray(
                np.stack(c2 + [np.zeros(3)] * pad).astype(np.float32)
            ),
        )

    def _env_color(self, tc: D.TexturedColor) -> EnvColor:
        color = np.asarray(tc.color, np.float32)
        if tc.map is not None and tc.map.texture.kind == "missing":
            # Failed texture load: the reference samples it as black, so the
            # background/environment is color*0 (see _material_table note).
            color = np.zeros(3, np.float32)
            tid, m, t = -1, np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        elif tc.map is not None:
            tid = self._intern_texture(tc.map.texture)
            m = np.linalg.inv(tc.map.xform.m).astype(np.float32)
            t = tc.map.xform.t.astype(np.float32)
        else:
            tid, m, t = -1, np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        return EnvColor(
            color=jnp.asarray(color),
            tex_id=jnp.asarray(np.int32(tid)),
            tex_m=jnp.asarray(m),
            tex_t=jnp.asarray(t),
        )

    def _camera_arrays(self) -> CameraArrays:
        """Screen basis; straight from reference renderer.cpp:76-91."""
        cam = self.scene.camera
        focal = cam.focal_distance
        aspect = cam.img_width / float(cam.img_height)
        screen_h = 2.0 * focal * np.tan(cam.fovy * np.pi / 2.0 / 180.0)
        screen_w = aspect * screen_h
        x = np.cross(cam.dir, cam.up)
        x = x / np.linalg.norm(x)
        y = np.cross(x, cam.dir)
        y = y / np.linalg.norm(y)
        z = -cam.dir / np.linalg.norm(cam.dir)
        screen_u = x * (screen_w / cam.img_width)
        screen_v = -y * (screen_h / cam.img_height)
        screen_a = cam.pos - z * focal + y * screen_h / 2.0 - x * screen_w / 2.0
        f32 = lambda a: jnp.asarray(np.asarray(a, np.float32))
        return CameraArrays(
            pos=f32(cam.pos),
            screen_a=f32(screen_a),
            screen_u=f32(screen_u),
            screen_v=f32(screen_v),
            screen_x=f32(x),
            screen_y=f32(y),
            dof=f32(cam.depth_of_field),
        )

    # -- driver ---------------------------------------------------------------

    def compile(self) -> Tuple[SceneArrays, SceneMeta]:
        b = _Builder()
        # Root node itself has identity transform; walk children.
        self._flatten_root(b)

        n_src_inst = len(b.inst_mesh)
        total_world_tris = sum(m.faces.shape[0] for m, *_ in b.inst_mesh)
        use_world = (
            self.world_bvh
            and n_src_inst > 0
            and total_world_tris <= self.world_bvh_max_tris
        )

        if use_world:
            mesh_arrays, ident, depth = self._build_world_mesh_arrays(b)
            n_inst = 1
            inst_root = ident["root"]
            inst_proot = ident["proot"]
            inst_mtl = ident["mtl"]
            inst_base = ident["mtl_base"]
            inst_nsub = ident["num_sub_mtl"]
            inst_bbox = ident["obj_bbox"]
            inst_m = ident["m_w2o"]
            inst_t = ident["t_o2w"]
        else:
            mesh_descs = [rec[0] for rec in b.inst_mesh]
            mesh_arrays, mesh_records, depth = self._build_mesh_arrays(mesh_descs)

            n_inst = n_src_inst
            inst_root = np.zeros(max(n_inst, 1), np.int32)
            inst_proot = np.zeros(max(n_inst, 1), np.int32)
            inst_mtl = -np.ones(max(n_inst, 1), np.int32)
            inst_base = np.zeros(max(n_inst, 1), np.int32)
            inst_nsub = np.zeros(max(n_inst, 1), np.int32)
            inst_bbox = np.zeros((max(n_inst, 1), 6), np.float32)
            for i, (mesh, single, base, nsub) in enumerate(b.inst_mesh):
                rec = mesh_records[id(mesh)]
                inst_root[i] = rec["root"]
                inst_proot[i] = rec.get("proot", 0)
                inst_mtl[i] = single
                inst_base[i] = base
                inst_nsub[i] = nsub
                inst_bbox[i] = rec["bbox"]
            inst_m = np.stack(b.inst_m).astype(np.float32) if n_inst else np.zeros((1, 3, 3), np.float32)
            inst_t = np.stack(b.inst_t).astype(np.float32) if n_inst else np.zeros((1, 3), np.float32)

        n_analytic = len(b.analytic_kind)
        if n_analytic:
            analytic = AnalyticPrims(
                kind=jnp.asarray(np.array(b.analytic_kind, np.int32)),
                mtl=jnp.asarray(np.array(b.analytic_mtl, np.int32)),
                m_w2o=jnp.asarray(np.stack(b.analytic_m).astype(np.float32)),
                t_o2w=jnp.asarray(np.stack(b.analytic_t).astype(np.float32)),
            )
        else:
            analytic = AnalyticPrims(
                kind=jnp.asarray(np.zeros(1, np.int32)),
                mtl=jnp.asarray(np.zeros(1, np.int32)),
                m_w2o=jnp.asarray(np.eye(3, dtype=np.float32)[None]),
                t_o2w=jnp.asarray(np.zeros((1, 3), np.float32)),
            )

        arrays = SceneArrays(
            analytic=analytic,
            mesh=mesh_arrays,
            instances=MeshInstances(
                root=jnp.asarray(inst_root),
                proot=jnp.asarray(inst_proot),
                mtl=jnp.asarray(inst_mtl),
                mtl_base=jnp.asarray(inst_base),
                num_sub_mtl=jnp.asarray(inst_nsub),
                m_w2o=jnp.asarray(inst_m),
                t_o2w=jnp.asarray(inst_t),
                obj_bbox=jnp.asarray(inst_bbox),
            ),
            materials=self._material_table(),
            lights=self._light_table(),
            textures=self._texture_atlas(),
            background=self._env_color(self.scene.background),
            environment=self._env_color(self.scene.environment),
            camera=self._camera_arrays(),
        )
        meta = SceneMeta(
            img_width=self.scene.camera.img_width,
            img_height=self.scene.camera.img_height,
            num_analytic=n_analytic,
            num_mesh_instances=n_inst,
            num_tris=int(arrays.mesh.tri_v.shape[0]),
            num_lights=len(self.scene.lights),
            num_materials=len(self.materials),
            has_dof=self.scene.camera.depth_of_field > 0.1,
            bvh_depth=depth,
            has_ambient=any(l.kind == "ambient" for l in self.scene.lights),
            light_kinds=tuple(_LIGHT_KIND[l.kind] for l in self.scene.lights),
            light_soft=tuple(bool(l.size > 0.01) for l in self.scene.lights),
            analytic_kinds=tuple(int(k) for k in b.analytic_kind),
            analytic_mtls=tuple(int(m) for m in b.analytic_mtl),
            has_glossy=any(
                m.reflection_glossiness > 0 or m.refraction_glossiness > 0
                for m in self.materials
            ),
            has_mtl_textures=self.has_mtl_textures,
            has_bg_texture=_live_texture(self.scene.background),
            has_env_texture=_live_texture(self.scene.environment),
            mega_tex_ok=self._mega_tex_ok(b),
            mega_tex_slots=self._mega_tex_slots(),
            world_bvh=use_world,
            mesh_stream=(
                use_world
                and arrays.mesh.stream_coeff is not None
                and int(arrays.mesh.tri_v.shape[0]) <= _stream_max_tris()
            ),
            mesh_tiled=(use_world and arrays.mesh.tile_coeff is not None),
            mesh_mega=(use_world and arrays.mesh.mega_c16 is not None),
            mesh_mega_mtls=getattr(self, "_mega_mtls", ()),
            mesh_mega_stream=getattr(self, "_mega_stream", False),
            max_leaf=self.max_leaf,
        )
        return arrays, meta

    def _flatten_root(self, b: _Builder):
        root = self.scene.root
        identity = D.Affine()
        for child in root.children:
            self._flatten(child, identity, b)

    # Backward-compat ordering: environment/background textures must be
    # interned before the atlas is built, so compile() calls _env_color before
    # _texture_atlas. Handled by calling order below.


def _stream_max_tris() -> int:
    """Triangle budget for the dense sweep mesh path (O(rays x tris) per
    dispatch; on TPU it runs as the Pallas VMEM kernel, whose coefficient
    table budget sets the default). Above it the compiler builds the tiled
    packet-culled sweep instead (ops/mesh_tiles.py). env
    QARAY_STREAM_MAX_TRIS overrides."""
    import os

    from qaray_tpu.ops.pallas_mesh import PALLAS_MESH_MAX_TRIS

    return int(os.environ.get("QARAY_STREAM_MAX_TRIS", PALLAS_MESH_MAX_TRIS))


def _mega_stream_max_tris() -> int:
    """Upper triangle bound for the cluster-DMA STREAMED megakernel mesh
    (tables in HBM, clusters DMA'd per block). Above this the trace-level
    tiled kernel is the better tool (its packet cull amortizes across
    bounces differently)."""
    import os

    return int(os.environ.get("QARAY_MEGA_STREAM_MAX_TRIS", 65536))


def _mega_mesh_max_tris() -> int:
    """VMEM triangle budget for the megakernel's in-kernel mesh sweep
    (coeff + attr tables = 128 B/tri; 16k tris = 2 MB). env
    QARAY_MEGA_MESH_MAX_TRIS overrides."""
    import os

    return int(os.environ.get("QARAY_MEGA_MESH_MAX_TRIS", 16384))


def _live_texture(tc: D.TexturedColor) -> bool:
    return tc.map is not None and tc.map.texture.kind != "missing"


def _default_material() -> D.MaterialDesc:
    """MtlBlinn defaults (MtlBlinn_PhotonMap.cpp ctor) for unbound objects."""
    return D.MaterialDesc(name="__default__")


def compile_scene(scene: D.SceneDesc, max_leaf: int = 4, world_bvh: bool = True):
    """Compile a parsed SceneDesc into (SceneArrays, SceneMeta).

    world_bvh=True (default) bakes mesh instances to world space and builds
    one merged BVH — a single traversal replaces the per-instance loop. Set
    False (or env QARAY_NO_WORLD_BVH=1) for per-mesh object-space BVHs.
    """
    compiler = SceneCompiler(scene, max_leaf=max_leaf, world_bvh=world_bvh)
    # Intern env/background textures first so the atlas includes them.
    bg = compiler._env_color(scene.background)
    env = compiler._env_color(scene.environment)
    arrays, meta = compiler.compile()
    arrays = arrays._replace(background=bg, environment=env)
    return arrays, meta
