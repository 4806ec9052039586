"""Device-resident flattened scene: SoA pytrees consumed by the kernels.

This is the TPU-native replacement for the reference's pointer-based scene
graph (core/node.h) + virtual dispatch: the node tree is flattened at compile
time into world-space primitive records with baked affine transforms
(mirroring Node::ToNodeCoords / FromNodeCoords semantics, core/node.cpp:
112-139), materials/lights become SoA tables indexed by integer ids, and all
meshes share concatenated triangle + BVH arrays.

All arrays are float32/int32 jnp arrays => SceneArrays is a jax pytree that
can be donated, sharded (replicated) and differentiated through.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# Primitive kinds
KIND_SPHERE = 0
KIND_PLANE = 1

# Light kinds
LIGHT_AMBIENT = 0
LIGHT_DIRECT = 1
LIGHT_POINT = 2
LIGHT_SPOT = 3

# Texture kinds
TEX_FILE = 0
TEX_CHECKER = 1

# Texture slots on a material
SLOT_DIFFUSE = 0
SLOT_SPECULAR = 1
SLOT_EMISSION = 2
SLOT_REFLECTION = 3
SLOT_REFRACTION = 4
NUM_SLOTS = 5


class AnalyticPrims(NamedTuple):
    """Unit spheres / unit-square planes instanced by affine transforms.

    p_obj = m_w2o @ (p_world - t_o2w);  dir_obj = m_w2o @ dir_world;
    N_world = normalize(m_w2o^T @ N_obj)  (core/transform.h:47-61).
    """

    kind: jnp.ndarray  # [P] int32
    mtl: jnp.ndarray  # [P] int32
    m_w2o: jnp.ndarray  # [P, 3, 3] float32
    t_o2w: jnp.ndarray  # [P, 3] float32


class MeshArrays(NamedTuple):
    """All meshes concatenated; triangle vertex data pre-gathered per face."""

    tri_v: jnp.ndarray  # [F, 3, 3] vertex positions
    tri_n: jnp.ndarray  # [F, 3, 3] shading normals per corner
    tri_uv: jnp.ndarray  # [F, 3, 2] texture coords per corner
    tri_has_uv: jnp.ndarray  # [F] bool
    tri_mtl: jnp.ndarray  # [F] int32 sub-material id (-1 if none)
    # Flattened BVH over all meshes (indices already globally offset).
    bvh_bounds: jnp.ndarray  # [N, 6]
    bvh_left: jnp.ndarray  # [N] (-1 => leaf)
    bvh_right: jnp.ndarray  # [N] (child index, or elem offset for leaf)
    bvh_count: jnp.ndarray  # [N]
    bvh_elems: jnp.ndarray  # [F] global triangle ids in leaf order
    # Packed fat-node layout (ops/bvh_packed.py): one row gather per
    # traversal step. Optional — None falls back to the SoA walk above.
    pnodes: jnp.ndarray = None  # [Ni, 16] f32 (child boxes + bitcast refs)
    ltri: jnp.ndarray = None  # [F, 12] f32 leaf-ordered [v0 v1 v2 gid pad]
    # Streaming sweep coefficients (ops/mesh_stream.py): gather-free dense
    # triangle intersection, the default mesh path on TPU up to the stream
    # triangle budget.
    stream_coeff: jnp.ndarray = None  # [Fp, 3, 3] rows n, A, B
    stream_const: jnp.ndarray = None  # [Fp, 4] k, A0, B0, |n|
    # Packed [Fp16, 16] coefficient table for the Pallas dense sweep kernel
    # (ops/pallas_mesh.py) — the TPU mesh path under its VMEM budget.
    stream_c16: jnp.ndarray = None
    # Tiled packet-culled sweep (ops/mesh_tiles.py): Morton-clustered
    # coefficients + cluster AABBs — the large-mesh TPU path (built instead
    # of the flat stream above the triangle budget).
    tile_coeff: jnp.ndarray = None  # [Fp, 3, 3] Morton order
    tile_const: jnp.ndarray = None  # [Fp, 4]
    tile_gid: jnp.ndarray = None  # [Fp] original triangle id
    tile_cbounds: jnp.ndarray = None  # [C, 6] cluster AABBs
    # Transposed [16, Fp] coefficient table for the Pallas tiled kernel
    # (ops/pallas_tiles.py) — stays in HBM, clusters DMA'd per step.
    tile_c16T: jnp.ndarray = None
    # Megakernel mesh tables (ops/pallas_pathtrace.py): Morton-ordered
    # sweep coefficients + per-row shading attributes (corner normals,
    # material row) + cluster AABBs, all VMEM-resident in the kernel.
    mega_c16: jnp.ndarray = None  # [Fp, 16] pack_coeff16 layout
    mega_attr: jnp.ndarray = None  # [Fp, 16] n0/n1/n2 xyz + mtl row
    mega_cbounds: jnp.ndarray = None  # [C, 8] cluster AABB (6) + pad


class MeshInstances(NamedTuple):
    root: jnp.ndarray  # [I] int32 BVH root node per instance
    mtl: jnp.ndarray  # [I] int32 single material (-1 => per-face table)
    mtl_base: jnp.ndarray  # [I] int32 base offset for per-face materials
    num_sub_mtl: jnp.ndarray  # [I] int32 number of sub-materials
    m_w2o: jnp.ndarray  # [I, 3, 3]
    t_o2w: jnp.ndarray  # [I, 3]
    obj_bbox: jnp.ndarray  # [I, 6] object-space bound box (prefilter)
    proot: jnp.ndarray = None  # [I] int32 packed root ref (ops/bvh_packed)


class MaterialTable(NamedTuple):
    diffuse: jnp.ndarray  # [M, 3]
    specular: jnp.ndarray  # [M, 3]
    emission: jnp.ndarray  # [M, 3]
    reflection: jnp.ndarray  # [M, 3]
    refraction: jnp.ndarray  # [M, 3]
    absorption: jnp.ndarray  # [M, 3]
    glossiness: jnp.ndarray  # [M]
    reflection_glossiness: jnp.ndarray  # [M]
    refraction_glossiness: jnp.ndarray  # [M]
    ior: jnp.ndarray  # [M]
    tex_id: jnp.ndarray  # [M, NUM_SLOTS] int32 (-1 => no texture)
    tex_m: jnp.ndarray  # [M, NUM_SLOTS, 3, 3] uvw w2t matrices
    tex_t: jnp.ndarray  # [M, NUM_SLOTS, 3] uvw transform origins


class LightTable(NamedTuple):
    kind: jnp.ndarray  # [L] int32
    intensity: jnp.ndarray  # [L, 3]
    position: jnp.ndarray  # [L, 3]
    direction: jnp.ndarray  # [L, 3]
    size: jnp.ndarray  # [L]
    inner: jnp.ndarray  # [L]
    outer: jnp.ndarray  # [L]


class TextureAtlas(NamedTuple):
    texels: jnp.ndarray  # [T, 3] flat texel pool
    offset: jnp.ndarray  # [K] int32
    width: jnp.ndarray  # [K] int32
    height: jnp.ndarray  # [K] int32
    kind: jnp.ndarray  # [K] int32 (TEX_FILE | TEX_CHECKER)
    color1: jnp.ndarray  # [K, 3] checker colors
    color2: jnp.ndarray  # [K, 3]


class EnvColor(NamedTuple):
    """TexturedColor for background / environment."""

    color: jnp.ndarray  # [3]
    tex_id: jnp.ndarray  # [] int32 (-1 => none)
    tex_m: jnp.ndarray  # [3, 3]
    tex_t: jnp.ndarray  # [3]


class CameraArrays(NamedTuple):
    """Resolved screen basis (reference renderer.cpp:76-91)."""

    pos: jnp.ndarray  # [3]
    screen_a: jnp.ndarray  # [3] top-left screen corner
    screen_u: jnp.ndarray  # [3] per-pixel step right
    screen_v: jnp.ndarray  # [3] per-pixel step down
    screen_x: jnp.ndarray  # [3] camera right (DoF basis)
    screen_y: jnp.ndarray  # [3] camera up (DoF basis)
    dof: jnp.ndarray  # [] depth of field lens radius


class SceneArrays(NamedTuple):
    analytic: AnalyticPrims
    mesh: MeshArrays
    instances: MeshInstances
    materials: MaterialTable
    lights: LightTable
    textures: TextureAtlas
    background: EnvColor
    environment: EnvColor
    camera: CameraArrays


class SceneMeta(NamedTuple):
    """Static (hashable) facts about the compiled scene, closed over by jit."""

    img_width: int
    img_height: int
    num_analytic: int
    num_mesh_instances: int
    num_tris: int
    num_lights: int
    num_materials: int
    has_dof: bool
    bvh_depth: int
    has_ambient: bool
    # Per-light static facts (kinds drive which illumination code is traced).
    light_kinds: tuple = ()  # of LIGHT_* ints
    light_soft: tuple = ()  # of bools: size > 0.01 => area shadow sampling
    # Analytic primitive kinds (static: specializes the Pallas closest-hit
    # kernel's per-primitive branch at trace time).
    analytic_kinds: tuple = ()
    # Per-primitive material table rows (static: lets the pathtrace
    # megakernel fold material selection into its unrolled closest-hit loop
    # with static table indices instead of per-lane gathers).
    analytic_mtls: tuple = ()
    # Megakernel mesh path: True when the world-baked mesh fits the VMEM
    # table budget and its faces use few enough distinct materials for the
    # kernel's static material merge. mesh_mega_mtls = the distinct
    # material rows (sorted); the kernel folds a per-winner material id
    # during the sweep and merges params by comparing against this tuple.
    mesh_mega: bool = False
    mesh_mega_mtls: tuple = ()
    # Streamed variant: mega tables live in HBM as [Fp/8, 128] slabs and
    # clusters are DMA'd into kernel scratch (16k < tris <= 64k).
    mesh_mega_stream: bool = False
    # Any material with reflection/refraction glossiness > 0 (static: lets
    # the engine skip the glossy-jitter sampling entirely for the common
    # non-glossy scene).
    has_glossy: bool = False
    # Megakernel texture path: True when every live material texture is a
    # procedural checker (pure math — file textures need per-lane texel
    # gathers, which Mosaic cannot vectorize) and no mega-mesh face
    # material is textured. mega_tex_slots marks which of the 5 material
    # slots (diffuse, specular, emission, reflection, refraction) carry
    # any live texture, so the kernel only reads/merges those columns.
    mega_tex_ok: bool = False
    mega_tex_slots: tuple = (False,) * 5
    # Static texture presence: when False the engine skips all texture
    # sampling machinery (the 32-sample footprint filter over 5 material
    # slots dominates untextured scenes otherwise — e.g. trc_scene_xmas,
    # whose texture files are missing upstream).
    has_mtl_textures: bool = True
    has_bg_texture: bool = True
    has_env_texture: bool = True
    # World-space merged mesh BVH: all instances baked into one tree, so the
    # single "instance" carries an identity transform and mesh tracing skips
    # the world<->object transforms entirely (scene/compiler.py).
    world_bvh: bool = False
    # Streaming mesh path (ops/mesh_stream.py): dense gather-free sweep,
    # selected by the compiler for world-baked scenes under a triangle
    # budget. Per-lane-gather BVH walks are the fallback for huge scenes.
    mesh_stream: bool = False
    # Tiled packet-culled mesh path (ops/mesh_tiles.py): built by the
    # compiler for world-baked scenes ABOVE the stream triangle budget.
    mesh_tiled: bool = False
    # Force the pure-XLA kernels (no Pallas custom_vjp ops) for this trace:
    # mega_render's bwd rule re-differentiates the wavefront engine, and
    # jax cannot linearize a nested Pallas custom_vjp inside another
    # custom_vjp's bwd on TPU. Static, so it forks the jit caches cleanly.
    force_xla: bool = False
    # The BVH builder's leaf budget: the traversal kernels unroll exactly
    # this many triangle tests per leaf, so it MUST ride along with the
    # compiled scene (a walk with a smaller static max_leaf silently skips
    # triangles). Must be <= 7 (3-bit count in the packed-ref encoding).
    max_leaf: int = 4
