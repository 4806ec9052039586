"""Scene-level closest-hit and any-hit tracing over a ray megabatch.

Replaces the reference's recursive node-tree walk (Scene::TraceNodeNormal /
TraceNodeShadow, scene/scene.cpp:35-76): analytic primitives are tested as
one [B, P] vectorized pass, mesh instances via the shared BVH, and results
are merged by distance. The `t` parametrization is world-space for all
primitives (transform baking keeps it consistent; see ops/intersect.py).

Hit record (dict of [B]-shaped arrays):
    t         world-space hit distance (BIGFLOAT if miss)
    hit       bool
    p         world hit position
    n         world shading normal (normalized)
    uvw       texture coordinates
    front     front-face flag
    mtl       material table index
    has_texture  whether uvw is meaningful (mesh faces without UVs -> False)
"""

from functools import partial

import jax
import jax.numpy as jnp

from qaray_tpu.core.constants import BIGFLOAT
from qaray_tpu.core.vecmath import normalize
from qaray_tpu.ops import intersect as I
from qaray_tpu.ops.bvh_traverse import traverse_bvh
from qaray_tpu.scene.arrays import SceneArrays, SceneMeta


def _use_pallas(meta) -> bool:
    """Fused Pallas closest-hit on TPU (6-7x the XLA [B,P] pass and exactly
    f32 — see ops/pallas_analytic.py); XLA path on CPU and for empty scenes."""
    import os

    if os.environ.get("QARAY_NO_PALLAS") or meta.force_xla:
        return False
    return (
        jax.default_backend() == "tpu"
        and len(meta.analytic_kinds) == meta.num_analytic
        and meta.num_analytic > 0
    )


def _use_packed_walk(scene) -> bool:
    """Packed fat-node traversal (ops/bvh_packed.py): one row gather per
    step, leaf triangles tested inline. Default; QARAY_BVH_WALK=stacked
    selects the SoA pop-per-node walk (reference-shaped, for debugging)."""
    import os

    if os.environ.get("QARAY_BVH_WALK") == "stacked":
        return False
    return scene.mesh.pnodes is not None


def _traverse(scene, meta, p, d, root_ref, root_node, t_cur, any_hit=False):
    """Dispatch to the packed or SoA BVH walk with identical semantics.

    root_ref / root_node: scalar packed-ref / node-id roots; only the one
    the selected walk needs is touched (root_ref is None without pnodes).
    """
    num_rays = p.shape[0]
    if _use_packed_walk(scene):
        from qaray_tpu.ops.bvh_packed import traverse_bvh_packed

        roots = jnp.broadcast_to(root_ref, (num_rays,))
        return traverse_bvh_packed(
            p, d, roots, t_cur, scene.mesh.pnodes, scene.mesh.ltri,
            max_leaf=meta.max_leaf, stack_size=meta.bvh_depth + 2,
            any_hit=any_hit,
        )
    roots = jnp.broadcast_to(root_node, (num_rays,))
    return traverse_bvh(
        p, d, roots, t_cur, scene.mesh,
        max_leaf=meta.max_leaf, stack_size=meta.bvh_depth + 2,
        any_hit=any_hit,
    )


def _use_stream(meta) -> bool:
    """Dense streaming sweep (ops/mesh_stream.py) vs per-lane BVH walk.

    Streaming is the TPU-native default: per-lane gathers in the walk lower
    to scalar loads (~GB/s); the sweep is pure broadcasted VPU work.
    QARAY_MESH_PATH=bvh forces the walk (CPU golden parity / debugging)."""
    import os

    mode = os.environ.get("QARAY_MESH_PATH", "auto")
    if mode == "bvh":
        return False
    if mode == "stream":
        return True
    return meta.mesh_stream and jax.default_backend() == "tpu"


def _use_tiles(meta) -> bool:
    """Tiled packet-culled sweep (ops/mesh_tiles.py): the large-mesh TPU
    path, compiled in above the stream triangle budget. QARAY_MESH_PATH=bvh
    still forces the walk; =tiles forces the tiled sweep on any backend
    (parity tests)."""
    import os

    mode = os.environ.get("QARAY_MESH_PATH", "auto")
    if mode == "bvh":
        return False
    if mode == "tiles":
        return meta.mesh_tiled
    return meta.mesh_tiled and jax.default_backend() == "tpu"


def _tiles_of(scene):
    from qaray_tpu.ops.mesh_tiles import TiledMesh

    return TiledMesh(
        scene.mesh.tile_coeff, scene.mesh.tile_const,
        scene.mesh.tile_gid, scene.mesh.tile_cbounds,
    )


def _tile_perm(p, d, tiles):
    """Coherence sort for the tiled sweep (None = identity / disabled)."""
    import os

    if os.environ.get("QARAY_TILE_SORT", "1") == "0":
        return None
    from qaray_tpu.ops.mesh_tiles import coherence_order

    lo = jnp.min(tiles.cbounds[:, :3], axis=0)
    hi = jnp.max(tiles.cbounds[:, 3:], axis=0)
    return coherence_order(p, d, lo, hi)


def _use_pallas_tiles(scene, meta) -> bool:
    """Pallas cluster-DMA tiled sweep (ops/pallas_tiles.py): the large-mesh
    TPU path — per-packet front-to-back march with in-VMEM tests and early
    termination, replacing the per-step XLA cull/gather/top-2 pipeline."""
    import os

    if os.environ.get("QARAY_NO_PALLAS") or meta.force_xla:
        return False
    if os.environ.get("QARAY_TILES_IMPL") == "xla":
        return False
    return (
        jax.default_backend() == "tpu"
        and scene.mesh.tile_c16T is not None
    )


def _tiled_dispatch(scene, meta, p, d, t_cur, any_hit=False):
    """tiled_sweep with the Pallas kernel on TPU, XLA elsewhere."""
    from qaray_tpu.ops.mesh_tiles import tiled_sweep

    tiles = _tiles_of(scene)
    if _use_pallas_tiles(scene, meta):
        from qaray_tpu.ops.pallas_tiles import pallas_tiled_sweep

        out = pallas_tiled_sweep(
            p, d, t_cur, tiles, scene.mesh.tile_c16T, any_hit=any_hit
        )
        return out if any_hit else out[:3]
    return tiled_sweep(p, d, t_cur, tiles, any_hit=any_hit)


def _tiled_closest(scene, meta, p, d, t_cur):
    """Tiled packet-culled closest hit with exact winner re-test and
    runner-up fallback (same discipline as _stream_closest)."""
    import os

    from qaray_tpu.ops.mesh_tiles import exact_winner_rows

    tiles = _tiles_of(scene)
    if _use_pallas_tiles(scene, meta):
        # Two-phase divergence compaction (budgeted march + re-pack of the
        # unresolved lanes); sorting is internal. QARAY_PTILE_BUDGET=0
        # forces the single-phase sweep.
        from qaray_tpu.ops.pallas_tiles import tiled_closest_twophase

        budget = int(os.environ.get("QARAY_PTILE_BUDGET", "12"))
        _, rows, rows2 = tiled_closest_twophase(
            p, d, t_cur, tiles, scene.mesh.tile_c16T, budget=budget
        )
    else:
        perm = _tile_perm(p, d, tiles)
        if perm is not None:
            inv = jnp.argsort(perm)
            _, rows_s, rows2_s = _tiled_dispatch(
                scene, meta, p[perm], d[perm], t_cur[perm]
            )
            rows, rows2 = rows_s[inv], rows2_s[inv]
        else:
            _, rows, rows2 = _tiled_dispatch(scene, meta, p, d, t_cur)
    t_e, bary, front, valid, gid = exact_winner_rows(
        p, d, rows, tiles, scene.mesh.tri_v
    )
    t2, bary2, front2, valid2, gid2 = exact_winner_rows(
        p, d, rows2, tiles, scene.mesh.tri_v
    )
    use2 = (~valid) & valid2
    gid = jnp.where(use2, gid2, gid)
    t_e = jnp.where(use2, t2, t_e)
    bary = jnp.where(use2[:, None], bary2, bary)
    front = jnp.where(use2, front2, front)
    valid |= use2
    valid &= t_e < t_cur
    tri = jnp.where(valid, gid, -1)
    t = jnp.where(valid, t_e, BIGFLOAT)
    return t, tri, bary, front


def _use_pallas_mesh(scene, meta) -> bool:
    """Pallas dense mesh sweep (ops/pallas_mesh.py): the TPU small-mesh
    path — VMEM-fused triangle tests, ~6-10x the XLA stream on this
    runtime (no [B, chunk] HBM intermediates)."""
    import os

    if os.environ.get("QARAY_NO_PALLAS") or meta.force_xla:
        return False
    return (
        jax.default_backend() == "tpu"
        and scene.mesh.stream_c16 is not None
    )


def _stream_closest(scene, meta, p, d, t_cur):
    """Streaming closest hit (world-baked scenes only)."""
    from qaray_tpu.ops.mesh_stream import (
        StreamTris,
        exact_winner,
        stream_closest,
    )

    if _use_pallas_mesh(scene, meta):
        from qaray_tpu.ops.pallas_mesh import pallas_sweep_closest

        t_s, gid, gid2 = pallas_sweep_closest(
            p, d, t_cur, scene.mesh.stream_c16
        )
    else:
        stream = StreamTris(scene.mesh.stream_coeff, scene.mesh.stream_const)
        t_s, gid, gid2 = stream_closest(p, d, t_cur, stream)
    # Exact attributes for the single winner (reference numerics). The
    # sweep's linear-in-t predicate can disagree with the exact test near
    # triangle edges; lanes whose winner fails the exact re-test fall back
    # to the sweep's runner-up before reporting a miss.
    t_e, bary, front, valid = exact_winner(p, d, gid, scene.mesh.tri_v)
    t2, bary2, front2, valid2 = exact_winner(p, d, gid2, scene.mesh.tri_v)
    use2 = (~valid) & valid2
    gid = jnp.where(use2, gid2, gid)
    t_e = jnp.where(use2, t2, t_e)
    bary = jnp.where(use2[:, None], bary2, bary)
    front = jnp.where(use2, front2, front)
    valid |= use2
    valid &= t_e < t_cur
    tri = jnp.where(valid, gid, -1)
    t = jnp.where(valid, t_e, BIGFLOAT)
    return t, tri, bary, front


def _mesh_closest(scene: SceneArrays, meta: SceneMeta, p, d, t_cur):
    """Closest hit across all mesh instances. Returns (t, inst, tri, bary).

    With meta.world_bvh (the default compile mode) all instances were baked
    into ONE world-space tree at compile time, so this is a single traversal
    with no ray transforms; otherwise fall back to the sequential
    per-instance object-space loop."""
    num_rays = p.shape[0]
    if meta.world_bvh:
        if _use_tiles(meta):
            t, tri, bary, front = _tiled_closest(scene, meta, p, d, t_cur)
        elif _use_stream(meta):
            t, tri, bary, front = _stream_closest(scene, meta, p, d, t_cur)
        else:
            inst = scene.instances
            root_ref = inst.proot[0] if inst.proot is not None else None
            t, tri, bary, front = _traverse(
                scene, meta, p, d, root_ref, jnp.int32(0), t_cur
            )
        inst0 = jnp.where(tri >= 0, 0, -1).astype(jnp.int32)
        return t, inst0, tri, bary, front
    best_t = t_cur
    best_inst = jnp.full((num_rays,), -1, jnp.int32)
    best_tri = jnp.full((num_rays,), -1, jnp.int32)
    best_bary = jnp.zeros((num_rays, 3), jnp.float32)
    best_front = jnp.zeros((num_rays,), bool)
    inst = scene.instances
    for i in range(meta.num_mesh_instances):
        m = inst.m_w2o[i]
        p_obj = jnp.matmul(p - inst.t_o2w[i], m.T, precision="highest")
        d_obj = jnp.matmul(d, m.T, precision="highest")
        root_ref = inst.proot[i] if inst.proot is not None else None
        t, tri, bary, front = _traverse(
            scene, meta, p_obj, d_obj, root_ref, inst.root[i], best_t
        )
        take = (tri >= 0) & (t < best_t)
        best_t = jnp.where(take, t, best_t)
        best_inst = jnp.where(take, i, best_inst)
        best_tri = jnp.where(take, tri, best_tri)
        best_bary = jnp.where(take[:, None], bary, best_bary)
        best_front = jnp.where(take, front, best_front)
    return best_t, best_inst, best_tri, best_bary, best_front


def _mesh_hit_attrs(scene: SceneArrays, p, d, t, inst_id, tri_id, bary, front):
    """Interpolate shading attributes for mesh hits (TriObj::IntersectTriangle)."""
    inst = scene.instances
    mesh = scene.mesh
    safe_inst = jnp.maximum(inst_id, 0)
    safe_tri = jnp.maximum(tri_id, 0)
    m = inst.m_w2o[safe_inst]  # [B,3,3]

    n_corners = mesh.tri_n[safe_tri]  # [B,3,3]
    n_obj = jnp.einsum("bk,bki->bi", bary, n_corners, precision="highest")
    n_world = normalize(jnp.einsum("bji,bj->bi", m, n_obj, precision="highest"), eps=1e-30)

    uv_corners = mesh.tri_uv[safe_tri]  # [B,3,2]
    uv = jnp.einsum("bk,bki->bi", bary, uv_corners, precision="highest")
    uvw = jnp.concatenate([uv, jnp.zeros_like(uv[:, :1])], axis=-1)

    # Material: instance override, or per-face sub-material (MultiMtl).
    face_mtl = mesh.tri_mtl[safe_tri]
    sub = inst.mtl_base[safe_inst] + jnp.clip(
        face_mtl, 0, jnp.maximum(inst.num_sub_mtl[safe_inst] - 1, 0)
    )
    mtl = jnp.where(inst.mtl[safe_inst] >= 0, inst.mtl[safe_inst], sub)

    return {
        "p": p + t[:, None] * d,
        "n": n_world,
        "uvw": uvw,
        "front": front,
        "mtl": mtl.astype(jnp.int32),
        "has_texture": mesh.tri_has_uv[safe_tri],
    }


def _mesh_diff_uv(scene, p, d, px, dx, py, dy, t, inst_id, tri_id, bary, uvw):
    """Triangle diff-hit uv derivatives (TriObj::IntersectTriangle diff block,
    objects.cpp:264-290): offset rays hit the triangle's plane; barycentric
    re-evaluation interpolates the corner uvs."""
    from qaray_tpu.core.constants import RCP_DX, RCP_DY

    inst = scene.instances
    mesh = scene.mesh
    si = jnp.maximum(inst_id, 0)
    st = jnp.maximum(tri_id, 0)
    m = inst.m_w2o[si]
    t0 = inst.t_o2w[si]
    v = mesh.tri_v[st]  # [B,3,3]
    uvc = mesh.tri_uv[st]  # [B,3,2]
    v0, v1, v2 = v[:, 0], v[:, 1], v[:, 2]
    n = jnp.cross(v1 - v0, v2 - v0)

    abs_n = jnp.abs(n)
    axis0 = (abs_n[..., 0] > abs_n[..., 1]) & (abs_n[..., 0] > abs_n[..., 2])
    axis1 = (~axis0) & (abs_n[..., 1] > abs_n[..., 2])

    def area(axis, a, b, c):
        i, j = {0: (1, 2), 1: (0, 2), 2: (0, 1)}[axis]
        return (b[..., i] - a[..., i]) * (c[..., j] - a[..., j]) - (
            c[..., i] - a[..., i]
        ) * (b[..., j] - a[..., j])

    def bary_at(hp):
        def for_axis(axis):
            s = area(axis, v0, v1, v2)
            s = jnp.where(jnp.abs(s) < 1e-30, 1e-30, s)
            a = area(axis, hp, v1, v2) / s
            b = area(axis, hp, v2, v0) / s
            return a, b

        a0, b0 = for_axis(0)
        a1, b1 = for_axis(1)
        a2, b2 = for_axis(2)
        a = jnp.where(axis0, a0, jnp.where(axis1, a1, a2))
        b = jnp.where(axis0, b0, jnp.where(axis1, b1, b2))
        return jnp.stack([a, b, 1.0 - a - b], axis=-1)

    def offset_uv(pw, dw):
        po = jnp.einsum("bij,bj->bi", m, pw - t0, precision="highest")
        do = jnp.einsum("bij,bj->bi", m, dw, precision="highest")
        denom = jnp.sum(do * n, axis=-1)
        denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        t_off = -jnp.sum((po - v0) * n, axis=-1) / denom
        hp = po + t_off[:, None] * do
        bc = bary_at(hp)
        uv = jnp.einsum("bk,bki->bi", bc, uvc, precision="highest")
        return jnp.concatenate([uv, jnp.zeros_like(uv[:, :1])], axis=-1)

    duvw0 = RCP_DX * (offset_uv(px, dx) - uvw)
    duvw1 = RCP_DY * (offset_uv(py, dy) - uvw)
    return duvw0, duvw1


@partial(jax.jit, static_argnames=("meta",))
def trace_closest(scene: SceneArrays, meta: SceneMeta, p, d, diff=None):
    """Closest-hit trace of B world-space rays.

    diff: optional (px, dx, py, dy) differential rays (DiffRay semantics,
    core/ray.h); when given, the hit record gains `duvw0`/`duvw1` texture
    footprints for the winning primitive — the reference computes these only
    for primary camera rays too (secondary DiffRays are constructed with
    hasDiffRay=false in the default material, MtlBlinn_PhotonMap.cpp:233).
    """
    num_rays = p.shape[0]

    full_attrs = None
    if meta.num_analytic > 0:
        if _use_pallas(meta):
            from qaray_tpu.ops.pallas_analytic import (
                closest_analytic_full_pallas,
            )

            # Fused closest + winner attributes: one kernel instead of the
            # intersect/gather/transform/normalize chain (each elementwise
            # pass costs multiple ms on this runtime).
            full_attrs = closest_analytic_full_pallas(
                p, d, scene.analytic, meta.analytic_kinds,
                want_uv=meta.has_mtl_textures,
            )
            t_a = full_attrs["t"]
            prim_idx = full_attrs["prim_idx"]
        else:
            t_a, prim_idx = I.closest_analytic(p, d, scene.analytic)
    else:
        t_a = jnp.full((num_rays,), BIGFLOAT)
        prim_idx = jnp.zeros((num_rays,), jnp.int32)

    if meta.num_mesh_instances > 0:
        t_m, inst_id, tri_id, bary, front_m = _mesh_closest(scene, meta, p, d, t_a)
    else:
        t_m = jnp.full((num_rays,), BIGFLOAT)
        inst_id = tri_id = jnp.full((num_rays,), -1, jnp.int32)
        bary = jnp.zeros((num_rays, 3), jnp.float32)
        front_m = jnp.zeros((num_rays,), bool)

    # Mesh pass pruned against t_a, so a valid mesh hit is closer by design.
    use_mesh = tri_id >= 0
    t = jnp.where(use_mesh, t_m, t_a)
    hit = t < BIGFLOAT

    # Attribute math on miss lanes must stay finite: at t = BIGFLOAT the
    # squared norms overflow to inf and normalize() yields NaN, which then
    # poisons *gradients* of every multiplication sharing those lanes (zero
    # cotangent times NaN cofactor). Evaluate attributes at a benign t.
    t_attr = jnp.where(hit, t, 1.0)

    if full_attrs is not None:
        attrs_a = {
            k: full_attrs[k]
            for k in ("p", "n", "uvw", "front", "mtl", "has_texture")
        }
    else:
        attrs_a = I.analytic_hit_attrs(p, d, t_attr, prim_idx, scene.analytic)
    if meta.num_mesh_instances > 0:
        attrs_m = _mesh_hit_attrs(scene, p, d, t_attr, inst_id, tri_id, bary, front_m)
        sel = lambda a, b: jnp.where(
            use_mesh.reshape((-1,) + (1,) * (a.ndim - 1)), b, a
        )
        attrs = {k: sel(attrs_a[k], attrs_m[k]) for k in attrs_a}
    else:
        attrs = attrs_a

    if diff is not None:
        px, dx, py, dy = diff
        d0a, d1a = I.analytic_diff_uv(
            p, d, px, dx, py, dy, t_attr, prim_idx, scene.analytic, attrs["uvw"]
        )
        if meta.num_mesh_instances > 0:
            d0m, d1m = _mesh_diff_uv(
                scene, p, d, px, dx, py, dy, t_attr, inst_id, tri_id, bary,
                attrs["uvw"],
            )
            d0 = jnp.where(use_mesh[:, None], d0m, d0a)
            d1 = jnp.where(use_mesh[:, None], d1m, d1a)
        else:
            d0, d1 = d0a, d1a
        attrs["duvw0"] = d0
        attrs["duvw1"] = d1

    attrs["t"] = t
    attrs["hit"] = hit
    return attrs


@partial(jax.jit, static_argnames=("meta",))
def trace_shadow(scene: SceneArrays, meta: SceneMeta, p, d, t_max):
    """Any-hit occlusion test; True where something blocks within t_max.

    Matches GenLight::Shadow semantics (lights/lights.cpp:39-48): both hit
    sides count, hits must satisfy BIAS < t < t_max.
    """
    num_rays = p.shape[0]
    occluded = jnp.zeros((num_rays,), bool)

    if meta.num_analytic > 0:
        if _use_pallas(meta):
            from qaray_tpu.ops.pallas_analytic import shadow_analytic_pallas

            occluded |= shadow_analytic_pallas(
                p, d, t_max, scene.analytic, meta.analytic_kinds
            )
        else:
            t_all = I.intersect_analytic_t(p, d, scene.analytic)  # [B, P]
            occluded |= jnp.any(t_all < t_max[:, None], axis=-1)

    if meta.num_mesh_instances > 0:
        inst = scene.instances
        if meta.world_bvh:
            if _use_tiles(meta):
                tiles = _tiles_of(scene)
                budget = jnp.where(occluded, 0.0, t_max)
                perm = _tile_perm(p, d, tiles)
                if perm is not None:
                    inv = jnp.argsort(perm)
                    occ_s = _tiled_dispatch(
                        scene, meta, p[perm], d[perm], budget[perm],
                        any_hit=True,
                    )
                    occluded |= occ_s[inv]
                else:
                    occluded |= _tiled_dispatch(
                        scene, meta, p, d, budget, any_hit=True
                    )
                return occluded
            if _use_stream(meta):
                budget = jnp.where(occluded, 0.0, t_max)
                if _use_pallas_mesh(scene, meta):
                    # Occlusion == the budget-seeded closest sweep finding
                    # any row (BIAS < t < t_max), same predicate math.
                    from qaray_tpu.ops.pallas_mesh import pallas_sweep_closest

                    _, row, _ = pallas_sweep_closest(
                        p, d, budget, scene.mesh.stream_c16
                    )
                    occluded |= row >= 0
                    return occluded
                from qaray_tpu.ops.mesh_stream import (
                    StreamTris,
                    stream_any_hit,
                )

                stream = StreamTris(
                    scene.mesh.stream_coeff, scene.mesh.stream_const
                )
                occluded |= stream_any_hit(p, d, budget, stream)
                return occluded
            root_ref = inst.proot[0] if inst.proot is not None else None
            budget = jnp.where(occluded, 0.0, t_max)
            t, tri, _, _ = _traverse(
                scene, meta, p, d, root_ref, jnp.int32(0), budget, any_hit=True
            )
            occluded |= (tri >= 0) & (t < t_max)
            return occluded
        for i in range(meta.num_mesh_instances):
            m = inst.m_w2o[i]
            p_obj = jnp.matmul(p - inst.t_o2w[i], m.T, precision="highest")
            d_obj = jnp.matmul(d, m.T, precision="highest")
            root_ref = inst.proot[i] if inst.proot is not None else None
            # Skip lanes already occluded by zeroing their budget.
            budget = jnp.where(occluded, 0.0, t_max)
            t, tri, _, _ = _traverse(
                scene, meta, p_obj, d_obj, root_ref, inst.root[i], budget,
                any_hit=True,
            )
            occluded |= (tri >= 0) & (t < t_max)

    return occluded
