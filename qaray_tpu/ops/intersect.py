"""Batched analytic primitive intersection (unit sphere / unit plane).

Vectorized re-expression of the reference's per-ray kernels
(objects/objects.cpp:55-208): a megabatch of B rays is tested against all P
analytic primitives at once as a [B, P] computation — TPU vectorization
replaces the reference's per-pixel virtual dispatch. Matches the reference's
numerics: bias epsilon 0.005 for self-hit rejection, smaller-positive-root
selection for spheres, [-1,1]^2 bound + 1e-7 parallel guard for planes.

Rays are transformed into each primitive's object space with the baked
world->object affines. The `t` parameter is shared between world and object
space because directions transform linearly without renormalization —
exactly the reference's convention (rays are normalized once in world space,
node-space rays inherit the parametrization; core/node.cpp:112-126).
"""

import jax.numpy as jnp

from qaray_tpu.core.constants import BIAS, BIGFLOAT, PLANE_EPS
from qaray_tpu.core.vecmath import normalize
from qaray_tpu.scene.arrays import KIND_SPHERE, AnalyticPrims


def _to_object(p, d, prims: AnalyticPrims):
    """[B,3] rays -> [B,P,3] object-space rays."""
    rel = p[:, None, :] - prims.t_o2w[None, :, :]  # [B,P,3]
    p_obj = jnp.einsum("pij,bpj->bpi", prims.m_w2o, rel, precision="highest")
    d_obj = jnp.einsum("pij,bj->bpi", prims.m_w2o, d, precision="highest")
    return p_obj, d_obj


def intersect_analytic_t(p, d, prims: AnalyticPrims):
    """Distance-only pass. Returns t [B, P] (BIGFLOAT where missed)."""
    p_obj, d_obj = _to_object(p, d, prims)

    # --- sphere: a t^2 + b t + c = 0 (objects.cpp:55-85) ---
    a = jnp.sum(d_obj * d_obj, axis=-1)
    b = 2.0 * jnp.sum(p_obj * d_obj, axis=-1)
    c = jnp.sum(p_obj * p_obj, axis=-1) - 1.0
    delta = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(delta, 0.0))
    rcp2a = 0.5 / a
    t1 = (-b - sq) * rcp2a
    t2 = (-b + sq) * rcp2a
    t_sph = jnp.where(t1 > BIAS, t1, jnp.where(t2 > BIAS, t2, BIGFLOAT))
    t_sph = jnp.where(delta >= 0.0, t_sph, BIGFLOAT)

    # --- plane: z=0, |x|,|y| <= 1 (objects.cpp:149-161) ---
    dz = d_obj[..., 2]
    pz = p_obj[..., 2]
    t_pl = -pz / jnp.where(jnp.abs(dz) < PLANE_EPS, jnp.inf, dz)
    hit_xy = (
        (jnp.abs(p_obj[..., 0] + t_pl * d_obj[..., 0]) <= 1.0)
        & (jnp.abs(p_obj[..., 1] + t_pl * d_obj[..., 1]) <= 1.0)
    )
    t_pl = jnp.where((t_pl > BIAS) & hit_xy, t_pl, BIGFLOAT)

    is_sphere = (prims.kind == KIND_SPHERE)[None, :]
    return jnp.where(is_sphere, t_sph, t_pl)


def closest_analytic(p, d, prims: AnalyticPrims):
    """Returns (t [B], prim_idx [B]) of the closest analytic hit."""
    t = intersect_analytic_t(p, d, prims)
    idx = jnp.argmin(t, axis=-1)
    return jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0], idx.astype(jnp.int32)


def analytic_hit_attrs(p, d, t, prim_idx, prims: AnalyticPrims):
    """Recompute hit attributes for the winning primitive only.

    Returns dict with p (world), n (world, normalized), uvw [B,3], front [B],
    mtl [B]. Texture coordinates follow Sphere_TexCoord / Plane_TexCoord
    (objects.cpp:48-53, 144-147).
    """
    m = prims.m_w2o[prim_idx]  # [B,3,3]
    t0 = prims.t_o2w[prim_idx]  # [B,3]
    kind = prims.kind[prim_idx]
    p_obj = jnp.einsum("bij,bj->bi", m, p - t0, precision="highest")
    d_obj = jnp.einsum("bij,bj->bi", m, d, precision="highest")
    hp_obj = p_obj + t[:, None] * d_obj

    # Sphere: N = normalize(p_obj); uv = (0.5 - atan2(x,y)/2pi, 0.5 + asin(z)/pi)
    n_sph = normalize(hp_obj, eps=1e-30)
    uv_sph = jnp.stack(
        [
            0.5 - jnp.arctan2(hp_obj[..., 0], hp_obj[..., 1]) / (2.0 * jnp.pi),
            0.5 + jnp.arcsin(jnp.clip(n_sph[..., 2], -1.0, 1.0)) / jnp.pi,
            jnp.zeros_like(t),
        ],
        axis=-1,
    )
    # Plane: N = +z; uv = ((x+1)/2, (y+1)/2)
    n_pl = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], p.dtype), n_sph.shape)
    uv_pl = jnp.stack(
        [
            (hp_obj[..., 0] + 1.0) * 0.5,
            (hp_obj[..., 1] + 1.0) * 0.5,
            jnp.zeros_like(t),
        ],
        axis=-1,
    )

    is_sphere = (kind == KIND_SPHERE)[:, None]
    n_obj = jnp.where(is_sphere, n_sph, n_pl)
    uvw = jnp.where(is_sphere, uv_sph, uv_pl)
    front = jnp.sum(n_obj * d_obj, axis=-1) <= 0.0

    # World-space position and normal (Node::FromNodeCoords).
    hp_world = p + t[:, None] * d
    n_world = normalize(jnp.einsum("bji,bj->bi", m, n_obj, precision="highest"), eps=1e-30)
    return {
        "p": hp_world,
        "n": n_world,
        "uvw": uvw,
        "front": front,
        "mtl": prims.mtl[prim_idx],
        "has_texture": jnp.ones_like(front),
    }


def analytic_diff_uv(p, d, px, dx, py, dy, t, prim_idx, prims: AnalyticPrims,
                     uvw):
    """Texture-coordinate derivatives from differential rays.

    Port of the diff-hit blocks of Sphere/Plane::IntersectRay
    (objects.cpp:107-135, 174-202): each offset ray is intersected with the
    hit primitive's local plane (tangent plane at the hit for spheres, z=0
    for planes) and duvw = RCP_DX * (uv_offset - uv). All in object space.
    Returns (duvw0, duvw1) [B, 3].
    """
    from qaray_tpu.core.constants import RCP_DX, RCP_DY

    m = prims.m_w2o[prim_idx]
    t0 = prims.t_o2w[prim_idx]
    kind = prims.kind[prim_idx]

    def to_obj(pw, dw):
        return (
            jnp.einsum("bij,bj->bi", m, pw - t0, precision="highest"),
            jnp.einsum("bij,bj->bi", m, dw, precision="highest"),
        )

    p_obj, d_obj = to_obj(p, d)
    hp = p_obj + t[:, None] * d_obj

    is_sphere = (kind == KIND_SPHERE)
    # Local plane normal: sphere -> hit normal (tangent plane); plane -> +z.
    n_sph = normalize(hp, eps=1e-30)
    n_pl = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], p.dtype), n_sph.shape)
    n_loc = jnp.where(is_sphere[:, None], n_sph, n_pl)
    # Plane anchor: sphere tangent plane passes through hp; unit plane z=0.
    anchor = jnp.where(is_sphere[:, None], hp, jnp.zeros_like(hp))

    def offset_uv(pw, dw):
        po, do = to_obj(pw, dw)
        denom = jnp.sum(do * n_loc, axis=-1)
        denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        t_off = -jnp.sum((po - anchor) * n_loc, axis=-1) / denom
        hpo = po + t_off[:, None] * do
        # Sphere UV at the tangent-plane point, radius-corrected asin
        # (Sphere_TexCoord with rcp_l = 1/|p|, objects.cpp:122-125).
        r = jnp.sqrt(jnp.maximum(jnp.sum(hpo * hpo, axis=-1), 1e-30))
        uv_s = jnp.stack(
            [
                0.5 - jnp.arctan2(hpo[..., 0], hpo[..., 1]) / (2.0 * jnp.pi),
                0.5 + jnp.arcsin(jnp.clip(hpo[..., 2] / r, -1.0, 1.0)) / jnp.pi,
                jnp.zeros_like(t_off),
            ],
            axis=-1,
        )
        uv_p = jnp.stack(
            [
                (hpo[..., 0] + 1.0) * 0.5,
                (hpo[..., 1] + 1.0) * 0.5,
                jnp.zeros_like(t_off),
            ],
            axis=-1,
        )
        return jnp.where(is_sphere[:, None], uv_s, uv_p)

    duvw0 = RCP_DX * (offset_uv(px, dx) - uvw)
    duvw1 = RCP_DY * (offset_uv(py, dy) - uvw)
    return duvw0, duvw1


def intersect_triangles(p_obj, d_obj, v0, v1, v2, t_max):
    """Batched triangle test (objects/objects.cpp:212-248).

    All inputs [B, ...]; returns (t [B], bary [B,3], front [B], hit [B]).
    Uses the reference's dominant-axis 2D-area barycentric construction.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    n = jnp.cross(e1, e2)  # unnormalized face normal
    dz = jnp.sum(d_obj * n, axis=-1)
    pz = jnp.sum((p_obj - v0) * n, axis=-1)
    safe_dz = jnp.where(jnp.abs(dz) < 1e-30, 1e-30, dz)
    t = -pz / safe_dz
    # Normalization of N cancels in t; parallel guard matches |dot(dir, n̂)|<1e-7.
    n_len = jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1), 1e-30))
    parallel = jnp.abs(dz) / n_len < 1e-7

    hp = p_obj + t[:, None] * d_obj

    def area(axis, a, b, c):
        i, j = {0: (1, 2), 1: (0, 2), 2: (0, 1)}[axis]
        return (b[..., i] - a[..., i]) * (c[..., j] - a[..., j]) - (
            c[..., i] - a[..., i]
        ) * (b[..., j] - a[..., j])

    abs_n = jnp.abs(n)
    axis0 = (abs_n[..., 0] > abs_n[..., 1]) & (abs_n[..., 0] > abs_n[..., 2])
    axis1 = (~axis0) & (abs_n[..., 1] > abs_n[..., 2])

    def baryc(axis):
        s = area(axis, v0, v1, v2)
        s = jnp.where(jnp.abs(s) < 1e-30, 1e-30, s)
        a = area(axis, hp, v1, v2) / s
        b = area(axis, hp, v2, v0) / s
        return a, b

    a0, b0 = baryc(0)
    a1, b1 = baryc(1)
    a2, b2 = baryc(2)
    a = jnp.where(axis0, a0, jnp.where(axis1, a1, a2))
    b = jnp.where(axis0, b0, jnp.where(axis1, b1, b2))
    c = 1.0 - a - b

    inside = (a >= 0.0) & (b >= 0.0) & (c >= 0.0)
    hit = (~parallel) & (t > BIAS) & (t < t_max) & inside
    front = dz <= 0.0
    bary = jnp.stack([a, b, c], axis=-1)
    return jnp.where(hit, t, BIGFLOAT), bary, front, hit
