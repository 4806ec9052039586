"""Pallas TPU megakernel: the ENTIRE pathtrace dispatch in one kernel.

Round-3 profiling showed the box-scene bench spends its time in dozens of
separate XLA elementwise passes per bounce (~17 GB/s effective on this
runtime) — only intersection was fused. This kernel keeps every per-bounce
stage resident in VMEM/registers for an [R, 128] ray block:

    camera ray-gen (Halton jitter + optional DoF lens)
  → per bounce: fused analytic closest-hit (+ material fold-in)
              → Fresnel → lobe select/sample → NEE shadow rays
              → emission/direct accumulate → beta update
  → radiance + primary depth written once.

HBM traffic is O(B) total (px/py/sid in, rgb+t0 out) instead of O(B) per
elementwise pass; random draws are generated in-kernel with the threefry
primitives from core/krng.py, bit-exact against the XLA wavefront engine's
jax.random chain (core/rng.py) when the caller's key is threefry2x32 —
so the kernel computes the SAME function as the XLA path, validated in
tests/test_megakernel.py. With an 'rbg' key the lane keys are derived by
xor-folding the 4 rbg words (deterministic, statistically equivalent, not
bit-equal to the XLA rbg path).

Semantics ported (file:line = reference):
  - camera basis / jitter / DoF   renderer.cpp:302-327, scene/scene.cpp:99-111
  - sphere/plane intersection     objects/objects.cpp:55-208 (bias 0.005)
  - triangle mesh sweep           objects/objects.cpp:212-306 predicate as
    the linear-in-t coefficients of ops/mesh_stream.py, Morton-clustered
    in VMEM with block-level conservative cluster culling; smooth normals
    + per-face material row folded during the sweep
  - MtlBlinn_PathTracing::Shade   materials/MtlBlinn_PathTracing.cpp:69-300
    (colorMax 4-way RR with pdf division, double-1/L direct quirk,
    cosine-lobe glossy sampling, no absorption)
  - MtlBlinn_PhotonMap::Shade     materials/MtlBlinn_PhotonMap.cpp:65-254
    (luma 4-way RR with kill=0.1, selection prob NOT divided out,
    hasDiffuseHit gating, Beer back-face absorption, 4x4-attempt
    UniformBall-quirk glossy jitter) — the reference's default MtlBlinn
  - GenLight family               lights/lights.cpp:39-144 (hard + adaptive
    16->64 soft shadows with the in-loop-falloff recurrence, spot cone;
    consecutive same-kind lights collapse into one in-kernel fori)

Scope (engagement gated in integrators/engine.py use_pathtrace_mega):
pathtrace or photonmap integrator; analytic prims plus world-baked meshes
up to 16k triangles / 8 distinct face materials; no live textures; no
photon-map gathering. Everything else stays on the wavefront engine.
Backward: the custom_vjp re-runs the XLA engine's VJP (same draws under
threefry => gradient of the same function).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qaray_tpu.core.constants import (
    BIAS,
    BIGFLOAT,
    PLANE_EPS,
    TOTAL_REFLECTION_THRESHOLD,
)
from qaray_tpu.core.krng import draw_at, fold2
from qaray_tpu.core import rng as RNG
from qaray_tpu.scene.arrays import (
    KIND_SPHERE,
    LIGHT_AMBIENT,
    LIGHT_DIRECT,
    LIGHT_SPOT,
)

LANES = 128
BLOCK_ROWS = 32  # 4096 rays per grid step (amortizes scalar table reads)


# ---------------------------------------------------------------------------
# 3-vector helpers on component triples of [R, 128] tiles
# ---------------------------------------------------------------------------


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _norm3(a, eps=0.0):
    n2 = _dot3(a, a)
    if eps:
        n2 = jnp.maximum(n2, eps)
    inv = jnp.reciprocal(jnp.sqrt(n2))
    return (a[0] * inv, a[1] * inv, a[2] * inv)


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _mul3(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def _neg3(a):
    return (-a[0], -a[1], -a[2])


def _where3(m, a, b):
    return (
        jnp.where(m, a[0], b[0]),
        jnp.where(m, a[1], b[1]),
        jnp.where(m, a[2], b[2]),
    )


def _max3(a):
    return jnp.maximum(a[0], jnp.maximum(a[1], a[2]))


def _luma3(a):
    from qaray_tpu.core.constants import LUMA_B, LUMA_G, LUMA_R

    return LUMA_R * a[0] + LUMA_G * a[1] + LUMA_B * a[2]


def _pow_safe(base, e):
    return jnp.power(jnp.maximum(base, 1e-6), e)


def _to_local_frame(n, s):
    """Port of core.vecmath.to_local_frame (math/math.cpp:37-46)."""
    zx, zy, zz = n
    use_a = jnp.abs(zx) > jnp.abs(zy)
    zero = jnp.zeros_like(zx)
    ya = (zz, zero, -zx)
    yb = (zero, -zz, zy)
    y = _norm3(_where3(use_a, ya, yb))
    x = _norm3(_cross3(y, n))
    u = _norm3(s)
    return (
        u[0] * x[0] + u[1] * y[0] + u[2] * n[0],
        u[0] * x[1] + u[1] * y[1] + u[2] * n[1],
        u[0] * x[2] + u[1] * y[2] + u[2] * n[2],
    )


def _atan_poly(z):
    """atan on [-1, 1]: Abramowitz-Stegun 4.4.49 polynomial, |err|<=2e-8.

    Mosaic has no atan2/asin intrinsics (CLAUDE.md); the sphere UV math
    (objects/objects.cpp:48-53) runs on this instead. f32 round-off
    dominates the 2e-8 polynomial error.
    """
    z2 = z * z
    p = jnp.float32(0.0028662257)
    for c in (-0.0161657367, 0.0429096138, -0.0752896400, 0.1065626393,
              -0.1420889944, 0.1999355085, -0.3333314528):
        p = p * z2 + jnp.float32(c)
    return z * (p * z2 + 1.0)


def _atan2(y, x):
    """atan2(y, x) via the octant reduction of _atan_poly."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    z = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    a = _atan_poly(z)
    a = jnp.where(ay > ax, jnp.float32(0.5 * np.pi) - a, a)
    a = jnp.where(x < 0.0, jnp.float32(np.pi) - a, a)
    return jnp.where(y < 0.0, -a, a)


def _asin(z):
    z = jnp.clip(z, -1.0, 1.0)
    return _atan2(z, jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0)))


def _halton(i, base: int, iters: int = 10):
    """Radical inverse, same digit count as core.halton.halton."""
    r = jnp.zeros(i.shape, jnp.float32)
    f = jnp.full(i.shape, 1.0 / base, jnp.float32)
    for _ in range(iters):
        r = r + f * (i % jnp.int32(base)).astype(jnp.float32)
        f = f / base
        i = i // jnp.int32(base)
    return r


# ---------------------------------------------------------------------------
# Scene-table scalar accessors (VMEM refs -> python dicts of scalars)
# ---------------------------------------------------------------------------

# mtl table columns
_MT_DIFF, _MT_SPEC, _MT_EMIT, _MT_REFL, _MT_REFR = 0, 3, 6, 9, 12
_MT_GLOSS, _MT_RGLOSS, _MT_TGLOSS, _MT_IOR = 15, 16, 17, 18
_MT_ABS = 19
MTL_COLS = 22
# Optional per-slot checker-texture columns (appended when the scene has
# live textures and meta.mega_tex_ok): for each of the 5 color slots, 16
# cols [has, color1(3), color2(3), tex_m row0(3), row1(3), tex_t(3)].
_MT_TEXBASE = 22
_TEX_STRIDE = 16
_SLOT_NAMES = ("diffuse", "specular", "emission", "reflection",
               "refraction")

# light table columns
_LT_INT, _LT_POS, _LT_DIR, _LT_SIZE, _LT_INNER, _LT_OUTER = 0, 3, 6, 9, 10, 11
LIGHT_COLS = 12

# camera/env params vector layout
_CAM_POS, _CAM_A, _CAM_U, _CAM_V, _CAM_X, _CAM_Y = 0, 3, 6, 9, 12, 15
_CAM_DOF, _CAM_BG, _CAM_ENV = 18, 19, 22
CAM_COLS = 25


def _v3(ref, row, col):
    return (ref[row, col], ref[row, col + 1], ref[row, col + 2])


# ---------------------------------------------------------------------------
# Megakernel mesh tables (host build)
# ---------------------------------------------------------------------------

MEGA_CLUSTER = 256  # triangles per cull cluster


def build_mega_mesh(tri_v, tri_n, tri_mtl, cluster: int = MEGA_CLUSTER):
    """World-baked triangles -> (coeff16 [Fp,16], attr16 [Fp,16],
    cbounds [C,8]) for the in-kernel mesh sweep.

    Rows are Morton-ordered by centroid (tight cluster AABBs for the
    block-level cull); coeff16 is the pack_coeff16 layout of
    ops/pallas_mesh.py; attr16 carries the winner-fold shading attributes:
    cols 0-8 the three (unnormalized, world) corner normals, col 9 the
    material table row. Padding rows never hit (all-zero coefficients).
    """
    from qaray_tpu.ops.mesh_stream import build_stream
    from qaray_tpu.ops.mesh_tiles import _morton3
    from qaray_tpu.ops.pallas_mesh import pack_coeff16

    tri_v = np.asarray(tri_v, np.float32)
    num = tri_v.shape[0]
    order = np.argsort(_morton3(tri_v.mean(axis=1)), kind="stable")
    sv = tri_v[order]
    sn = np.asarray(tri_n, np.float32)[order]
    sm = np.asarray(tri_mtl, np.int32)[order]
    stream = build_stream(sv, chunk=cluster)
    c16 = pack_coeff16(stream.coeff, stream.const)[: stream.coeff.shape[0]]
    fp = c16.shape[0]
    attr = np.zeros((fp, 16), np.float32)
    attr[:num, 0:9] = sn.reshape(num, 9)
    attr[:num, 9] = sm.astype(np.float32)
    nc = fp // cluster
    cb = np.zeros((nc, 8), np.float32)
    for c in range(nc):
        rows = sv[c * cluster : (c + 1) * cluster]
        if rows.size == 0:
            cb[c, 0:3] = 1.0
            cb[c, 3:6] = -1.0  # empty box: never hit
        else:
            cb[c, 0:3] = rows.reshape(-1, 3).min(axis=0)
            cb[c, 3:6] = rows.reshape(-1, 3).max(axis=0)
    return c16, attr, cb


def _bundle_bounds(p, d):
    """Conservative scalar bounds of a ray block for cluster culling.

    Same interval-arithmetic discipline as ops/mesh_tiles._packet_cull
    (proof there): returns per-axis scalars (o_lo, o_hi, r_lo, r_hi, mixed)
    where [r_lo, r_hi] brackets every lane's reciprocal direction and
    `mixed` marks axes whose direction interval spans zero (fully
    conservative)."""
    eps = 1e-7
    out = []
    for k in range(3):
        o_lo = jnp.min(p[k])
        o_hi = jnp.max(p[k])
        d_lo = jnp.min(d[k])
        d_hi = jnp.max(d[k])
        mixed = (d_lo < eps) & (d_hi > -eps)
        safe_lo = jnp.where(jnp.abs(d_lo) < eps, eps, d_lo)
        safe_hi = jnp.where(jnp.abs(d_hi) < eps, eps, d_hi)
        r1 = 1.0 / safe_lo
        r2 = 1.0 / safe_hi
        out.append((o_lo, o_hi, jnp.minimum(r1, r2), jnp.maximum(r1, r2),
                    mixed))
    return out


def _cluster_overlaps(cb_ref, c, bnd, t_hi):
    """Scalar: may any lane of the block hit cluster `c` within t_hi?"""
    entry = jnp.float32(-BIGFLOAT)
    exit_ = jnp.float32(BIGFLOAT)
    for k in range(3):
        o_lo, o_hi, r_lo, r_hi, mixed = bnd[k]
        bmin = cb_ref[c, k]
        bmax = cb_ref[c, 3 + k]
        lo_k = jnp.float32(BIGFLOAT)
        hi_k = jnp.float32(-BIGFLOAT)
        for b in (bmin, bmax):
            a_lo = b - o_hi
            a_hi = b - o_lo
            for prod in (a_lo * r_lo, a_lo * r_hi, a_hi * r_lo, a_hi * r_hi):
                lo_k = jnp.minimum(lo_k, prod)
                hi_k = jnp.maximum(hi_k, prod)
        lo_k = jnp.where(mixed, -BIGFLOAT, lo_k)
        hi_k = jnp.where(mixed, BIGFLOAT, hi_k)
        entry = jnp.maximum(entry, lo_k)
        exit_ = jnp.minimum(exit_, hi_k)
    nonempty = (cb_ref[c, 0] <= cb_ref[c, 3]) & (cb_ref[c, 1] <= cb_ref[c, 4]) \
        & (cb_ref[c, 2] <= cb_ref[c, 5])
    return (entry <= exit_) & (exit_ > BIAS) & (entry < t_hi) & nonempty


def _mesh_tri_test(c16_ref, row, p, d, col0: int = 0):
    """Sweep predicate for one triangle row vs the block ([R,128] lanes).

    Same linear-in-t math as ops/pallas_mesh._sweep_kernel; returns
    (t or BIGFLOAT, a, b, dn) — a/b are the v0/v1 barycentric weights,
    dn = d . n decides the front flag (objects/objects.cpp:212-248).
    col0: static column offset — 0 for the [Fp,16] VMEM table, 16*k for
    triangle k of a [Fp/8, 128] packed slab row."""
    nx = c16_ref[row, col0 + 0]
    ny = c16_ref[row, col0 + 1]
    nz = c16_ref[row, col0 + 2]
    ax = c16_ref[row, col0 + 3]
    ay = c16_ref[row, col0 + 4]
    az = c16_ref[row, col0 + 5]
    bx = c16_ref[row, col0 + 6]
    by = c16_ref[row, col0 + 7]
    bz = c16_ref[row, col0 + 8]
    kk = c16_ref[row, col0 + 9]
    a0 = c16_ref[row, col0 + 10]
    b0 = c16_ref[row, col0 + 11]
    nl = c16_ref[row, col0 + 12]
    pn = p[0] * nx + p[1] * ny + p[2] * nz
    dn = d[0] * nx + d[1] * ny + d[2] * nz
    pa = p[0] * ax + p[1] * ay + p[2] * az
    da = d[0] * ax + d[1] * ay + d[2] * az
    pb = p[0] * bx + p[1] * by + p[2] * bz
    db = d[0] * bx + d[1] * by + d[2] * bz
    safe = jnp.where(jnp.abs(dn) < 1e-30, 1e-30, dn)
    t = (kk - pn) / safe
    parallel = jnp.abs(dn) < 1e-7 * nl
    a = pa + t * da + a0
    b = pb + t * db + b0
    cc = 1.0 - a - b
    ok = (~parallel) & (t > BIAS) & (a >= 0.0) & (b >= 0.0) & (cc >= 0.0)
    return jnp.where(ok, t, BIGFLOAT), a, b, dn


# ---------------------------------------------------------------------------
# Geometry: analytic closest-hit / any-hit, unrolled over static prim kinds
# ---------------------------------------------------------------------------


def _prim_t(kind, po, do):
    """Hit distance vs unit sphere / unit-square plane in object space.

    Same math as ops/pallas_analytic._kernel (objects/objects.cpp:55-208).
    """
    if kind == KIND_SPHERE:
        a = _dot3(do, do)
        b = 2.0 * _dot3(po, do)
        c = _dot3(po, po) - 1.0
        delta = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(delta, 0.0))
        rcp2a = 0.5 / a
        t1 = (-b - sq) * rcp2a
        t2 = (-b + sq) * rcp2a
        t_hit = jnp.where(t1 > BIAS, t1, jnp.where(t2 > BIAS, t2, BIGFLOAT))
        return jnp.where(delta >= 0.0, t_hit, BIGFLOAT)
    safe = jnp.where(jnp.abs(do[2]) < PLANE_EPS, jnp.inf, do[2])
    t_hit = -po[2] / safe
    hx = po[0] + t_hit * do[0]
    hy = po[1] + t_hit * do[1]
    ok = (jnp.abs(hx) <= 1.0) & (jnp.abs(hy) <= 1.0) & (t_hit > BIAS)
    return jnp.where(ok, t_hit, BIGFLOAT)


def _obj_ray(prim_ref, prim, p, d):
    """Transform a world ray into primitive `prim`'s object space."""
    m = [prim_ref[prim, k] for k in range(9)]
    t = (prim_ref[prim, 9], prim_ref[prim, 10], prim_ref[prim, 11])
    rel = _sub3(p, t)
    po = (
        m[0] * rel[0] + m[1] * rel[1] + m[2] * rel[2],
        m[3] * rel[0] + m[4] * rel[1] + m[5] * rel[2],
        m[6] * rel[0] + m[7] * rel[1] + m[8] * rel[2],
    )
    do = (
        m[0] * d[0] + m[1] * d[1] + m[2] * d[2],
        m[3] * d[0] + m[4] * d[1] + m[5] * d[2],
        m[6] * d[0] + m[7] * d[1] + m[8] * d[2],
    )
    return m, po, do


def _shadow_occluded(kinds, prim_ref, p, d, t_max, mesh=None):
    """Any-hit over all prims + (optionally) the mesh: BIAS < t < t_max
    (GenLight::Shadow). mesh: (c16_ref, attr_ref, cb_ref, n_clusters,
    stream_ctx) — stream_ctx None for VMEM-resident tables, else
    (sc_c16, sc_attr, sem) scratch for cluster-DMA streaming."""
    occ = jnp.zeros(p[0].shape, jnp.bool_)
    for prim in range(len(kinds)):
        _, po, do = _obj_ray(prim_ref, prim, p, d)
        occ = occ | (_prim_t(kinds[prim], po, do) < t_max)
    if mesh is not None:
        c16_ref, _, cb_ref, n_clusters, stream_ctx = mesh
        bnd = _bundle_bounds(p, d)
        # Mosaic cannot carry i1 vectors through scf.for: occlusion rides
        # the loop as f32 0/1.
        occf = occ.astype(jnp.float32)

        def cluster(c, occf):
            t_hi = jnp.max(jnp.where(occf > 0.5, 0.0, t_max))
            cond = _cluster_overlaps(cb_ref, c, bnd, t_hi)

            def run(occf):
                if stream_ctx is None:
                    def tri(j, occf):
                        t, _, _, _ = _mesh_tri_test(
                            c16_ref, c * MEGA_CLUSTER + j, p, d
                        )
                        return jnp.maximum(
                            occf, jnp.where(t < t_max, 1.0, 0.0)
                        )

                    return jax.lax.fori_loop(0, MEGA_CLUSTER, tri, occf)
                sc_c16, _, sem = stream_ctx
                slab = MEGA_CLUSTER // 8
                dma = pltpu.make_async_copy(
                    c16_ref.at[pl.ds(c * slab, slab), :], sc_c16, sem
                )
                dma.start()
                dma.wait()

                def r8_body(r8, occf):
                    for k in range(8):
                        t, _, _, _ = _mesh_tri_test(sc_c16, r8, p, d,
                                                    col0=16 * k)
                        occf = jnp.maximum(
                            occf, jnp.where(t < t_max, 1.0, 0.0)
                        )
                    return occf

                return jax.lax.fori_loop(0, slab, r8_body, occf)

            return jax.lax.cond(cond, run, lambda o: o, occf)

        occf = jax.lax.fori_loop(0, n_clusters, cluster, occf)
        occ = occf > 0.5
    return occ


def _closest_hit(kinds, mtls, prim_ref, mtl_ref, p, d, mesh=None,
                 mesh_mtls=(), tex_slots=(), diff=None, want_row=False):
    """Fused closest hit + winner attributes + material fold-in.

    Returns dict of [R,128] tiles: t, hit, n (world, unit), front, hp (world
    hit point at benign t), and the winner's material samples. Miss lanes get
    the same benign defaults as ops/pallas_analytic._kernel_full (n=(0,0,1),
    front=True, material of the first primitive).

    mesh: optional (c16_ref, attr_ref, cb_ref, n_clusters) — the VMEM mesh
    sweep with block-level cluster culling; winner normals (smooth,
    barycentric over the attr table's corner normals) and the material row
    id are folded during the sweep, and params merged afterwards against
    the static mesh_mtls tuple.

    tex_slots: static 5-bool tuple — when any is set, the winner's texture
    coordinates (Sphere_TexCoord/Plane_TexCoord, objects.cpp:48-53,144-147)
    are folded into "uv" and the per-slot checker columns ride the material
    merge. diff: optional (px, dx, py, dy) differential camera rays (each a
    component triple) — adds "duv0"/"duv1" texture footprints via the
    reference's tangent-plane differential hits (objects.cpp:107-202).
    """
    shape = p[0].shape
    t_best = jnp.full(shape, BIGFLOAT, jnp.float32)
    n_b = (jnp.zeros(shape), jnp.zeros(shape), jnp.ones(shape))
    # front carried as f32 0/1: Mosaic cannot select between i1 vectors.
    front_b = jnp.ones(shape, jnp.float32)
    want_uv = any(tex_slots)
    zero = jnp.zeros(shape)
    uv_b = (zero, zero)
    duv0_b = (zero, zero)
    duv1_b = (zero, zero)
    # Winner's material-table row (f32; the adjoint kernel masks its
    # per-row parameter accumulators with this).
    row_b = jnp.full(shape, float(mtls[0] if mtls else 0), jnp.float32)

    def mtl_row(row):
        out = {
            "diffuse": _v3(mtl_ref, row, _MT_DIFF),
            "specular": _v3(mtl_ref, row, _MT_SPEC),
            "emission": _v3(mtl_ref, row, _MT_EMIT),
            "reflection": _v3(mtl_ref, row, _MT_REFL),
            "refraction": _v3(mtl_ref, row, _MT_REFR),
            "absorption": _v3(mtl_ref, row, _MT_ABS),
            "glossiness": mtl_ref[row, _MT_GLOSS],
            "rgloss": mtl_ref[row, _MT_RGLOSS],
            "tgloss": mtl_ref[row, _MT_TGLOSS],
            "ior": mtl_ref[row, _MT_IOR],
        }
        for s, flag in enumerate(tex_slots):
            if not flag:
                continue
            base = _MT_TEXBASE + _TEX_STRIDE * s
            out[f"tx{s}_has"] = mtl_ref[row, base]
            out[f"tx{s}_c1"] = _v3(mtl_ref, row, base + 1)
            out[f"tx{s}_c2"] = _v3(mtl_ref, row, base + 4)
            out[f"tx{s}_m0"] = _v3(mtl_ref, row, base + 7)
            out[f"tx{s}_m1"] = _v3(mtl_ref, row, base + 10)
            out[f"tx{s}_t"] = _v3(mtl_ref, row, base + 13)
        return out

    def bcast(mrow):
        out = {}
        for k, v in mrow.items():
            if isinstance(v, tuple):
                out[k] = tuple(jnp.full(shape, c) for c in v)
            else:
                out[k] = jnp.full(shape, v)
        return out

    mtl_b = bcast(mtl_row(mtls[0] if mtls else mesh_mtls[0]))

    for prim in range(len(kinds)):
        m, po, do = _obj_ray(prim_ref, prim, p, d)
        t_hit = _prim_t(kinds[prim], po, do)
        take = t_hit < t_best
        t_eval = jnp.where(t_hit < BIGFLOAT, t_hit, 1.0)
        hp = _add3(po, _scale3(do, t_eval))
        if kinds[prim] == KIND_SPHERE:
            n_obj = _norm3(hp, eps=1e-30)
        else:
            n_obj = (zero, zero, jnp.ones(shape))
        if want_uv:
            inv_2pi = jnp.float32(0.5 / np.pi)
            inv_pi = jnp.float32(1.0 / np.pi)
            if kinds[prim] == KIND_SPHERE:
                u_p = 0.5 - _atan2(hp[0], hp[1]) * inv_2pi
                v_p = 0.5 + _asin(n_obj[2]) * inv_pi
            else:
                u_p = (hp[0] + 1.0) * 0.5
                v_p = (hp[1] + 1.0) * 0.5
            uv_b = (
                jnp.where(take, u_p, uv_b[0]),
                jnp.where(take, v_p, uv_b[1]),
            )
            if diff is not None:
                # Differential hits on the local tangent plane
                # (objects.cpp:107-135 spheres, :174-202 planes).
                if kinds[prim] == KIND_SPHERE:
                    n_loc, anchor = n_obj, hp
                else:
                    n_loc, anchor = n_obj, (zero, zero, zero)

                def off_uv(pd, dd, _prim=prim, _n=n_loc, _a=anchor):
                    _, po2, do2 = _obj_ray(prim_ref, _prim, pd, dd)
                    den = _dot3(do2, _n)
                    den = jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
                    t_off = -_dot3(_sub3(po2, _a), _n) / den
                    hpo = _add3(po2, _scale3(do2, t_off))
                    if kinds[_prim] == KIND_SPHERE:
                        r = jnp.sqrt(jnp.maximum(_dot3(hpo, hpo), 1e-30))
                        uo = 0.5 - _atan2(hpo[0], hpo[1]) * inv_2pi
                        vo = 0.5 + _asin(hpo[2] / r) * inv_pi
                    else:
                        uo = (hpo[0] + 1.0) * 0.5
                        vo = (hpo[1] + 1.0) * 0.5
                    return uo, vo

                from qaray_tpu.core.constants import RCP_DX, RCP_DY

                u0o, v0o = off_uv(diff[0], diff[1])
                u1o, v1o = off_uv(diff[2], diff[3])
                duv0_b = (
                    jnp.where(take, RCP_DX * (u0o - u_p), duv0_b[0]),
                    jnp.where(take, RCP_DX * (v0o - v_p), duv0_b[1]),
                )
                duv1_b = (
                    jnp.where(take, RCP_DY * (u1o - u_p), duv1_b[0]),
                    jnp.where(take, RCP_DY * (v1o - v_p), duv1_b[1]),
                )
        front_p = jnp.where(_dot3(n_obj, do) <= 0.0, 1.0, 0.0)
        # World normal: normalize(M_w2o^T n_obj) (core/transform.cpp:49-56).
        nw = (
            m[0] * n_obj[0] + m[3] * n_obj[1] + m[6] * n_obj[2],
            m[1] * n_obj[0] + m[4] * n_obj[1] + m[7] * n_obj[2],
            m[2] * n_obj[0] + m[5] * n_obj[1] + m[8] * n_obj[2],
        )
        nw = _norm3(nw, eps=1e-30)

        t_best = jnp.where(take, t_hit, t_best)
        n_b = _where3(take, nw, n_b)
        front_b = jnp.where(take, front_p, front_b)
        if want_row:
            row_b = jnp.where(take, float(mtls[prim]), row_b)
        mrow = mtl_row(mtls[prim])
        for k, v in mrow.items():
            if isinstance(v, tuple):
                mtl_b[k] = _where3(take, tuple(jnp.full(shape, c) for c in v),
                                   mtl_b[k])
            else:
                mtl_b[k] = jnp.where(take, v, mtl_b[k])

    if mesh is not None:
        c16_ref, attr_ref, cb_ref, n_clusters, stream_ctx = mesh
        bnd = _bundle_bounds(p, d)
        mid_b = jnp.full(shape, -1.0, jnp.float32)

        def _fold_tri(carry, cref, aref, row, col0):
            t_b, nx, ny, nz, fr, mid = carry
            t, a, b, dn = _mesh_tri_test(cref, row, p, d, col0=col0)
            take = t < t_b
            cc = 1.0 - a - b
            # Smooth normal: a*n0 + b*n1 + c*n2 (the bary weights of
            # intersect_triangles; TriObj::IntersectTriangle).
            nwx = a * aref[row, col0 + 0] + b * aref[row, col0 + 3] \
                + cc * aref[row, col0 + 6]
            nwy = a * aref[row, col0 + 1] + b * aref[row, col0 + 4] \
                + cc * aref[row, col0 + 7]
            nwz = a * aref[row, col0 + 2] + b * aref[row, col0 + 5] \
                + cc * aref[row, col0 + 8]
            return (
                jnp.where(take, t, t_b),
                jnp.where(take, nwx, nx),
                jnp.where(take, nwy, ny),
                jnp.where(take, nwz, nz),
                jnp.where(take, jnp.where(dn <= 0.0, 1.0, 0.0), fr),
                jnp.where(take, aref[row, col0 + 9], mid),
            )

        def cluster(c, carry):
            t_b = carry[0]
            cond = _cluster_overlaps(cb_ref, c, bnd, jnp.max(t_b))

            def run(carry):
                if stream_ctx is None:
                    def tri(j, carry):
                        return _fold_tri(carry, c16_ref, attr_ref,
                                         c * MEGA_CLUSTER + j, 0)

                    return jax.lax.fori_loop(0, MEGA_CLUSTER, tri, carry)
                sc_c16, sc_attr, sem = stream_ctx
                slab = MEGA_CLUSTER // 8
                for src, dst in ((c16_ref, sc_c16), (attr_ref, sc_attr)):
                    dma = pltpu.make_async_copy(
                        src.at[pl.ds(c * slab, slab), :], dst, sem
                    )
                    dma.start()
                    dma.wait()

                def r8_body(r8, carry):
                    for k in range(8):
                        carry = _fold_tri(carry, sc_c16, sc_attr, r8, 16 * k)
                    return carry

                return jax.lax.fori_loop(0, slab, r8_body, carry)

            return jax.lax.cond(cond, run, lambda x: x, carry)

        t_best, nx, ny, nz, front_b, mid_b = jax.lax.fori_loop(
            0, n_clusters, cluster,
            (t_best, n_b[0], n_b[1], n_b[2], front_b, mid_b),
        )
        n_b = _norm3((nx, ny, nz), eps=1e-30)
        if want_row:
            # Mesh winners carry their material-table row in the attr fold.
            row_b = jnp.where(mid_b >= 0.0, mid_b, row_b)
        # Material merge for mesh winners: static compare per distinct row.
        for mrow in mesh_mtls:
            m = mid_b == float(mrow)
            row_vals = mtl_row(mrow)
            for k, v in row_vals.items():
                if isinstance(v, tuple):
                    mtl_b[k] = _where3(
                        m, tuple(jnp.full(shape, c) for c in v), mtl_b[k]
                    )
                else:
                    mtl_b[k] = jnp.where(m, v, mtl_b[k])

    hit = t_best < BIGFLOAT
    t_eval = jnp.where(hit, t_best, 1.0)
    hp_world = _add3(p, _scale3(d, t_eval))
    out = {
        "t": t_best,
        "hit": hit,
        "n": n_b,
        "front": front_b > 0.5,
        "hp": hp_world,
        "mtl": mtl_b,
    }
    if want_uv:
        out["uv"] = uv_b
        if diff is not None:
            out["duv0"] = duv0_b
            out["duv1"] = duv1_b
    if want_row:
        out["row"] = row_b
    return out


def _texture_offsets():
    """Static Halton(2,3) elliptic footprint offsets — same 31 points as
    ops/texture._elliptic_offsets (core/texture.cpp:38-44)."""
    from qaray_tpu.core.halton import halton_np

    i = np.arange(1, 32)
    hx = halton_np(i, 2)
    hy = halton_np(i, 3)
    r = np.sqrt(hx) * 0.5
    return (
        (r * np.sin(hy * 2.0 * np.pi)).astype(np.float32),
        (r * np.cos(hy * 2.0 * np.pi)).astype(np.float32),
    )


def _apply_checker_textures(mtl, uv, duv, tex_slots):
    """In-kernel TexturedColor::Sample for checker maps.

    Point sample = textures/texture.cpp:129-137 after the TextureMap
    transform (core/texture.cpp:67-82). With duv (primary hits), the
    reference's 32-sample elliptic footprint filter (core/texture.cpp:
    32-52) collapses to a closed form for checkers: the mean of 32
    two-valued samples is mix(color2, color1, hit_fraction).
    """
    mtl = dict(mtl)
    for s, nm in enumerate(_SLOT_NAMES):
        if not tex_slots[s]:
            continue
        tm0 = mtl[f"tx{s}_m0"]
        tm1 = mtl[f"tx{s}_m1"]
        tt = mtl[f"tx{s}_t"]
        pu = uv[0] - tt[0]
        pv = uv[1] - tt[1]
        pw = -tt[2]
        um = tm0[0] * pu + tm0[1] * pv + tm0[2] * pw
        vm = tm1[0] * pu + tm1[1] * pv + tm1[2] * pw

        def chk01(u_, v_):
            ut = u_ - jnp.floor(u_)
            vt = v_ - jnp.floor(v_)
            return jnp.where((ut <= 0.5) == (vt <= 0.5), 1.0, 0.0)

        w1 = chk01(um, vm)
        if duv is not None:
            duv0, duv1 = duv
            d0u = tm0[0] * duv0[0] + tm0[1] * duv0[1]
            d0v = tm1[0] * duv0[0] + tm1[1] * duv0[1]
            d1u = tm0[0] * duv1[0] + tm0[1] * duv1[1]
            d1v = tm1[0] * duv1[0] + tm1[1] * duv1[1]
            xs, ys = _texture_offsets()
            acc = w1
            for i in range(31):
                acc = acc + chk01(
                    um + float(xs[i]) * d0u + float(ys[i]) * d1u,
                    vm + float(xs[i]) * d0v + float(ys[i]) * d1v,
                )
            zf = (
                duv0[0] * duv0[0] + duv0[1] * duv0[1]
                + duv1[0] * duv1[0] + duv1[1] * duv1[1]
            ) == 0.0
            w1 = jnp.where(zf, w1, acc * (1.0 / 32.0))
        c1 = mtl[f"tx{s}_c1"]
        c2 = mtl[f"tx{s}_c2"]
        has = mtl[f"tx{s}_has"] > 0.5
        mtl[nm] = tuple(
            jnp.where(
                has,
                mtl[nm][k] * (w1 * c1[k] + (1.0 - w1) * c2[k]),
                mtl[nm][k],
            )
            for k in range(3)
        )
    return mtl


# ---------------------------------------------------------------------------
# Lighting (integrators/common.illuminate + blinn_direct, norm_power=2)
# ---------------------------------------------------------------------------


def _illuminate(kinds, prim_ref, light_ref, li, lkind, soft, cfg, p, kb,
                mesh=None):
    """Per-lane RGB intensity of light `li` including shadowing.

    kb: bounce-folded key words (the engine folds P_SHADOW + 101*li off it).
    """
    shape = p[0].shape
    inten = _v3(light_ref, li, _LT_INT)
    if lkind == LIGHT_AMBIENT:
        return tuple(jnp.full(shape, c) for c in inten)

    if lkind == LIGHT_DIRECT:
        dvec = _neg3(_v3(light_ref, li, _LT_DIR))
        dn = _norm3(tuple(jnp.full(shape, c) for c in dvec))
        occ = _shadow_occluded(kinds, prim_ref, p, dn,
                               jnp.full(shape, BIGFLOAT), mesh)
        vis = 1.0 - occ.astype(jnp.float32)
        return tuple(vis * c for c in inten)

    pos = _v3(light_ref, li, _LT_POS)
    if not soft:
        vec = _sub3(tuple(jnp.full(shape, c) for c in pos), p)
        d2 = _dot3(vec, vec)
        dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
        occ = _shadow_occluded(kinds, prim_ref, p, _scale3(vec, 1.0 / dist),
                               dist, mesh)
        vis = 1.0 - occ.astype(jnp.float32)
        fall = jnp.minimum(1.0, 1.0 / jnp.maximum(d2, 1e-20))
        out = tuple(vis * fall * c for c in inten)
    else:
        # Exact adaptive 16->64 recurrence (lights/lights.cpp:50-74) with
        # the in-loop falloff and bit-identical draws: the engine draws one
        # [s_max, 2, 2] uniform block from fold(kb, P_SHADOW + 101*li), so
        # flat element (s, a, c) is draw_at(k, 4s + 2a + c).
        s_min = cfg.shadow_spp
        s_max = max(cfg.shadow_spp_max, s_min)
        size = light_ref[li, _LT_SIZE]
        ks = fold2(kb[0], kb[1], jnp.full(shape, RNG.P_SHADOW + 101 * li,
                                          jnp.int32))
        in_shadow = jnp.zeros(shape, jnp.float32)
        frac = jnp.zeros(shape, jnp.bool_)
        escalate = None
        for s in range(s_max):
            # UniformBall quirk ball, 2 attempts (core/sampler.cpp:42-53).
            u = [draw_at(ks[0], ks[1], 4 * s + j) for j in range(4)]
            cand = []
            for a in range(2):
                r1 = u[2 * a] * 2.0 - 1.0
                r2 = u[2 * a + 1] * 2.0 - 1.0
                cand.append((r1, r2, r2))
            ok0 = jnp.sqrt(_dot3(cand[0], cand[0])) <= 1.0
            pick = _where3(ok0, cand[0], cand[1])
            pn = jnp.sqrt(_dot3(pick, pick))
            scale = jnp.where(pn > 1.0, 1.0 / jnp.maximum(pn, 1e-12), 1.0)
            ball = _scale3(pick, scale * size)
            target = _add3(tuple(jnp.full(shape, c) for c in pos), ball)
            vec = _sub3(target, p)
            d2 = _dot3(vec, vec)
            dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
            occ = _shadow_occluded(
                kinds, prim_ref, p, _scale3(vec, 1.0 / dist), dist, mesh
            )
            x = 1.0 - occ.astype(jnp.float32)
            fall = jnp.minimum(1.0, 1.0 / jnp.maximum(d2, 1e-20))
            upd = in_shadow + (x - in_shadow) * fall / (s + 1.0)
            if s < s_min:
                in_shadow = upd
                frac = frac | ((upd > 0.0) & (upd < 1.0))
            else:
                if escalate is None:
                    escalate = frac
                in_shadow = jnp.where(escalate, upd, in_shadow)
        out = tuple(in_shadow * c for c in inten)

    if lkind == LIGHT_SPOT:
        # SpotLight::GetAttenuation (lights/lights.cpp:128-144).
        ldir = _v3(light_ref, li, _LT_DIR)
        to_p = _norm3(_sub3(p, tuple(jnp.full(shape, c) for c in pos)),
                      eps=1e-30)
        cos_t = to_p[0] * ldir[0] + to_p[1] * ldir[1] + to_p[2] * ldir[2]
        r = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t)) / jnp.maximum(
            cos_t, 1e-20
        )
        inner = light_ref[li, _LT_INNER]
        outer = light_ref[li, _LT_OUTER]
        ring = jnp.square((outer - r) / jnp.maximum(outer - inner, 1e-20))
        att = jnp.where(r < inner, 1.0, jnp.where(r > outer, 0.0, ring))
        att = jnp.where(cos_t < 0.0, 0.0, att)
        out = tuple(c * att for c in out)
    return out


def _blinn_direct(kinds, lkinds, lsoft, prim_ref, light_ref, cfg, p, n, v,
                  diffuse, specular, gloss, kb, mesh=None,
                  norm_power: int = 2):
    """blinn_direct, skip_ambient. norm_power=2 is the PathTracing
    double-1/L quirk (MtlBlinn_PathTracing.cpp:163-175); 1 is the PhotonMap
    convention (MtlBlinn_PhotonMap.cpp:482-498)."""
    shape = p[0].shape
    total = (jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape))
    num_lights = len(lkinds)
    if num_lights == 0:
        return total
    norm = (1.0 / num_lights) ** norm_power

    def one_light(li, lkind, soft, total):
        """li may be a python int or a traced scalar (fori over a run)."""
        inten = _illuminate(kinds, prim_ref, light_ref, li, lkind,
                            soft, cfg, p, kb, mesh)
        inten = _scale3(inten, norm)
        # l_dir = normalize(-Light::Direction(p)).
        if lkind == LIGHT_DIRECT:
            ld = _neg3(_v3(light_ref, li, _LT_DIR))
            l_dir = _norm3(tuple(jnp.full(shape, c) for c in ld), eps=1e-30)
        else:
            pos = _v3(light_ref, li, _LT_POS)
            to_p = _norm3(_sub3(p, tuple(jnp.full(shape, c) for c in pos)),
                          eps=1e-30)
            l_dir = _norm3(_neg3(to_p), eps=1e-30)
        h = _norm3(_add3(v, l_dir), eps=1e-30)
        cos_nl = jnp.maximum(0.0, _dot3(n, l_dir))
        cos_nh = jnp.maximum(0.0, _dot3(n, h))
        spec_w = _pow_safe(cos_nh, gloss)
        spec = (specular[0] * spec_w, specular[1] * spec_w,
                specular[2] * spec_w)
        w = cos_nl
        return (
            total[0] + inten[0] * w * (diffuse[0] + spec[0]),
            total[1] + inten[1] * w * (diffuse[1] + spec[1]),
            total[2] + inten[2] * w * (diffuse[2] + spec[2]),
        )

    # Group consecutive lights of the same (kind, soft) into ONE in-kernel
    # fori_loop with a dynamic light row — many-light scenes (xmas has 18
    # spots) otherwise unroll into a kernel Mosaic takes minutes to
    # compile. Single lights stay inlined (static row).
    runs = []
    for li, lkind in enumerate(lkinds):
        key = (lkind, lsoft[li])
        if runs and runs[-1][2] == key and runs[-1][1] == li:
            runs[-1] = (runs[-1][0], li + 1, key)
        else:
            runs.append((li, li + 1, key))
    for start, end, (lkind, soft) in runs:
        if lkind == LIGHT_AMBIENT:
            continue
        if end - start == 1:
            total = one_light(start, lkind, soft, total)
        else:
            total = jax.lax.fori_loop(
                start, end,
                lambda li, t, _k=lkind, _s=soft: one_light(li, _k, _s, t),
                total,
            )
    return total


def _glossy_jitter(center, y_axis, gloss, keys, want_up, shape):
    """Port of common.glossy_jitter_dir (SampleTransmit/ReflectionBxDF,
    MtlBlinn_PhotonMap.cpp:152-200): dir = normalize(normalize(center) +
    UniformBall(2*gloss)) with the reference's (r1, r2, r2) quirk ball,
    4 hemisphere attempts x 4 ball attempts, first success wins, mirror
    center fallback. Draws match uniform(keys, (4, 4, 2)) flat order."""
    c = _norm3(center, eps=1e-30)
    radius = 2.0 * gloss
    res = c
    # Reverse iteration = first-success-wins with the reference fallbacks.
    for a in range(3, -1, -1):
        # Inner quirk-ball rejection: default = LAST attempt, radially
        # clamped (core/warps.uniform_ball_ref).
        pick = None
        for i in range(3, -1, -1):
            f = a * 8 + i * 2
            r1 = draw_at(keys[0], keys[1], f) * 2.0 - 1.0
            r2 = draw_at(keys[0], keys[1], f + 1) * 2.0 - 1.0
            p_i = (r1, r2, r2)
            if pick is None:
                pick = p_i
            else:
                ok_i = jnp.sqrt(_dot3(p_i, p_i)) <= 1.0
                pick = _where3(ok_i, p_i, pick)
        pn = jnp.sqrt(_dot3(pick, pick))
        scale = jnp.where(pn > 1.0, 1.0 / jnp.maximum(pn, 1e-12), 1.0)
        ball = _scale3(pick, scale * radius)
        cand = _norm3(_add3(c, ball), eps=1e-30)
        side = _dot3(cand, y_axis)
        ok_a = side >= 0.0 if want_up else side <= 0.0
        res = _where3(ok_a, cand, res)
    return res


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _make_kernel(meta, cfg, n_clusters: int, pg_clusters: int = 0,
                 pc_clusters: int = 0, use_photon: bool = False):
    kinds = meta.analytic_kinds
    mtls = meta.analytic_mtls
    mesh_mtls = meta.mesh_mega_mtls if meta.mesh_mega else ()
    has_mesh = meta.mesh_mega
    lkinds = meta.light_kinds
    lsoft = meta.light_soft
    width = meta.img_width
    has_dof = meta.has_dof
    has_glossy = meta.has_glossy
    integrator = cfg.integrator
    max_bounce = cfg.max_bounce
    tex_slots = (
        meta.mega_tex_slots
        if (meta.has_mtl_textures and meta.mega_tex_ok)
        else (False,) * 5
    )
    want_tex = any(tex_slots)

    mesh_stream = meta.mesh_mega_stream

    def kernel(prim_ref, mtl_ref, light_ref, cam_ref, key_ref,
               mc16_ref, mattr_ref, mcb_ref,
               gtab_ref, gcb_ref, ctab_ref, ccb_ref, pr2_ref,
               px_ref, py_ref, sid_ref, r_out, g_out, b_out, t0_out,
               *extra):
        if has_mesh and mesh_stream:
            # Scratch refs (appended after the outputs by pallas_call):
            # cluster slabs DMA'd from the HBM-resident mega tables.
            sc_c16, sc_attr, dma_sem = extra[-3:]
            photon_outs = extra[:-3]
            stream_ctx = (sc_c16, sc_attr, dma_sem)
        else:
            photon_outs = extra
            stream_ctx = None
        mesh = (
            (mc16_ref, mattr_ref, mcb_ref, n_clusters, stream_ctx)
            if has_mesh else None
        )
        px = px_ref[:]
        py = py_ref[:]
        sid = sid_ref[:]
        shape = px.shape

        # Per-ray threefry keys: fold(base, rid * 65536 + sid), int32 wrap
        # (integrators/engine.render_batch).
        rid = py * jnp.int32(width) + px
        folddata = rid * jnp.int32(65536) + sid
        b0 = key_ref[0, 0]
        b1 = key_ref[0, 1]
        kr = fold2(jnp.full(shape, b0), jnp.full(shape, b1), folddata)

        # Camera ray (renderer.cpp:302-327; Halton 11/13 subpixel jitter).
        jx = _halton(sid, 11)
        jy = _halton(sid, 13)
        tx = px.astype(jnp.float32) + jx
        ty = py.astype(jnp.float32) + jy
        ca = _v3(cam_ref, 0, _CAM_A)
        cu = _v3(cam_ref, 0, _CAM_U)
        cv = _v3(cam_ref, 0, _CAM_V)
        cpos = _v3(cam_ref, 0, _CAM_POS)
        cpt = tuple(ca[k] + tx * cu[k] + ty * cv[k] for k in range(3))
        campos = tuple(jnp.full(shape, cpos[k]) for k in range(3))
        if has_dof:
            kd = fold2(kr[0], kr[1], jnp.full(shape, RNG.P_DOF, jnp.int32))
            u0 = draw_at(kd[0], kd[1], 0)
            u1 = draw_at(kd[0], kd[1], 1)
            lr = cam_ref[0, _CAM_DOF] * jnp.sqrt(u0)
            lt = 2.0 * np.pi * u1
            lx, ly = lr * jnp.cos(lt), lr * jnp.sin(lt)
            cx = _v3(cam_ref, 0, _CAM_X)
            cy = _v3(cam_ref, 0, _CAM_Y)
            campos = tuple(campos[k] + lx * cx[k] + ly * cy[k]
                           for k in range(3))
        d = _norm3(_sub3(cpt, campos))
        p = campos
        if want_tex:
            # Differential camera rays for the primary-hit texture
            # footprints (DiffRay ctor, renderer.cpp:314-326).
            from qaray_tpu.core.constants import DIFF_DX, DIFF_DY

            xpt = tuple(cpt[k] + DIFF_DX * cu[k] for k in range(3))
            ypt = tuple(cpt[k] + DIFF_DY * cv[k] for k in range(3))
            cam_diff = (
                campos, _norm3(_sub3(xpt, campos)),
                campos, _norm3(_sub3(ypt, campos)),
            )
        else:
            cam_diff = None

        bg = _v3(cam_ref, 0, _CAM_BG)
        env = _v3(cam_ref, 0, _CAM_ENV)

        radiance = [jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape)]
        beta = (jnp.ones(shape), jnp.ones(shape), jnp.ones(shape))
        alive = jnp.ones(shape, jnp.bool_)
        t0 = jnp.full(shape, BIGFLOAT)
        # PhotonMap state: hasDiffuseHit (f32 0/1) + pending back-face
        # absorption (ComputeSecondaryRay, MtlBlinn_PhotonMap.cpp:246-249).
        has_dh = jnp.zeros(shape, jnp.float32)
        pend = (jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape))
        # Photon gathering: escalation flag (any vertex saw > GATHER_K
        # photons in radius -> the host re-renders the lane on the exact
        # XLA top-k path) + the irradiance-computation debug plane + the
        # lane's (at most one) global-map gather record.
        esc = jnp.zeros(shape, jnp.float32)
        irr0 = jnp.zeros(shape, jnp.float32)
        zero3 = (jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape))
        rec_p = zero3
        rec_n = zero3
        rec_v = zero3
        rec_bd = zero3
        rec_bs = zero3
        rec_g = jnp.zeros(shape, jnp.float32)
        rec_valid = jnp.zeros(shape, jnp.float32)

        for bounce in range(max_bounce + 1):
            hits = _closest_hit(
                kinds, mtls, prim_ref, mtl_ref, p, d, mesh, mesh_mtls,
                tex_slots, cam_diff if bounce == 0 else None,
            )
            hit = hits["hit"] & alive
            miss = (~hits["hit"]) & alive
            if bounce == 0:
                t0 = jnp.where(hits["hit"], hits["t"], BIGFLOAT)
                mc = bg
            else:
                mc = env
            for k in range(3):
                radiance[k] = radiance[k] + jnp.where(
                    miss, beta[k] * mc[k], 0.0
                )
            alive = hit
            if integrator == "photonmap":
                # Beer attenuation on back-face continuations with the
                # PARENT vertex's absorption over the traveled distance.
                bmask = hit & (~hits["front"])
                beta = tuple(
                    jnp.where(bmask,
                              beta[k] * jnp.exp(-pend[k] * hits["t"]),
                              beta[k])
                    for k in range(3)
                )

            mtl = hits["mtl"]
            if want_tex:
                mtl = _apply_checker_textures(
                    mtl, hits["uv"],
                    (hits["duv0"], hits["duv1"]) if bounce == 0 else None,
                    tex_slots,
                )
            n = _norm3(hits["n"], eps=1e-30)
            front = hits["front"]
            v = _neg3(d)
            kb = fold2(kr[0], kr[1],
                       jnp.full(shape, 1000 + bounce, jnp.int32))

            # --- Fresnel (MtlBlinn_PhotonMap::ComputeFresnel port, shared
            # by the PathTracing material; integrators/common.py:112-135) ---
            cos_nv = _dot3(n, v)
            y = _where3(cos_nv > 0.0, n, _neg3(n))
            z = _cross3(v, y)
            x = _norm3(_cross3(y, z), eps=1e-30)
            ior = mtl["ior"]
            n_ior = jnp.where(front, 1.0 / ior, ior)
            cos_i = cos_nv
            sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
            sin_o = jnp.clip(sin_i * n_ior, 0.0, 1.0)
            cos_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_o * sin_o))
            t_dir = tuple(-x[k] * sin_o - y[k] * cos_o for k in range(3))
            r_dir = tuple(2.0 * n[k] * cos_nv - v[k] for k in range(3))
            total_refl = (n_ior * sin_i) > TOTAL_REFLECTION_THRESHOLD
            c0 = (n_ior - 1.0) ** 2 / (n_ior + 1.0) ** 2
            r_ratio = c0 + (1.0 - c0) * jnp.power(1.0 - jnp.abs(cos_i), 5.0)
            t_ratio = 1.0 - r_ratio

            # --- shared Fresnel-weighted lobe colors ---
            t_k = mtl["refraction"]
            r_k = mtl["reflection"]
            samp_refr = tuple(
                jnp.where(total_refl, 0.0, t_k[k] * t_ratio) for k in range(3)
            )
            samp_refl = tuple(
                jnp.where(total_refl, r_k[k] + t_k[k],
                          r_k[k] + t_k[k] * r_ratio)
                for k in range(3)
            )
            ksel = fold2(kb[0], kb[1],
                         jnp.full(shape, RNG.P_LOBE_SELECT, jnp.int32))
            select = draw_at(ksel[0], ksel[1], 0)

            if integrator == "pathtrace":
                # --- colorMax RR with pdf division
                # (MtlBlinn_PathTracing.cpp:118-159) ---
                coef_refr = _max3(samp_refr)
                coef_refl = _max3(samp_refl)
                coef_spec = _max3(mtl["specular"])
                coef_diff = _max3(mtl["diffuse"])
                coef_sum = jnp.maximum(
                    coef_refr + coef_refl + coef_spec + coef_diff, 1e-20
                )
                c_refr = coef_refr / coef_sum
                c_refl = coef_refl / coef_sum
                c_spec = coef_spec / coef_sum
                c_diff = coef_diff / coef_sum
                sum_refr = c_refr
                sum_refl = sum_refr + c_refl
                sum_spec = sum_refl + c_spec
                sel_refr = (select <= sum_refr) & (c_refr > 1e-6)
                sel_refl = (
                    (~sel_refr) & (select < sum_refl) & (c_refl > 1e-6)
                )
                sel_spec = (
                    (~sel_refr) & (~sel_refl) & (select < sum_spec)
                    & (c_spec > 1e-6)
                )
                sel_diff = (
                    (~sel_refr) & (~sel_refl) & (~sel_spec) & (c_diff > 1e-6)
                )
            else:
                # --- luma-weighted 4-way RR with kill=0.1, selection prob
                # NOT divided out (RandomSelectMtl,
                # MtlBlinn_PhotonMap.cpp:107-150) ---
                from qaray_tpu.core.constants import (
                    COLOR_LUMA_THRESHOLD as CLT,
                    PHOTON_KILL,
                )

                luma_t = _luma3(samp_refr)
                luma_r = _luma3(samp_refl)
                luma_d = _luma3(mtl["diffuse"])
                coef_t = luma_t
                coef_r = coef_t + luma_r
                coef_d = coef_r + luma_d
                coef_sum = coef_d + PHOTON_KILL
                sel_pt = select * coef_sum
                sel_transmit = (sel_pt < coef_t) & (luma_t > CLT)
                sel_reflect = (
                    (~sel_transmit) & (sel_pt < coef_r) & (luma_r > CLT)
                )
                sel_diffuse = (
                    (~sel_transmit) & (~sel_reflect) & (sel_pt < coef_d)
                    & (luma_d > CLT)
                )

            # --- direct + emission ---
            direct = _blinn_direct(
                kinds, lkinds, lsoft, prim_ref, light_ref, cfg,
                hits["hp"], n, v, mtl["diffuse"], mtl["specular"],
                mtl["glossiness"], kb, mesh,
                norm_power=2 if integrator == "pathtrace" else 1,
            )
            emit = mtl["emission"]
            for k in range(3):
                radiance[k] = radiance[k] + jnp.where(
                    alive, beta[k] * (emit[k] + direct[k]), 0.0
                )

            if use_photon:
                # Photon / caustics gathering (MtlBlinn_PhotonMap.cpp:
                # 344-368, 420-458): diffuse-selected vertices gather the
                # caustics map always; later-than-first diffuse vertices
                # additionally gather the global map.
                #
                # Caustics (small map, default 1k photons): cluster-culled
                # sweep IN-kernel with r_eff = r — exact
                # (= photon/gather.py) whenever at most GATHER_K photons
                # lie in radius; denser lanes raise the escalation flag.
                #
                # Global (10k default): D-after-D vertices are spatially
                # incoherent, so an in-kernel sweep degenerates to
                # sweep-everything per block. A path dies at its global
                # gather (go_diffuse needs ~hasDiffuseHit), so each lane
                # has AT MOST ONE global gather: capture its 17-field
                # record instead, and let the host wrapper Morton-sort the
                # records and sweep them with tight blocks
                # (ops/pallas_photon.gather_apply).
                from qaray_tpu.ops.pallas_photon import photon_sweep
                from qaray_tpu.photon.cluster import GATHER_K

                diffuse_ok = luma_d > CLT
                do_c = alive & sel_diffuse & diffuse_ok
                do_p = do_c & (has_dh > 0.5)
                if bounce == 0:
                    irr0 = jnp.where(alive & (_luma3(mtl["diffuse"]) > 0.0),
                                     1.0, 0.0)
                if pg_clusters:
                    rec_p = _where3(do_p, hits["hp"], rec_p)
                    rec_n = _where3(do_p, n, rec_n)
                    rec_v = _where3(do_p, v, rec_v)
                    rec_bd = _where3(
                        do_p, _mul3(beta, mtl["diffuse"]), rec_bd
                    )
                    rec_bs = _where3(
                        do_p, _mul3(beta, mtl["specular"]), rec_bs
                    )
                    rec_g = jnp.where(do_p, mtl["glossiness"], rec_g)
                    rec_valid = jnp.maximum(
                        rec_valid, jnp.where(do_p, 1.0, 0.0)
                    )
                if pc_clusters:
                    sums, dirs, cnt = photon_sweep(
                        ctab_ref, ccb_ref, pc_clusters, pr2_ref[0, 1],
                        hits["hp"], do_c,
                    )
                    inv_area = 1.0 / (jnp.pi * 0.5 * pr2_ref[0, 1])
                    irrad = _scale3(sums, inv_area)
                    # gather_blinn (photon/gather.py): L = -normalize(dir),
                    # H = norm(V+L), I*cosNL*(diffuse + spec*cosNH^gloss),
                    # zeroed below the luma threshold.
                    l_dir = _neg3(_norm3(dirs, eps=1e-30))
                    hh = _norm3(_add3(v, l_dir), eps=1e-30)
                    cos_nl = jnp.maximum(0.0, _dot3(n, l_dir))
                    cos_nh = jnp.maximum(0.0, _dot3(n, hh))
                    spec_w = _pow_safe(cos_nh, mtl["glossiness"])
                    gate = do_c & (_luma3(irrad) > CLT)
                    for k in range(3):
                        c_k = irrad[k] * cos_nl * (
                            mtl["diffuse"][k] + mtl["specular"][k] * spec_w
                        )
                        radiance[k] = radiance[k] + jnp.where(
                            gate, beta[k] * c_k, 0.0
                        )
                    esc = jnp.maximum(
                        esc,
                        jnp.where(do_c & (cnt > float(GATHER_K)), 1.0, 0.0),
                    )

            if bounce == max_bounce:
                break

            if integrator == "pathtrace":
                # --- continuation (MtlBlinn_PathTracing.cpp:176-297) ---
                kh = fold2(kb[0], kb[1],
                           jnp.full(shape, RNG.P_LOBE_SAMPLE, jnp.int32))
                u0 = draw_at(kh[0], kh[1], 0)
                u1 = draw_at(kh[0], kh[1], 1)
                ct = jnp.sqrt(u0)
                st = jnp.sqrt(jnp.maximum(0.0, 1.0 - u0))
                phi = 2.0 * np.pi * u1
                hemi = _norm3((st * jnp.cos(phi), st * jnp.sin(phi), ct),
                              eps=1e-30)
                hemi_world = _to_local_frame(y, hemi)

                refr_glossy = mtl["tgloss"] > 0.0
                refl_glossy = mtl["rgloss"] > 0.0

                refr_dir = _where3(refr_glossy, _neg3(hemi_world), t_dir)
                cos_vh_t = jnp.maximum(0.0, _dot3(v, t_dir))
                wt = _pow_safe(cos_vh_t, mtl["tgloss"])
                refr_bxdf = tuple(
                    jnp.where(refr_glossy, samp_refr[k] * wt, samp_refr[k])
                    for k in range(3)
                )
                refl_dir = _where3(refl_glossy, hemi_world, r_dir)
                cos_vh_r = jnp.maximum(0.0, _dot3(v, r_dir))
                wr = _pow_safe(cos_vh_r, mtl["rgloss"])
                refl_bxdf = tuple(
                    jnp.where(refl_glossy, samp_refl[k] * wr, samp_refl[k])
                    for k in range(3)
                )
                h = _norm3(_add3(v, _norm3(hemi_world, eps=1e-30)),
                           eps=1e-30)
                cos_nh = jnp.maximum(0.0, _dot3(n, h))
                ws = _pow_safe(cos_nh, mtl["glossiness"])
                spec_bxdf = tuple(mtl["specular"][k] * ws for k in range(3))
                diff_bxdf = mtl["diffuse"]

                go_refr = sel_refr
                go_refl = sel_refl
                go_spec = sel_spec & front
                go_diff = sel_diff & front

                new_dir = _where3(
                    go_refr, refr_dir,
                    _where3(go_refl, refl_dir,
                            _where3(go_spec, hemi_world, hemi_world)),
                )
                pdf = jnp.where(
                    go_refr, c_refr,
                    jnp.where(go_refl, c_refl,
                              jnp.where(go_spec, c_spec, c_diff)),
                )
                bxdf = _where3(
                    go_refr, refr_bxdf,
                    _where3(go_refl, refl_bxdf,
                            _where3(go_spec, spec_bxdf, diff_bxdf)),
                )
                inv_pdf = 1.0 / jnp.maximum(pdf, 1e-20)
                alive = alive & (go_refr | go_refl | go_spec | go_diff)
                beta = tuple(
                    jnp.where(alive, beta[k] * bxdf[k] * inv_pdf, beta[k])
                    for k in range(3)
                )
            else:
                # --- continuation (MtlBlinn_PhotonMap::Sample*BxDF +
                # ComputeSecondaryRay, MtlBlinn_PhotonMap.cpp:152-254) ---
                ks2 = fold2(kb[0], kb[1],
                            jnp.full(shape, RNG.P_LOBE_SAMPLE, jnp.int32))
                if has_glossy:
                    refl_dir = _glossy_jitter(
                        r_dir, y, mtl["rgloss"],
                        fold2(ks2[0], ks2[1],
                              jnp.full(shape, 11, jnp.int32)),
                        want_up=True, shape=shape,
                    )
                    refl_dir = _where3(mtl["rgloss"] > 0.0, refl_dir, r_dir)
                    trans_dir = _glossy_jitter(
                        t_dir, y, mtl["tgloss"],
                        fold2(ks2[0], ks2[1],
                              jnp.full(shape, 12, jnp.int32)),
                        want_up=False, shape=shape,
                    )
                    trans_dir = _where3(mtl["tgloss"] > 0.0, trans_dir,
                                        t_dir)
                else:
                    refl_dir = r_dir
                    trans_dir = t_dir
                kd2 = fold2(ks2[0], ks2[1], jnp.full(shape, 13, jnp.int32))
                u0 = draw_at(kd2[0], kd2[1], 0)
                u1 = draw_at(kd2[0], kd2[1], 1)
                ct = jnp.sqrt(u0)
                st = jnp.sqrt(jnp.maximum(0.0, 1.0 - u0))
                phi = 2.0 * np.pi * u1
                diff_dir = _to_local_frame(
                    n, (st * jnp.cos(phi), st * jnp.sin(phi), ct)
                )
                h = _norm3(_add3(v, _norm3(diff_dir, eps=1e-30)), eps=1e-30)
                cos_nh = jnp.maximum(0.0, _dot3(n, h))
                ws = _pow_safe(cos_nh, mtl["glossiness"])
                diff_bxdf = tuple(
                    mtl["diffuse"][k] + mtl["specular"][k] * ws
                    for k in range(3)
                )

                go_reflect = sel_reflect & (luma_r > CLT)
                go_transmit = sel_transmit & (luma_t > CLT)
                go_diffuse = (
                    sel_diffuse & (~(has_dh > 0.5)) & (luma_d > CLT) & front
                )
                new_dir = _where3(
                    go_transmit, trans_dir,
                    _where3(go_diffuse, diff_dir, refl_dir),
                )
                weight = _where3(
                    go_transmit, samp_refr,
                    _where3(go_diffuse, diff_bxdf, samp_refl),
                )
                alive = alive & (go_reflect | go_transmit | go_diffuse)
                beta = tuple(
                    jnp.where(alive, beta[k] * weight[k], beta[k])
                    for k in range(3)
                )
                # Diffuse sets hasDiffuseHit; reflect/transmit reset it
                # (ComputeSecondaryRay default, MtlBlinn_PhotonMap.h:139).
                has_dh = jnp.where(
                    alive, jnp.where(go_diffuse, 1.0, 0.0), has_dh
                )
                pend = mtl["absorption"]
            p = hits["hp"]
            d = _norm3(new_dir, eps=1e-30)

        r_out[:] = radiance[0]
        g_out[:] = radiance[1]
        b_out[:] = radiance[2]
        t0_out[:] = t0
        if use_photon:
            irr0_out, esc_out = photon_outs[:2]
            irr0_out[:] = irr0
            esc_out[:] = esc
            if pg_clusters:
                rec_flat = (
                    list(rec_p) + list(rec_n) + list(rec_v)
                    + list(rec_bd) + list(rec_bs) + [rec_g, rec_valid]
                )
                for ref, val in zip(photon_outs[2:], rec_flat):
                    ref[:] = val

    return kernel


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def _pack_tables(scene, want_tex: bool = False):
    """SceneArrays -> the small VMEM tables the kernel reads (all traced)."""
    prims = scene.analytic
    prim_tab = jnp.concatenate(
        [prims.m_w2o.reshape(-1, 9), prims.t_o2w], axis=1
    )  # [P, 12]
    mt = scene.materials
    mtl_tab = jnp.concatenate(
        [
            mt.diffuse, mt.specular, mt.emission, mt.reflection,
            mt.refraction,
            mt.glossiness[:, None], mt.reflection_glossiness[:, None],
            mt.refraction_glossiness[:, None], mt.ior[:, None],
            mt.absorption,
        ],
        axis=1,
    )  # [M, MTL_COLS]
    if want_tex:
        # Checker-texture columns (see _MT_TEXBASE layout).
        atlas = scene.textures
        cols = [mtl_tab]
        for s in range(len(_SLOT_NAMES)):
            tid = mt.tex_id[:, s]
            safe = jnp.maximum(tid, 0)
            cols += [
                (tid >= 0).astype(jnp.float32)[:, None],
                atlas.color1[safe],
                atlas.color2[safe],
                mt.tex_m[:, s, 0, :],
                mt.tex_m[:, s, 1, :],
                mt.tex_t[:, s],
            ]
        mtl_tab = jnp.concatenate(cols, axis=1)
    lt = scene.lights
    light_tab = jnp.concatenate(
        [
            lt.intensity, lt.position, lt.direction,
            lt.size[:, None], lt.inner[:, None], lt.outer[:, None],
        ],
        axis=1,
    )  # [L, LIGHT_COLS]
    cam = scene.camera
    cam_tab = jnp.concatenate(
        [
            cam.pos, cam.screen_a, cam.screen_u, cam.screen_v,
            cam.screen_x, cam.screen_y, cam.dof[None],
            scene.background.color, scene.environment.color,
        ]
    )[None, :]  # [1, CAM_COLS]
    return prim_tab, mtl_tab, light_tab, cam_tab


@partial(jax.jit, static_argnames=("meta", "cfg", "interpret"))
def _mega_raw(scene, meta, cfg, px, py, sample_ids, key_words,
              photon_maps=None, interpret: bool = False):
    """Forward-only megakernel dispatch.

    Returns (radiance [B,3], t0 [B]); with photon gathering engaged
    (cfg.use_photon_map + clustered maps) additionally the irradiance-plane
    flag [B] and the gather-escalation flag [B] (both bool).
    """
    num = px.shape[0]
    block = BLOCK_ROWS * LANES
    pad = (-num) % block
    px_p = jnp.pad(px.astype(jnp.int32), (0, pad))
    py_p = jnp.pad(py.astype(jnp.int32), (0, pad))
    sid_p = jnp.pad(sample_ids.astype(jnp.int32), (0, pad))
    total = num + pad
    grid = total // block
    rows = total // LANES

    def shape2(a):
        return a.reshape(rows, LANES)

    prim_tab, mtl_tab, light_tab, cam_tab = _pack_tables(
        scene, want_tex=meta.has_mtl_textures and meta.mega_tex_ok
    )
    if meta.mesh_mega:
        mc16 = scene.mesh.mega_c16
        mattr = scene.mesh.mega_attr
        mcb = scene.mesh.mega_cbounds
        if meta.mesh_mega_stream:
            # [Fp/8, 128] packed slabs in HBM (8 rows of 16 per lane row).
            n_clusters = mc16.shape[0] // (MEGA_CLUSTER // 8)
        else:
            n_clusters = mc16.shape[0] // MEGA_CLUSTER
    else:
        mc16 = jnp.zeros((MEGA_CLUSTER, 16), jnp.float32)
        mattr = jnp.zeros((MEGA_CLUSTER, 16), jnp.float32)
        mcb = jnp.zeros((1, 8), jnp.float32)
        n_clusters = 0
    key2 = key_words.reshape(1, 2).astype(jnp.uint32)

    from qaray_tpu.photon.cluster import PHOTON_CLUSTER

    use_photon = (
        cfg.use_photon_map and cfg.integrator == "photonmap"
        and photon_maps is not None
    )
    if use_photon:
        gmap, cmap = photon_maps[0], photon_maps[1]
        gtab, gcb = gmap.ctable, gmap.cbounds
        ctab, ccb = cmap.ctable, cmap.cbounds
        pg_clusters = gtab.shape[0] // PHOTON_CLUSTER
        pc_clusters = ctab.shape[0] // PHOTON_CLUSTER
        pr2 = jnp.stack(
            [gmap.radius * gmap.radius, cmap.radius * cmap.radius]
        ).reshape(1, 2).astype(jnp.float32)
    else:
        gtab = ctab = jnp.zeros((PHOTON_CLUSTER, 16), jnp.float32)
        gcb = ccb = jnp.zeros((1, 8), jnp.float32)
        pr2 = jnp.ones((1, 2), jnp.float32)
        pg_clusters = pc_clusters = 0

    block_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32s = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    n_rec = 17 if (use_photon and pg_clusters) else 0
    n_out = (6 + n_rec) if use_photon else 4

    mesh_table_spec = small
    scratch_shapes = []
    if meta.mesh_mega and meta.mesh_mega_stream:
        mesh_table_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch_shapes = [
            pltpu.VMEM((MEGA_CLUSTER // 8, 128), jnp.float32),
            pltpu.VMEM((MEGA_CLUSTER // 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]

    outs = pl.pallas_call(
        _make_kernel(meta, cfg, n_clusters, pg_clusters, pc_clusters,
                     use_photon),
        grid=(grid,),
        in_specs=[small] * 5 + [mesh_table_spec] * 2 + [small] * 6
        + [block_spec] * 3,
        out_specs=(block_spec,) * n_out,
        out_shape=(f32s,) * n_out,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(prim_tab, mtl_tab, light_tab, cam_tab, key2, mc16, mattr, mcb,
      gtab, gcb, ctab, ccb, pr2,
      shape2(px_p), shape2(py_p), shape2(sid_p))

    r, g, b, t0 = outs[:4]
    radiance = jnp.stack(
        [r.reshape(-1)[:num], g.reshape(-1)[:num], b.reshape(-1)[:num]],
        axis=-1,
    )
    if use_photon:
        irr0 = outs[4].reshape(-1)[:num] > 0.5
        esc = outs[5].reshape(-1)[:num] > 0.5
        if n_rec:
            # Global-map gathers: Morton-sorted tight-block sweep over the
            # per-lane records the kernel captured.
            from qaray_tpu.ops.pallas_photon import gather_apply

            rec = [o.reshape(-1)[:num] for o in outs[6:]]
            contrib, esc_g = gather_apply(
                photon_maps[0], rec, interpret=interpret
            )
            radiance = radiance + contrib
            esc = esc | esc_g
        return radiance, t0.reshape(-1)[:num], irr0, esc
    return radiance, t0.reshape(-1)[:num]


# ---------------------------------------------------------------------------
# Differentiable wrapper: megakernel forward, XLA-engine backward
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def mega_render(scene, meta, cfg, key_impl, interpret, px, py, sample_ids,
                key_words, photon_maps=None):
    """Megakernel render with gradients.

    Forward: the fused Pallas kernel. Backward: jax.vjp of the XLA wavefront
    engine at the same (scene, keys) — with threefry keys both paths compute
    the same function (bit-identical draws), so this is the gradient of the
    forward estimator; with rbg keys the backward samples an independent,
    equally-unbiased estimator (documented deviation).
    key_impl: static 'threefry2x32' | 'rbg' (reconstructs the typed key for
    the backward engine call). interpret: static (CPU tests).
    photon_maps: clustered (global, caustics) PhotonMapData for in-kernel
    gathering (photonmap integrator + cfg.use_photon_map); treated as
    constants by the backward (no map cotangents).
    """
    return _mega_raw(scene, meta, cfg, px, py, sample_ids,
                     _fold_words(key_words), photon_maps, interpret)


def _fold_words(key_words):
    """[2] threefry words pass through; [4] rbg words xor-fold to 2."""
    if key_words.shape[-1] == 4:
        return jnp.stack(
            [key_words[0] ^ key_words[2], key_words[1] ^ key_words[3]]
        )
    return key_words


def _mega_fwd(scene, meta, cfg, key_impl, interpret, px, py, sample_ids,
              key_words, photon_maps=None):
    out = _mega_raw(scene, meta, cfg, px, py, sample_ids,
                    _fold_words(key_words), photon_maps, interpret)
    return out, (scene, px, py, sample_ids, key_words, photon_maps)


def _mega_bwd(meta, cfg, key_impl, interpret, res, cts):
    scene, px, py, sample_ids, key_words, photon_maps = res
    from qaray_tpu.integrators.engine import render_batch_xla_impl

    base_key = jax.random.wrap_key_data(key_words, impl=key_impl)
    # Pure-XLA trace for the backward: jax cannot linearize a nested Pallas
    # custom_vjp inside this bwd rule on TPU (meta.force_xla forks the
    # trace_closest/trace_shadow jit caches).
    meta_x = meta._replace(force_xla=True)

    def f(s):
        return render_batch_xla_impl(
            s, meta_x, cfg, px, py, sample_ids, base_key,
            photon_maps=photon_maps,
        )

    _, vjp = jax.vjp(f, scene)
    # The forward's photon outputs (irradiance plane, escalation flag) are
    # boolean diagnostics with no XLA counterpart: only the (radiance, t0)
    # cotangents feed the engine VJP.
    (gscene,) = vjp((cts[0], cts[1]))
    return (gscene, None, None, None, None, None)


mega_render.defvjp(_mega_fwd, _mega_bwd)
