"""Pallas TPU kernel: fused analytic-primitive closest-hit.

The XLA path (ops/intersect.py) materializes a [B, P] distance matrix in HBM
between the transform pass and the argmin. This kernel fuses the whole
closest-hit search per ray block in VMEM: rays stream through once, every
primitive's transform + quadratic/plane solve runs on the VPU over an
(8, 128)-shaped lane tile, and only the winning (t, prim) pair is written
back — O(B) HBM traffic instead of O(B*P).

Primitive kinds are STATIC (a python tuple from SceneMeta), so each
primitive's branch specializes at trace time — the sphere/plane dispatch
costs nothing. Primitive transforms are scalar-prefetched per block.

Used automatically on TPU for closest-hit analytic search; the XLA path
remains the reference implementation (CPU, debugging, and the any-hit
shadow pass which wants the full [B, P] mask anyway).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qaray_tpu.core.constants import BIAS, BIGFLOAT, PLANE_EPS
from qaray_tpu.scene.arrays import KIND_SPHERE, AnalyticPrims

LANES = 128
SUBLANES = 8
BLOCK = SUBLANES * LANES  # 1024 rays per grid step


def _kernel(kinds, m_ref, t_ref, px, py, pz, dx, dy, dz, t_out, idx_out):
    """One ray block vs all P primitives. kinds: static tuple of ints."""
    rpx, rpy, rpz = px[:], py[:], pz[:]
    rdx, rdy, rdz = dx[:], dy[:], dz[:]

    t_best = jnp.full(rpx.shape, BIGFLOAT, jnp.float32)
    idx_best = jnp.full(rpx.shape, -1, jnp.int32)

    for prim in range(len(kinds)):
        m00 = m_ref[prim, 0]
        m01 = m_ref[prim, 1]
        m02 = m_ref[prim, 2]
        m10 = m_ref[prim, 3]
        m11 = m_ref[prim, 4]
        m12 = m_ref[prim, 5]
        m20 = m_ref[prim, 6]
        m21 = m_ref[prim, 7]
        m22 = m_ref[prim, 8]
        tx = t_ref[prim, 0]
        ty = t_ref[prim, 1]
        tz = t_ref[prim, 2]

        relx = rpx - tx
        rely = rpy - ty
        relz = rpz - tz
        pox = m00 * relx + m01 * rely + m02 * relz
        poy = m10 * relx + m11 * rely + m12 * relz
        poz = m20 * relx + m21 * rely + m22 * relz
        dox = m00 * rdx + m01 * rdy + m02 * rdz
        doy = m10 * rdx + m11 * rdy + m12 * rdz
        doz = m20 * rdx + m21 * rdy + m22 * rdz

        if kinds[prim] == KIND_SPHERE:
            a = dox * dox + doy * doy + doz * doz
            b = 2.0 * (pox * dox + poy * doy + poz * doz)
            c = pox * pox + poy * poy + poz * poz - 1.0
            delta = b * b - 4.0 * a * c
            sq = jnp.sqrt(jnp.maximum(delta, 0.0))
            rcp2a = 0.5 / a
            t1 = (-b - sq) * rcp2a
            t2 = (-b + sq) * rcp2a
            t_hit = jnp.where(t1 > BIAS, t1, jnp.where(t2 > BIAS, t2, BIGFLOAT))
            t_hit = jnp.where(delta >= 0.0, t_hit, BIGFLOAT)
        else:  # plane: z = 0, |x|,|y| <= 1
            safe = jnp.where(jnp.abs(doz) < PLANE_EPS, jnp.inf, doz)
            t_hit = -poz / safe
            hx = pox + t_hit * dox
            hy = poy + t_hit * doy
            ok = (jnp.abs(hx) <= 1.0) & (jnp.abs(hy) <= 1.0) & (t_hit > BIAS)
            t_hit = jnp.where(ok, t_hit, BIGFLOAT)

        take = t_hit < t_best
        t_best = jnp.where(take, t_hit, t_best)
        idx_best = jnp.where(take, prim, idx_best)

    t_out[:] = t_best
    idx_out[:] = jnp.maximum(idx_best, 0)


def _shadow_kernel(kinds, m_ref, t_ref, px, py, pz, dx, dy, dz, tmax,
                   occ_out):
    """Any-hit: occluded when ANY primitive has BIAS < t < t_max."""
    rpx, rpy, rpz = px[:], py[:], pz[:]
    rdx, rdy, rdz = dx[:], dy[:], dz[:]
    t_max = tmax[:]
    occluded = jnp.zeros(rpx.shape, jnp.bool_)

    for prim in range(len(kinds)):
        m00 = m_ref[prim, 0]
        m01 = m_ref[prim, 1]
        m02 = m_ref[prim, 2]
        m10 = m_ref[prim, 3]
        m11 = m_ref[prim, 4]
        m12 = m_ref[prim, 5]
        m20 = m_ref[prim, 6]
        m21 = m_ref[prim, 7]
        m22 = m_ref[prim, 8]
        tx = t_ref[prim, 0]
        ty = t_ref[prim, 1]
        tz = t_ref[prim, 2]

        relx = rpx - tx
        rely = rpy - ty
        relz = rpz - tz
        pox = m00 * relx + m01 * rely + m02 * relz
        poy = m10 * relx + m11 * rely + m12 * relz
        poz = m20 * relx + m21 * rely + m22 * relz
        dox = m00 * rdx + m01 * rdy + m02 * rdz
        doy = m10 * rdx + m11 * rdy + m12 * rdz
        doz = m20 * rdx + m21 * rdy + m22 * rdz

        if kinds[prim] == KIND_SPHERE:
            a = dox * dox + doy * doy + doz * doz
            b = 2.0 * (pox * dox + poy * doy + poz * doz)
            c = pox * pox + poy * poy + poz * poz - 1.0
            delta = b * b - 4.0 * a * c
            sq = jnp.sqrt(jnp.maximum(delta, 0.0))
            rcp2a = 0.5 / a
            t1 = (-b - sq) * rcp2a
            t2 = (-b + sq) * rcp2a
            t_hit = jnp.where(t1 > BIAS, t1, jnp.where(t2 > BIAS, t2, BIGFLOAT))
            t_hit = jnp.where(delta >= 0.0, t_hit, BIGFLOAT)
        else:
            safe = jnp.where(jnp.abs(doz) < PLANE_EPS, jnp.inf, doz)
            t_hit = -poz / safe
            hx = pox + t_hit * dox
            hy = poy + t_hit * doy
            ok = (jnp.abs(hx) <= 1.0) & (jnp.abs(hy) <= 1.0) & (t_hit > BIAS)
            t_hit = jnp.where(ok, t_hit, BIGFLOAT)

        occluded = occluded | (t_hit < t_max)

    occ_out[:] = occluded


@partial(jax.jit, static_argnames=("kinds", "interpret"))
def shadow_analytic_pallas(p, d, t_max, prims: AnalyticPrims, kinds: tuple,
                           interpret: bool = False):
    """Fused any-hit occlusion vs all analytic prims. Returns occluded [B]."""
    num = p.shape[0]
    pad = (-num) % BLOCK
    pp = jnp.pad(p, ((0, pad), (0, 0)))
    dd = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    tm = jnp.pad(t_max, (0, pad))  # padded t_max = 0 -> never occluded
    total = num + pad
    grid = total // BLOCK

    def shape2(x):
        return x.reshape(total // LANES, LANES)

    comps = [shape2(pp[:, k]) for k in range(3)] + [
        shape2(dd[:, k]) for k in range(3)
    ] + [shape2(tm)]

    block_spec = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    small = pl.BlockSpec(memory_space=pltpu.VMEM)

    occ = pl.pallas_call(
        partial(_shadow_kernel, kinds),
        grid=(grid,),
        in_specs=[small, small] + [block_spec] * 7,
        out_specs=block_spec,
        out_shape=jax.ShapeDtypeStruct((total // LANES, LANES), jnp.bool_),
        interpret=interpret,
    )(prims.m_w2o.reshape(-1, 9), prims.t_o2w, *comps)

    return occ.reshape(-1)[:num]


@partial(jax.jit, static_argnames=("kinds", "interpret"))
def _closest_analytic_pallas_raw(p, d, prims: AnalyticPrims, kinds: tuple,
                                 interpret: bool = False):
    """Forward-only fused closest_analytic (the Pallas kernel itself)."""
    num = p.shape[0]
    pad = (-num) % BLOCK
    pp = jnp.pad(p, ((0, pad), (0, 0)))
    dd = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    total = num + pad
    grid = total // BLOCK

    def shape2(x):
        return x.reshape(total // LANES, LANES)

    comps = [shape2(pp[:, k]) for k in range(3)] + [
        shape2(dd[:, k]) for k in range(3)
    ]

    m_flat = prims.m_w2o.reshape(-1, 9)
    t_flat = prims.t_o2w

    block_spec = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    small = pl.BlockSpec(memory_space=pltpu.VMEM)

    t_out, idx_out = pl.pallas_call(
        partial(_kernel, kinds),
        grid=(grid,),
        in_specs=[small, small] + [block_spec] * 6,
        out_specs=(block_spec, block_spec),
        out_shape=(
            jax.ShapeDtypeStruct((total // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((total // LANES, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(m_flat, t_flat, *comps)

    return t_out.reshape(-1)[:num], idx_out.reshape(-1)[:num]


def _kernel_full(kinds, want_uv, m_ref, t_ref,
                 px, py, pz, dx, dy, dz,
                 t_out, idx_out, nx_out, ny_out, nz_out,
                 u_out, v_out, front_out, hx_out, hy_out, hz_out):
    """Closest hit + winner attributes in ONE kernel.

    Emits everything trace_closest's analytic branch needs (t, prim idx,
    material id, world normal, uv, front flag, world hit point), so the
    XLA-side per-bounce attribute chain (winner gathers, einsum transforms,
    normalize, uv trig — each a separate multi-ms elementwise pass on this
    runtime) collapses into the intersection kernel. Attribute math matches
    ops/intersect.analytic_hit_attrs == Sphere/Plane::IntersectRay
    (objects/objects.cpp:48-53, 55-208). Miss lanes get benign constants
    (n=(0,0,1), uv=0, front=True, mtl of prim 0) — downstream radiance is
    masked by `hit` exactly as with the XLA path.
    """
    rpx, rpy, rpz = px[:], py[:], pz[:]
    rdx, rdy, rdz = dx[:], dy[:], dz[:]

    t_best = jnp.full(rpx.shape, BIGFLOAT, jnp.float32)
    idx_best = jnp.full(rpx.shape, -1, jnp.int32)
    nx_b = jnp.zeros(rpx.shape, jnp.float32)
    ny_b = jnp.zeros(rpx.shape, jnp.float32)
    nz_b = jnp.ones(rpx.shape, jnp.float32)
    u_b = jnp.zeros(rpx.shape, jnp.float32)
    v_b = jnp.zeros(rpx.shape, jnp.float32)
    front_b = jnp.ones(rpx.shape, jnp.float32)

    for prim in range(len(kinds)):
        m00 = m_ref[prim, 0]
        m01 = m_ref[prim, 1]
        m02 = m_ref[prim, 2]
        m10 = m_ref[prim, 3]
        m11 = m_ref[prim, 4]
        m12 = m_ref[prim, 5]
        m20 = m_ref[prim, 6]
        m21 = m_ref[prim, 7]
        m22 = m_ref[prim, 8]
        tx = t_ref[prim, 0]
        ty = t_ref[prim, 1]
        tz = t_ref[prim, 2]

        relx = rpx - tx
        rely = rpy - ty
        relz = rpz - tz
        pox = m00 * relx + m01 * rely + m02 * relz
        poy = m10 * relx + m11 * rely + m12 * relz
        poz = m20 * relx + m21 * rely + m22 * relz
        dox = m00 * rdx + m01 * rdy + m02 * rdz
        doy = m10 * rdx + m11 * rdy + m12 * rdz
        doz = m20 * rdx + m21 * rdy + m22 * rdz

        if kinds[prim] == KIND_SPHERE:
            a = dox * dox + doy * doy + doz * doz
            b = 2.0 * (pox * dox + poy * doy + poz * doz)
            c = pox * pox + poy * poy + poz * poz - 1.0
            delta = b * b - 4.0 * a * c
            sq = jnp.sqrt(jnp.maximum(delta, 0.0))
            rcp2a = 0.5 / a
            t1 = (-b - sq) * rcp2a
            t2 = (-b + sq) * rcp2a
            t_hit = jnp.where(t1 > BIAS, t1, jnp.where(t2 > BIAS, t2, BIGFLOAT))
            t_hit = jnp.where(delta >= 0.0, t_hit, BIGFLOAT)
        else:  # plane
            safe = jnp.where(jnp.abs(doz) < PLANE_EPS, jnp.inf, doz)
            t_hit = -poz / safe
            hx_ = pox + t_hit * dox
            hy_ = poy + t_hit * doy
            ok = (jnp.abs(hx_) <= 1.0) & (jnp.abs(hy_) <= 1.0) & (t_hit > BIAS)
            t_hit = jnp.where(ok, t_hit, BIGFLOAT)

        take = t_hit < t_best
        # Attributes at this prim's hit (evaluated at a benign t if miss —
        # values are only consumed under `take`).
        t_eval = jnp.where(t_hit < BIGFLOAT, t_hit, 1.0)
        hpx = pox + t_eval * dox
        hpy = poy + t_eval * doy
        hpz = poz + t_eval * doz
        if kinds[prim] == KIND_SPHERE:
            inv = jax.lax.rsqrt(
                jnp.maximum(hpx * hpx + hpy * hpy + hpz * hpz, 1e-30)
            )
            nox = hpx * inv
            noy = hpy * inv
            noz = hpz * inv
            if want_uv:
                # Mosaic has no atan2/asin intrinsics: polynomial port
                # (Sphere_TexCoord, objects.cpp:48-53). jnp.arctan2 here
                # crashed every textured-scene closest-hit on TPU.
                from qaray_tpu.ops.pallas_pathtrace import _asin, _atan2

                u_p = 0.5 - _atan2(hpx, hpy) * (0.5 / np.pi)
                v_p = 0.5 + _asin(noz) * (1.0 / np.pi)
            else:
                u_p = jnp.zeros_like(hpx)
                v_p = jnp.zeros_like(hpx)
        else:
            nox = jnp.zeros_like(hpx)
            noy = jnp.zeros_like(hpx)
            noz = jnp.ones_like(hpx)
            if want_uv:
                u_p = (hpx + 1.0) * 0.5
                v_p = (hpy + 1.0) * 0.5
            else:
                u_p = jnp.zeros_like(hpx)
                v_p = jnp.zeros_like(hpx)
        front_p = jnp.where(
            (nox * dox + noy * doy + noz * doz) <= 0.0, 1.0, 0.0
        )
        # World normal: normalize(M_w2o^T @ n_obj) (core/transform.cpp:49-56).
        nwx = m00 * nox + m10 * noy + m20 * noz
        nwy = m01 * nox + m11 * noy + m21 * noz
        nwz = m02 * nox + m12 * noy + m22 * noz
        ninv = jax.lax.rsqrt(
            jnp.maximum(nwx * nwx + nwy * nwy + nwz * nwz, 1e-30)
        )

        t_best = jnp.where(take, t_hit, t_best)
        idx_best = jnp.where(take, prim, idx_best)
        nx_b = jnp.where(take, nwx * ninv, nx_b)
        ny_b = jnp.where(take, nwy * ninv, ny_b)
        nz_b = jnp.where(take, nwz * ninv, nz_b)
        u_b = jnp.where(take, u_p, u_b)
        v_b = jnp.where(take, v_p, v_b)
        front_b = jnp.where(take, front_p, front_b)

    t_out[:] = t_best
    idx_out[:] = jnp.maximum(idx_best, 0)
    nx_out[:] = nx_b
    ny_out[:] = ny_b
    nz_out[:] = nz_b
    u_out[:] = u_b
    v_out[:] = v_b
    front_out[:] = front_b
    # World hit point at the benign-t discipline (t_attr = 1 on miss,
    # ops/trace.py NaN-guard).
    t_eval = jnp.where(t_best < BIGFLOAT, t_best, 1.0)
    hx_out[:] = rpx + t_eval * rdx
    hy_out[:] = rpy + t_eval * rdy
    hz_out[:] = rpz + t_eval * rdz


@partial(jax.jit, static_argnames=("kinds", "want_uv", "interpret"))
def _closest_full_raw(p, d, prims: AnalyticPrims, kinds: tuple,
                      want_uv: bool = True,
                      interpret: bool = False):
    """Fused closest hit + winner attributes.

    Returns a dict: t [B], prim_idx [B], and the analytic_hit_attrs fields
    (p, n, uvw, front, mtl, has_texture) — one kernel instead of the
    intersect + gather + transform + normalize + trig chain. Attributes are
    detached (stop_gradient); t carries the winner-only custom_vjp of
    closest_analytic_pallas via the caller's choice (this function itself is
    used in the non-differentiated forward; diff.py's parameter gradients
    never flow through geometry attrs).
    """
    num = p.shape[0]
    pad = (-num) % BLOCK
    pp = jnp.pad(p, ((0, pad), (0, 0)))
    dd = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    total = num + pad
    grid = total // BLOCK

    def shape2(x):
        return x.reshape(total // LANES, LANES)

    comps = [shape2(pp[:, k]) for k in range(3)] + [
        shape2(dd[:, k]) for k in range(3)
    ]

    block_spec = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    rows = total // LANES
    f32s = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    i32s = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)

    outs = pl.pallas_call(
        partial(_kernel_full, kinds, want_uv),
        grid=(grid,),
        in_specs=[small, small] + [block_spec] * 6,
        out_specs=(block_spec,) * 11,
        out_shape=(f32s, i32s, f32s, f32s, f32s, f32s, f32s, f32s,
                   f32s, f32s, f32s),
        interpret=interpret,
    )(prims.m_w2o.reshape(-1, 9), prims.t_o2w, *comps)

    def flat(x):
        return x.reshape(-1)[:num]

    t, idx, nx, ny, nz, u, v, front, hx, hy, hz = outs
    sg = jax.lax.stop_gradient
    idx_flat = flat(idx)
    return {
        "t": flat(t),
        "prim_idx": idx_flat,
        "mtl": prims.mtl[idx_flat],
        "n": sg(jnp.stack([flat(nx), flat(ny), flat(nz)], axis=-1)),
        "uvw": sg(
            jnp.stack([flat(u), flat(v), jnp.zeros((num,), jnp.float32)],
                      axis=-1)
        ),
        "front": flat(front) > 0.5,
        "p": sg(jnp.stack([flat(hx), flat(hy), flat(hz)], axis=-1)),
        "has_texture": jnp.ones((num,), bool),
    }


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, winner-only XLA backward
# ---------------------------------------------------------------------------


def _winner_t(p, d, m_all, t_all, idx, kinds, t_fwd):
    """Differentiable re-derivation of the winning primitive's t.

    Gathers ONLY the winner per lane (O(B), vs the XLA path's O(B*P)
    backward) and evaluates the same sphere/plane math as the kernel
    (objects/objects.cpp:55-208). Miss lanes return a constant, so their
    cotangent contributes nothing.
    """
    m = m_all[idx]  # [B,3,3]
    tr = t_all[idx]  # [B,3]
    po = jnp.einsum("bij,bj->bi", m, p - tr, precision="highest")
    do = jnp.einsum("bij,bj->bi", m, d, precision="highest")

    # Sphere: smaller positive quadratic root.
    a = jnp.sum(do * do, axis=-1)
    b = 2.0 * jnp.sum(po * do, axis=-1)
    c = jnp.sum(po * po, axis=-1) - 1.0
    delta = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(delta, 1e-12))  # clamped: finite grazing grads
    rcp2a = 0.5 / jnp.maximum(a, 1e-20)
    t1 = (-b - sq) * rcp2a
    t2 = (-b + sq) * rcp2a
    t_sph = jnp.where(t1 > BIAS, t1, t2)

    # Plane: t = -z / dz.
    doz = do[..., 2]
    safe = jnp.where(jnp.abs(doz) < PLANE_EPS, PLANE_EPS, doz)
    t_pln = -po[..., 2] / safe

    kind_arr = jnp.asarray(kinds, jnp.int32)[idx]
    tw = jnp.where(kind_arr == KIND_SPHERE, t_sph, t_pln)
    hit = t_fwd < BIGFLOAT
    return jnp.where(hit, tw, 0.0)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def closest_analytic_pallas(p, d, prims: AnalyticPrims, kinds: tuple,
                            interpret: bool = False):
    """Drop-in fused closest_analytic. kinds: static tuple of prim kinds.

    Returns (t [B], prim_idx [B]) like ops.intersect.closest_analytic.
    B is padded to the 1024-lane block internally. Differentiable: the
    backward pass re-derives the winner's t with XLA math (custom_vjp), so
    the grad path no longer needs QARAY_NO_PALLAS.
    """
    return _closest_analytic_pallas_raw(p, d, prims, kinds, interpret)


def _closest_fwd(p, d, prims, kinds, interpret=False):
    t, idx = _closest_analytic_pallas_raw(p, d, prims, kinds, interpret)
    return (t, idx), (p, d, prims, t, idx)


def _closest_bwd(kinds, interpret, res, cts):
    p, d, prims, t, idx = res
    dt = cts[0]  # prim_idx is integer -> no cotangent

    def f(p_, d_, m_, tr_):
        return _winner_t(p_, d_, m_, tr_, idx, kinds, t)

    _, vjp = jax.vjp(f, p, d, prims.m_w2o, prims.t_o2w)
    gp, gd, gm, gtr = vjp(dt)
    gprims = jax.tree.map(jnp.zeros_like, prims)._replace(m_w2o=gm, t_o2w=gtr)
    return gp, gd, gprims


closest_analytic_pallas.defvjp(_closest_fwd, _closest_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def closest_analytic_full_pallas(p, d, prims: AnalyticPrims, kinds: tuple,
                                 want_uv: bool = True,
                                 interpret: bool = False):
    """Differentiable wrapper over the fused closest+attrs kernel.

    The backward pass re-derives the winner's t with XLA math (same
    _winner_t as closest_analytic_pallas); attribute cotangents (n, uvw,
    p, front) are dropped — they carry only geometry/camera sensitivities,
    which the detached-sampling estimator excludes by design (diff.py:
    gradients target material/light/texture parameters)."""
    return _closest_full_raw(p, d, prims, kinds, want_uv, interpret)


def _closest_full_fwd(p, d, prims, kinds, want_uv=True, interpret=False):
    out = _closest_full_raw(p, d, prims, kinds, want_uv, interpret)
    return out, (p, d, prims, out["t"], out["prim_idx"])


def _closest_full_bwd(kinds, want_uv, interpret, res, ct):
    p, d, prims, t, idx = res
    dt = ct["t"]

    def f(p_, d_, m_, tr_):
        return _winner_t(p_, d_, m_, tr_, idx, kinds, t)

    _, vjp = jax.vjp(f, p, d, prims.m_w2o, prims.t_o2w)
    gp, gd, gm, gtr = vjp(dt)
    gprims = jax.tree.map(jnp.zeros_like, prims)._replace(m_w2o=gm, t_o2w=gtr)
    return gp, gd, gprims


closest_analytic_full_pallas.defvjp(_closest_full_fwd, _closest_full_bwd)
