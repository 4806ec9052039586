"""Pallas TPU kernel: dense triangle sweep with the epilogue fused in VMEM.

The XLA streaming sweep (ops/mesh_stream.py) materializes [B, CHUNK]
intermediates between the coefficient matmuls and the min/argmin epilogue;
on this runtime every such elementwise pass over a [524288, 256] array
costs tens of ms, so the sweep lands near 0.05 Mray/s regardless of the
MXU's speed. This kernel keeps the whole test in registers/VMEM:

  - grid over ray blocks (RAY_BLOCK rays per step, 8-sublane tiles);
  - the full triangle coefficient table lives in VMEM (10 f32 per
    triangle: n, A, B, k, a0, b0 — the mesh_stream linear-in-t math), so
    it must fit: <= ~64k triangles (2.6 MB). Every mesh shipped with the
    reference is well under that; bigger meshes take the tiled path.
  - inner fori over 128-triangle lanes x 8-ray sublanes: broadcasted
    [8, 128] FMAs, running min/argmin folded in registers.

Same hit predicate as ops/mesh_stream._chunk_test (including the
1e-7*|n| parallel guard and t > BIAS), so the winner feeds the same exact
re-test (exact_winner) as the XLA sweep. Returns per-ray (t, row) — the
runner-up fallback is not carried here (the kernel path reports the
sweep's single winner; callers reuse exact_winner's validity mask and the
XLA sweep remains the fallback for edge-case parity studies).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qaray_tpu.core.constants import BIAS, BIGFLOAT

LANES = 128
SUBLANES = 8
RAY_BLOCK = SUBLANES * LANES  # 1024 rays per grid step

# VMEM budget for the coefficient table (10 f32/tri).
PALLAS_MESH_MAX_TRIS = 65536


def _sweep_kernel(n_tris,
                  coeff_ref, px, py, pz, dx, dy, dz, tcur,
                  t_out, row_out, row2_out):
    """One [8,128] ray block vs the whole VMEM triangle table.

    coeff_ref: [Fp, 16]: cols 0-2 n, 3-5 A, 6-8 B, 9 k, 10 a0, 11 b0,
    12 |n|, 13-15 pad. Per triangle: ~13 scalar loads drive ~30 VPU ops on
    the full [8,128] ray tile — the same scalar-prefetch shape as the
    analytic kernel (one fori step per triangle, tiny code, no [B,C]
    intermediates anywhere).
    """
    rpx, rpy, rpz = px[:], py[:], pz[:]
    rdx, rdy, rdz = dx[:], dy[:], dz[:]
    t_in = tcur[:]

    t_best = t_in
    row_best = jnp.full(rpx.shape, -1, jnp.int32)
    t2_best = jnp.full(rpx.shape, BIGFLOAT, jnp.float32)
    row2_best = jnp.full(rpx.shape, -1, jnp.int32)

    def body(j, carry):
        t_best, row_best, t2_best, row2_best = carry
        nx = coeff_ref[j, 0]
        ny = coeff_ref[j, 1]
        nz = coeff_ref[j, 2]
        ax = coeff_ref[j, 3]
        ay = coeff_ref[j, 4]
        az = coeff_ref[j, 5]
        bx = coeff_ref[j, 6]
        by = coeff_ref[j, 7]
        bz = coeff_ref[j, 8]
        kk = coeff_ref[j, 9]
        a0 = coeff_ref[j, 10]
        b0 = coeff_ref[j, 11]
        nl = coeff_ref[j, 12]

        pn = rpx * nx + rpy * ny + rpz * nz  # [8,128]
        dn = rdx * nx + rdy * ny + rdz * nz
        pa = rpx * ax + rpy * ay + rpz * az
        da = rdx * ax + rdy * ay + rdz * az
        pb = rpx * bx + rpy * by + rpz * bz
        db = rdx * bx + rdy * by + rdz * bz
        safe = jnp.where(jnp.abs(dn) < 1e-30, 1e-30, dn)
        t = (kk - pn) / safe
        parallel = jnp.abs(dn) < 1e-7 * nl
        a = pa + t * da + a0
        b = pb + t * db + b0
        c = 1.0 - a - b
        ok = (
            (~parallel) & (t > BIAS) & (a >= 0.0) & (b >= 0.0) & (c >= 0.0)
        )
        take = ok & (t < t_best)
        # Runner-up: the displaced winner, or this t when it lands between
        # best and second-best (same top-2 semantics as stream_closest).
        take2 = ok & ~take & (t < t2_best)
        t2_best = jnp.where(take, t_best, jnp.where(take2, t, t2_best))
        row2_best = jnp.where(
            take, row_best, jnp.where(take2, j, row2_best)
        )
        t_best = jnp.where(take, t, t_best)
        row_best = jnp.where(take, j, row_best)
        return t_best, row_best, t2_best, row2_best

    t_best, row_best, t2_best, row2_best = jax.lax.fori_loop(
        0, n_tris, body, (t_best, row_best, t2_best, row2_best)
    )
    t_out[:] = t_best
    row_out[:] = jnp.where(t_best < t_in, row_best, -1)
    row2_out[:] = jnp.where(t2_best < BIGFLOAT, row2_best, -1)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_sweep_closest(p, d, t_cur, coeff16, interpret: bool = False):
    """Dense closest sweep; coeff16 [Fp, 16] from pack_coeff16.

    Returns (t [B], row [B] or -1, row2 [B] runner-up or -1). Fp must be
    a multiple of 128.
    """
    num = p.shape[0]
    fp = coeff16.shape[0]
    assert fp % LANES == 0
    pad = (-num) % RAY_BLOCK
    pp = jnp.pad(p, ((0, pad), (0, 0)))
    dd = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    tt = jnp.pad(t_cur, (0, pad))
    total = num + pad
    grid = total // RAY_BLOCK

    def shape2(x):
        return x.reshape(total // LANES, LANES)

    comps = [shape2(pp[:, k]) for k in range(3)] + [
        shape2(dd[:, k]) for k in range(3)
    ] + [shape2(tt)]

    block_spec = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    rows = total // LANES
    t_out, row_out, row2_out = pl.pallas_call(
        partial(_sweep_kernel, fp),
        grid=(grid,),
        in_specs=[small] + [block_spec] * 7,
        out_specs=(block_spec, block_spec, block_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(coeff16, *comps)
    return (
        t_out.reshape(-1)[:num],
        row_out.reshape(-1)[:num],
        row2_out.reshape(-1)[:num],
    )


def pack_coeff16(stream_coeff, stream_const) -> np.ndarray:
    """StreamTris arrays -> [Fp, 16] layout the kernel reads.

    cols: 0-2 n, 3-5 A, 6-8 B, 9 k, 10 a0, 11 b0, 12 |n|, 13-15 zero.
    Pads rows to a 128 multiple (pad rows never hit: k=0, n=0 -> t=0 fails
    t > BIAS — same argument as mesh_stream.build_stream padding).
    """
    coeff = np.asarray(stream_coeff, np.float32)  # [F,3,3]
    const = np.asarray(stream_const, np.float32)  # [F,4]
    f = coeff.shape[0]
    out = np.zeros((f, 16), np.float32)
    out[:, 0:3] = coeff[:, 0]
    out[:, 3:6] = coeff[:, 1]
    out[:, 6:9] = coeff[:, 2]
    out[:, 9] = const[:, 0]
    out[:, 10] = const[:, 1]
    out[:, 11] = const[:, 2]
    out[:, 12] = const[:, 3]
    pad = (-f) % LANES
    if pad:
        out = np.concatenate([out, np.zeros((pad, 16), np.float32)])
    return out
