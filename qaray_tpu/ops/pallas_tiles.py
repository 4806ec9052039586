"""Pallas TPU kernel: cluster-culled large-mesh sweep, VMEM-resident.

This replaces the per-step XLA machinery of ops/mesh_tiles.tiled_sweep
(dynamic_slice + _chunk_test + argsort top-2 merge — each a separate
multi-ms elementwise pass on this runtime) with ONE kernel per dispatch:

  host (XLA, cheap):  per ray-packet conservative cluster cull
                      (ops/mesh_tiles._packet_cull interval arithmetic,
                      extended to return each cluster's ENTRY lower bound),
                      clusters sorted front-to-back by entry.
  kernel (per packet): while clusters remain AND the next cluster's entry
                      lower bound can still beat some lane's current t:
                        DMA the cluster's [32, 128] coefficient slab from
                        HBM into VMEM, run the 256-triangle scalar-load
                        sweep (the measured-fastest inner loop, see
                        ops/pallas_mesh.py), fold per-lane top-2 winners.

Front-to-back ordering + the entry bound turn per-ray work from
O(clusters hit) into O(clusters until closest found): for a ray r hitting a
triangle of cluster c, t_hit >= near_entry(r, c) >= entry_lo(c) (the
interval-arithmetic proof in ops/mesh_tiles._packet_cull), so once
entry_lo exceeds every lane's best t no later cluster can improve and the
packet stops. Any-hit stops when every in-budget lane is occluded.

Winner (row1/t1) semantics identical to tiled_sweep (equivalence-tested);
winners feed the same exact reference re-test (exact_winner_rows). The
RUNNER-UP (row2/t2) may deviate: early termination stops once no later
cluster can beat the best t, so a runner-up living in a never-visited
cluster is missed — if the exact re-test then rejects the winner, the
fallback can differ from the XLA path on that lane (rare near-edge
speckle, bounded by the equivalence tests' outlier budget). Reference
loop replaced: TriObj::TraceBVHNode, objects/objects.cpp:324-419.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qaray_tpu.core.constants import BIAS, BIGFLOAT
from qaray_tpu.ops.mesh_tiles import CLUSTER, TiledMesh

import os

LANES = 128
# Rays per packet = PACKET_ROWS * 128. Smaller packets cull tighter but
# pay more per-packet overhead; 16 rows (2048 rays) measured best on ico
# meshes, env QARAY_PTILE_ROWS for experiments.
PACKET_ROWS = int(os.environ.get("QARAY_PTILE_ROWS", "16"))
PACKET = PACKET_ROWS * LANES


def pack_coeffT(tile_coeff, tile_const) -> np.ndarray:
    """TiledMesh coefficients -> [Fp/8, 128] table: 8 triangles per
    128-lane row, triangle k of a row at columns 16k..16k+12 (the
    pack_coeff16 column order). A cluster is the contiguous [32, 128] row
    slab — full-minor-dim slices are the only HBM shapes Mosaic can DMA,
    and the in-kernel reads use a dynamic SUBLANE index with static lane
    offsets (dynamic lane indices are unsupported)."""
    from qaray_tpu.ops.pallas_mesh import pack_coeff16

    c16 = pack_coeff16(tile_coeff, tile_const)
    c16 = c16[: np.asarray(tile_coeff).shape[0]]
    fp = c16.shape[0]
    assert fp % 8 == 0
    return c16.reshape(fp // 8, 128)


def packet_cull_entry(po, pd, t_hi, cbounds):
    """_packet_cull (ops/mesh_tiles.py) extended to return the conservative
    per-cluster ENTRY lower bound alongside the hit mask."""
    o_lo = jnp.min(po, axis=0)
    o_hi = jnp.max(po, axis=0)
    d_lo = jnp.min(pd, axis=0)
    d_hi = jnp.max(pd, axis=0)
    eps = 1e-7
    mixed = (d_lo < eps) & (d_hi > -eps)
    safe_lo = jnp.where(jnp.abs(d_lo) < eps, eps, d_lo)
    safe_hi = jnp.where(jnp.abs(d_hi) < eps, eps, d_hi)
    r1 = 1.0 / safe_lo
    r2 = 1.0 / safe_hi
    r_lo = jnp.minimum(r1, r2)
    r_hi = jnp.maximum(r1, r2)
    bmin = cbounds[:, :3]
    bmax = cbounds[:, 3:6]

    def interval(b):
        a_lo = b - o_hi
        a_hi = b - o_lo
        prods = jnp.stack(
            [a_lo * r_lo, a_lo * r_hi, a_hi * r_lo, a_hi * r_hi], axis=0
        )
        return jnp.min(prods, axis=0), jnp.max(prods, axis=0)

    lo1, hi1 = interval(bmin)
    lo2, hi2 = interval(bmax)
    near_lo = jnp.minimum(lo1, lo2)
    far_hi = jnp.maximum(hi1, hi2)
    near_lo = jnp.where(mixed[None, :], -BIGFLOAT, near_lo)
    far_hi = jnp.where(mixed[None, :], BIGFLOAT, far_hi)
    entry = jnp.max(near_lo, axis=-1)  # [C]
    exit_ = jnp.min(far_hi, axis=-1)
    nonempty = jnp.all(cbounds[:, :3] <= cbounds[:, 3:6], axis=-1)
    hit = (entry <= exit_) & (exit_ > BIAS) & (entry < t_hi) & nonempty
    return hit, jnp.maximum(entry, 0.0)


def _closest_kernel(n_clusters, cluster, max_steps, order_ref, entry_ref,
                    count_ref, coeffT,
                    px, py, pz, dx, dy, dz, tcur, tcap,
                    t_out, row_out, row2_out, res_out, scratch, sem):
    rpx, rpy, rpz = px[:], py[:], pz[:]
    rdx, rdy, rdz = dx[:], dy[:], dz[:]
    t_in = tcur[:]
    cap = tcap[:]
    count = count_ref[0, 0, 0]

    def tri_body(r8, carry):
        t_b, r_b, t2_b, r2_b, base = carry
        for k in range(8):
            o = 16 * k
            nx = scratch[r8, o + 0]
            ny = scratch[r8, o + 1]
            nz = scratch[r8, o + 2]
            ax = scratch[r8, o + 3]
            ay = scratch[r8, o + 4]
            az = scratch[r8, o + 5]
            bx = scratch[r8, o + 6]
            by = scratch[r8, o + 7]
            bz = scratch[r8, o + 8]
            kk = scratch[r8, o + 9]
            a0 = scratch[r8, o + 10]
            b0 = scratch[r8, o + 11]
            nl = scratch[r8, o + 12]
            pn = rpx * nx + rpy * ny + rpz * nz
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
                (~parallel) & (t > BIAS) & (a >= 0.0) & (b >= 0.0)
                & (c >= 0.0)
            )
            take = ok & (t < t_b)
            take2 = ok & ~take & (t < t2_b)
            row = base + r8 * 8 + k
            t2_b = jnp.where(take, t_b, jnp.where(take2, t, t2_b))
            r2_b = jnp.where(take, r_b, jnp.where(take2, row, r2_b))
            t_b = jnp.where(take, t, t_b)
            r_b = jnp.where(take, row, r_b)
        return t_b, r_b, t2_b, r2_b, base

    def cond(state):
        j, t_b, r_b, t2_b, r2_b = state
        live = j < count
        if max_steps:
            # Budgeted phase-1 march (divergence compaction): stop after
            # max_steps clusters; lanes still improvable are re-packed and
            # finished by the phase-2 dispatch (tiled_closest_twophase).
            live = live & (j < max_steps)
        ent = entry_ref[0, 0, jnp.minimum(j, n_clusters - 1)]
        # Per-lane termination bound: a lane can improve only below
        # min(current best, its root-box exit) — every triangle lies inside
        # the root box, so no hit exists beyond the lane's box exit. This is
        # what lets packets containing all-miss rays terminate.
        return live & (ent <= jnp.max(jnp.minimum(t_b, cap)))

    def body(state):
        j, t_b, r_b, t2_b, r2_b = state
        cid = order_ref[0, 0, jnp.minimum(j, n_clusters - 1)]
        dma = pltpu.make_async_copy(
            coeffT.at[pl.ds(cid * (cluster // 8), cluster // 8), :],
            scratch, sem,
        )
        dma.start()
        dma.wait()
        t_b, r_b, t2_b, r2_b, _ = jax.lax.fori_loop(
            0, cluster // 8, tri_body,
            (t_b, r_b, t2_b, r2_b, cid * cluster),
        )
        return j + 1, t_b, r_b, t2_b, r2_b

    shape = rpx.shape
    init = (
        jnp.int32(0),
        t_in,
        jnp.full(shape, -1, jnp.int32),
        jnp.full(shape, BIGFLOAT, jnp.float32),
        jnp.full(shape, -1, jnp.int32),
    )
    jf, t_b, r_b, t2_b, r2_b = jax.lax.while_loop(cond, body, init)
    t_out[:] = t_b
    row_out[:] = jnp.where(t_b < t_in, r_b, -1)
    row2_out[:] = jnp.where(t2_b < BIGFLOAT, r2_b, -1)
    # A lane is RESOLVED when no unvisited cluster can still improve it:
    # the march is front-to-back, so that is "next entry bound exceeds the
    # lane's min(best t, box exit)" — or the cluster list was exhausted.
    ent_next = entry_ref[0, 0, jnp.minimum(jf, n_clusters - 1)]
    resolved = (jf >= count) | (ent_next > jnp.minimum(t_b, cap))
    res_out[:] = jnp.where(resolved, 1.0, 0.0)


def _anyhit_kernel(n_clusters, cluster, order_ref, entry_ref, count_ref, coeffT,
                   px, py, pz, dx, dy, dz, tmax, tcap,
                   occ_out, scratch, sem):
    rpx, rpy, rpz = px[:], py[:], pz[:]
    rdx, rdy, rdz = dx[:], dy[:], dz[:]
    t_max = tmax[:]
    cap = tcap[:]
    count = count_ref[0, 0, 0]

    def tri_body(r8, carry):
        occf, base = carry
        for k in range(8):
            o = 16 * k
            nx = scratch[r8, o + 0]
            ny = scratch[r8, o + 1]
            nz = scratch[r8, o + 2]
            ax = scratch[r8, o + 3]
            ay = scratch[r8, o + 4]
            az = scratch[r8, o + 5]
            bx = scratch[r8, o + 6]
            by = scratch[r8, o + 7]
            bz = scratch[r8, o + 8]
            kk = scratch[r8, o + 9]
            a0 = scratch[r8, o + 10]
            b0 = scratch[r8, o + 11]
            nl = scratch[r8, o + 12]
            pn = rpx * nx + rpy * ny + rpz * nz
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
                (~parallel) & (t > BIAS) & (a >= 0.0) & (b >= 0.0)
                & (c >= 0.0)
            )
            hit = ok & (t < t_max)
            occf = jnp.maximum(occf, jnp.where(hit, 1.0, 0.0))
        return occf, base

    def cond(state):
        j, occf = state
        live = j < count
        # Stop when every lane with budget is occluded (budget <= BIAS
        # lanes can never record a hit anyway: t > BIAS fails t < t_max).
        open_lanes = jnp.max(
            jnp.where(occf > 0.5, 0.0, jnp.minimum(t_max, cap))
        )
        ent = entry_ref[0, 0, jnp.minimum(j, n_clusters - 1)]
        return live & (open_lanes > BIAS) & (ent <= open_lanes)

    def body(state):
        j, occf = state
        cid = order_ref[0, 0, jnp.minimum(j, n_clusters - 1)]
        dma = pltpu.make_async_copy(
            coeffT.at[pl.ds(cid * (cluster // 8), cluster // 8), :],
            scratch, sem,
        )
        dma.start()
        dma.wait()
        occf, _ = jax.lax.fori_loop(
            0, cluster // 8, tri_body, (occf, cid * cluster)
        )
        return j + 1, occf

    init = (jnp.int32(0), jnp.zeros(rpx.shape, jnp.float32))
    _, occf = jax.lax.while_loop(cond, body, init)
    occ_out[:] = occf


@partial(jax.jit,
         static_argnames=("any_hit", "interpret", "cluster", "packet_rows",
                          "max_steps"))
def pallas_tiled_sweep(p, d, t_cur, tiles: TiledMesh, coeffT,
                       any_hit: bool = False, interpret: bool = False,
                       cluster: int = CLUSTER, packet_rows: int = None,
                       max_steps: int = 0):
    """Drop-in counterpart of ops.mesh_tiles.tiled_sweep on the Pallas path.

    closest: returns (t [B], row [B], row2 [B], resolved [B] f32 0/1)
    (sorted-row ids, -1 = none). max_steps > 0 caps the per-packet cluster
    march (phase-1 of tiled_closest_twophase); lanes with resolved=0 may
    still be improvable by unvisited clusters.
    any_hit: returns occluded [B] (t_cur is the per-ray budget).
    coeffT: [Fp/8, 128] from pack_coeffT (HBM-resident; clusters DMA'd).
    """
    num = p.shape[0]
    packet_rows = PACKET_ROWS if packet_rows is None else packet_rows
    packet = packet_rows * LANES
    pad = (-num) % packet
    pp = jnp.pad(p, ((0, pad), (0, 0)))
    dd = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    tt = jnp.pad(t_cur, (0, pad))  # pad budget 0 -> no work, no hits
    total = num + pad
    g = total // packet
    n_clusters = tiles.cbounds.shape[0]

    po = pp.reshape(g, packet, 3)
    pd_ = dd.reshape(g, packet, 3)
    pt = tt.reshape(g, packet)

    def cull(o, dvec, tb):
        return packet_cull_entry(o, dvec, jnp.max(tb), tiles.cbounds)

    # Per-ray root-box exit: caps each lane's termination bound (no hit
    # can lie beyond the ray's exit from the geometry's bounding box).
    root_lo = jnp.min(tiles.cbounds[:, :3], axis=0)
    root_hi = jnp.max(tiles.cbounds[:, 3:6], axis=0)
    safe_d = jnp.where(jnp.abs(dd) < 1e-7, 1e-7, dd)
    inv = 1.0 / safe_d
    t1 = (root_lo[None, :] - pp) * inv
    t2 = (root_hi[None, :] - pp) * inv
    t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
    mixed_axis = jnp.any(jnp.abs(dd) < 1e-7, axis=-1)
    box_exit = jnp.where(mixed_axis, BIGFLOAT, t_far * 1.0001 + 1e-3)
    box_exit = jnp.maximum(box_exit, 0.0)

    masks, entries = jax.vmap(cull)(po, pd_, pt)  # [G,C], [G,C]
    counts = jnp.sum(masks, axis=-1).astype(jnp.int32)[:, None, None]
    key = jnp.where(masks, entries, BIGFLOAT)
    order = jnp.argsort(key, axis=-1).astype(jnp.int32)  # front-to-back
    entry_sorted = jnp.take_along_axis(key, order, axis=-1)
    # [G, 1, C] so the per-packet block's last two dims equal the array's
    # (the Pallas TPU block-shape divisibility rule).
    order = order[:, None, :]
    entry_sorted = entry_sorted[:, None, :]

    rows = total // LANES

    def shape2(x):
        return x.reshape(rows, LANES)

    comps = [shape2(pp[:, k]) for k in range(3)] + [
        shape2(dd[:, k]) for k in range(3)
    ] + [shape2(tt), shape2(box_exit)]

    block = pl.BlockSpec(
        (packet_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    # SMEM: the kernel reads these one scalar at a time at dynamic
    # indices, which VMEM vector memrefs do not support.
    per_packet = pl.BlockSpec(
        (1, 1, n_clusters), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
    )
    count_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                              memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    scratch_shapes = [
        pltpu.VMEM((cluster // 8, 128), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    f32s = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    i32s = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)

    if any_hit:
        occ = pl.pallas_call(
            partial(_anyhit_kernel, n_clusters, cluster),
            grid=(g,),
            in_specs=[per_packet, per_packet, count_spec, hbm] + [block] * 8,
            out_specs=block,
            out_shape=f32s,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(order, entry_sorted, counts, coeffT, *comps)
        return occ.reshape(-1)[:num] > 0.5

    t, row, row2, res = pl.pallas_call(
        partial(_closest_kernel, n_clusters, cluster, max_steps),
        grid=(g,),
        in_specs=[per_packet, per_packet, count_spec, hbm] + [block] * 8,
        out_specs=(block, block, block, block),
        out_shape=(f32s, i32s, i32s, f32s),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(order, entry_sorted, counts, coeffT, *comps)
    return (
        t.reshape(-1)[:num],
        row.reshape(-1)[:num],
        row2.reshape(-1)[:num],
        res.reshape(-1)[:num],
    )


@partial(jax.jit, static_argnames=("budget", "interpret"))
def tiled_closest_twophase(p, d, t_cur, tiles: TiledMesh, coeffT,
                           budget: int = 12, interpret: bool = False):
    """Divergence-compacted closest hit: budgeted march, re-pack, finish.

    A packet marches clusters until its WORST lane resolves, so one hard
    lane stalls 2047 easy ones (MESH_SCALE.md's 1M-triangle diagnosis).
    Phase 1 marches at most `budget` clusters per packet with the normal
    coherence sort; lanes left improvable are then PACKED TOGETHER (stable
    sort by the resolved flag — preserving coherence order within each
    class) and finished by an unlimited phase 2. Resolved lanes ride along
    with t_in = -1: they cannot be improved (t > BIAS > -1 never beats it)
    and contribute nothing to any packet's termination bound, so
    all-resolved packets terminate at the first entry check.

    Returns (t, row, row2) in the CALLER's ray order (sorting is internal).
    """
    from qaray_tpu.ops.mesh_tiles import coherence_order

    lo = jnp.min(tiles.cbounds[:, :3], axis=0)
    hi = jnp.max(tiles.cbounds[:, 3:6], axis=0)
    perm = coherence_order(p, d, lo, hi)
    inv = jnp.argsort(perm)
    ps, ds, ts = p[perm], d[perm], t_cur[perm]

    if budget <= 0:
        t, r, r2, _ = pallas_tiled_sweep(ps, ds, ts, tiles, coeffT,
                                         interpret=interpret)
        return t[inv], r[inv], r2[inv]

    t1, r1, r21, res = pallas_tiled_sweep(
        ps, ds, ts, tiles, coeffT, interpret=interpret, max_steps=budget
    )
    iota = jnp.arange(ps.shape[0], dtype=jnp.int32)
    perm2 = jnp.argsort(
        jnp.where(res > 0.5, iota + jnp.int32(1 << 30), iota)
    )
    inv2 = jnp.argsort(perm2)
    t_seed = jnp.where(res > 0.5, -1.0, t1)
    t2, r2b, r22, _ = pallas_tiled_sweep(
        ps[perm2], ds[perm2], t_seed[perm2], tiles, coeffT,
        interpret=interpret,
    )
    t2, r2b, r22 = t2[inv2], r2b[inv2], r22[inv2]
    improved = r2b >= 0
    t_f = jnp.where(improved, t2, t1)
    r_f = jnp.where(improved, r2b, r1)
    r2_f = jnp.where(improved, r22, r21)
    return t_f[inv], r_f[inv], r2_f[inv]
