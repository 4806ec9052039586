"""Tiled packet-culled mesh traversal: the large-mesh TPU path.

Why a third mesh path exists: measured on the real chip, the per-lane BVH
walks (ops/bvh_packed.py) execute their per-lane HBM gathers so slowly that
closest-hit throughput lands around 0.02 Mray/s at 1e5 triangles — per-lane
divergent gathers are simply not a TPU shape (this only became visible once
bench timing forced real completion; see bench.py's sync note). The dense
sweep (ops/mesh_stream.py) is fast but O(rays x tris): beyond a few hundred
thousand triangles the FLOPs wall hits. This module keeps the sweep's
gather-free inner loop but adds one level of spatial culling, packet-style:

  build (host):
    - Sort triangles by the Morton code of their centroids, group into
      clusters of K=256 contiguous rows, one AABB per cluster.
    - Precompute the linear-in-t sweep coefficients (mesh_stream math) in
      sorted order; keep a row -> original-triangle-id map.

  traverse (device):
    - Partition rays into packets of Q contiguous lanes (camera batches are
      spatially coherent; secondary bounces pay more clusters, never
      wrong answers).
    - Per packet, a CONSERVATIVE interval-arithmetic slab test of the
      packet's (origin-box x inverse-direction-interval) against all C
      cluster AABBs — one dense [C] pass, no per-ray work. Any ray that
      hits a cluster implies the packet test passes (proof in _packet_cull).
    - Per packet, order hit clusters first (argsort of the mask), then all
      packets advance in LOCK STEP through their personal cluster lists:
      each step block-gathers one K-row cluster per packet ([G] contiguous
      12KB slices — a fat gather, not a per-lane one) and runs the
      [Q, K] dense sweep test on the MXU. A while_loop ends when every
      packet has exhausted its list, so total steps = max clusters hit by
      any packet.
    - The winner (and runner-up) is re-derived with the exact reference
      triangle test, exactly like the flat sweep.

Reference semantics matched: closest hit == BVH walk == dense sweep
(equivalence-tested); any-hit matches GenLight::Shadow occlusion
(objects/objects.cpp:324-419 is the loop being replaced).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from qaray_tpu.core.constants import BIAS, BIGFLOAT
from qaray_tpu.ops.intersect import intersect_triangles
from qaray_tpu.ops.mesh_stream import _chunk_test, build_stream

CLUSTER = 256  # triangles per cluster == sweep chunk
PACKET = 4096  # rays per packet


class TiledMesh(NamedTuple):
    coeff: jnp.ndarray  # [Fp, 3, 3] sweep coefficients, Morton order
    const: jnp.ndarray  # [Fp, 4]
    gid: jnp.ndarray  # [Fp] original triangle id (int32; -1 padding)
    cbounds: jnp.ndarray  # [C, 6] cluster AABBs (min xyz, max xyz)


def _morton3(x: np.ndarray) -> np.ndarray:
    """[N,3] float -> 30-bit interleaved Morton codes."""
    lo = x.min(axis=0)
    ext = np.maximum(x.max(axis=0) - lo, 1e-12)
    q = np.clip(((x - lo) / ext * 1023.0), 0, 1023).astype(np.uint64)

    def spread(v):
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return (
        spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
        | (spread(q[:, 2]) << np.uint64(2))
    )


def build_tiles(tri_v: np.ndarray, cluster: int = CLUSTER) -> TiledMesh:
    """Host build: Morton sort + cluster AABBs + sweep coefficients."""
    tri_v = np.asarray(tri_v, np.float32)
    num = tri_v.shape[0]
    if num == 0:
        z3 = np.zeros((cluster, 3, 3), np.float32)
        return TiledMesh(
            coeff=jnp.asarray(z3),
            const=jnp.asarray(np.zeros((cluster, 4), np.float32)),
            gid=jnp.asarray(np.full(cluster, -1, np.int32)),
            cbounds=jnp.asarray(
                np.concatenate(
                    [np.full((1, 3), 1.0, np.float32),
                     np.full((1, 3), -1.0, np.float32)], axis=1
                )
            ),  # empty box: min > max, never hit
        )
    order = np.argsort(_morton3(tri_v.mean(axis=1)), kind="stable")
    sorted_v = tri_v[order]
    stream = build_stream(sorted_v, chunk=cluster)  # pads to cluster multiple
    fp = stream.coeff.shape[0]
    gid = np.full(fp, -1, np.int32)
    gid[:num] = order.astype(np.int32)

    nc = fp // cluster
    # Vectorized cluster AABBs: pad the sorted verts to the padded row
    # count with the LAST triangle repeated (padding rows never hit; the
    # repeats only keep a partially-padded tail cluster's box valid).
    pad_rows = fp - num
    padded = np.concatenate(
        [sorted_v]
        + ([np.broadcast_to(sorted_v[-1:], (pad_rows, 3, 3))] if pad_rows
           else [])
    ).reshape(nc, cluster * 3, 3)
    cb = np.concatenate(
        [padded.min(axis=1), padded.max(axis=1)], axis=1
    ).astype(np.float32)
    # Clusters made ENTIRELY of padding get an inverted never-hit box so
    # the packet cull rejects them outright.
    all_pad = np.arange(nc) * cluster >= num
    cb[all_pad, 0:3] = 1.0
    cb[all_pad, 3:6] = -1.0
    return TiledMesh(
        coeff=stream.coeff,
        const=stream.const,
        gid=jnp.asarray(gid),
        cbounds=jnp.asarray(cb),
    )


def _packet_cull(po, pd, t_hi, cbounds):
    """Conservative packet-vs-cluster test.

    po, pd: [Q,3] packet rays; t_hi: scalar upper bound on useful t.
    Returns hit mask [C].

    Correctness: per ray r and axis k, the slab times t = (b - o_k(r)) *
    inv_k(r) lie inside the interval product P_k = [(b - o_hi/lo) x
    inv_lo/hi] (endpoint products, min/max over the four combinations per
    bound). A ray's near_k >= P_lo_k(entry side) and far_k <= P_hi_k, so
    `hit => max_k near_k <= min_k far_k => max_k P_lo_k <= min_k P_hi_k`,
    i.e. the packet test can only over-accept (false positives get paid for
    in the dense test, never wrong answers). Axes where the packet's
    direction components span zero (or are tiny) get (-inf, +inf) — fully
    conservative, mirroring the 1e-7 parallel-axis guard.
    """
    o_lo = jnp.min(po, axis=0)  # [3]
    o_hi = jnp.max(po, axis=0)
    d_lo = jnp.min(pd, axis=0)
    d_hi = jnp.max(pd, axis=0)
    eps = 1e-7
    mixed = (d_lo < eps) & (d_hi > -eps)  # spans zero or touches it
    safe_lo = jnp.where(jnp.abs(d_lo) < eps, eps, d_lo)
    safe_hi = jnp.where(jnp.abs(d_hi) < eps, eps, d_hi)
    r1 = 1.0 / safe_lo
    r2 = 1.0 / safe_hi
    r_lo = jnp.minimum(r1, r2)
    r_hi = jnp.maximum(r1, r2)

    bmin = cbounds[:, :3]  # [C,3]
    bmax = cbounds[:, 3:]

    def interval(b):  # b [C,3] -> (lo [C,3], hi [C,3]) of (b - o) * r
        a_lo = b - o_hi
        a_hi = b - o_lo
        prods = jnp.stack(
            [a_lo * r_lo, a_lo * r_hi, a_hi * r_lo, a_hi * r_hi], axis=0
        )
        return jnp.min(prods, axis=0), jnp.max(prods, axis=0)

    lo1, hi1 = interval(bmin)
    lo2, hi2 = interval(bmax)
    near_lo = jnp.minimum(lo1, lo2)  # lower bound of per-ray near_k
    far_hi = jnp.maximum(hi1, hi2)  # upper bound of per-ray far_k
    near_lo = jnp.where(mixed[None, :], -BIGFLOAT, near_lo)
    far_hi = jnp.where(mixed[None, :], BIGFLOAT, far_hi)
    entry = jnp.max(near_lo, axis=-1)  # [C]
    exit_ = jnp.min(far_hi, axis=-1)
    nonempty = jnp.all(cbounds[:, :3] <= cbounds[:, 3:], axis=-1)
    return (entry <= exit_) & (exit_ > BIAS) & (entry < t_hi) & nonempty


@partial(jax.jit, static_argnames=("packet", "cluster", "any_hit"))
def tiled_sweep(p, d, t_cur, tiles: TiledMesh, packet: int = PACKET,
                cluster: int = CLUSTER, any_hit: bool = False):
    """Closest (default) or any-hit sweep over the tiled mesh.

    closest: returns (t_sweep [B], row [B] sorted-row id or -1,
    row2 [B] runner-up) — rows, not original ids; callers map through
    tiles.gid after the exact re-test.
    any_hit: returns occluded [B] (t_cur is the per-ray budget t_max).
    """
    num_rays = p.shape[0]
    pad = (-num_rays) % packet
    pp = jnp.pad(p, ((0, pad), (0, 0)))
    dd = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    tt = jnp.pad(t_cur, (0, pad))  # pad budget 0 -> no work contribution
    g = (num_rays + pad) // packet
    po = pp.reshape(g, packet, 3)
    pd_ = dd.reshape(g, packet, 3)
    pt = tt.reshape(g, packet)

    n_clusters = tiles.cbounds.shape[0]

    # Phase 1: per-packet cluster masks -> ordered cluster lists.
    def cull(o, dvec, tb):
        return _packet_cull(o, dvec, jnp.max(tb), tiles.cbounds)

    masks = jax.vmap(cull)(po, pd_, pt)  # [G, C]
    counts = jnp.sum(masks, axis=-1).astype(jnp.int32)  # [G]
    # Stable argsort of ~mask puts hit clusters first, in spatial order.
    order = jnp.argsort(~masks, axis=-1, stable=True).astype(jnp.int32)

    # Phase 2: lock-step march — one cluster per packet per step.
    if any_hit:
        occ = jnp.zeros((g, packet), bool)

        def cond(state):
            j, occ = state
            live = (j < counts) & ~jnp.all(occ | (pt <= 0.0), axis=-1)
            return jnp.any(live)

        def body(state):
            j, occ = state
            active = j < counts
            cid = order[jnp.arange(g), jnp.minimum(j, n_clusters - 1)]

            def test(cid_g, o, dvec, tb, oc):
                coeff = jax.lax.dynamic_slice_in_dim(
                    tiles.coeff, cid_g * cluster, cluster
                )
                const = jax.lax.dynamic_slice_in_dim(
                    tiles.const, cid_g * cluster, cluster
                )
                t = _chunk_test(o, dvec, coeff, const)
                return oc | jnp.any(t < tb[:, None], axis=1)

            new_occ = jax.vmap(test)(cid, po, pd_, pt, occ)
            occ = jnp.where(active[:, None], new_occ, occ)
            return j + 1, occ

        _, occ = jax.lax.while_loop(cond, body, (jnp.int32(0), occ))
        return occ.reshape(-1)[:num_rays]

    t_best = pt
    row_best = jnp.full((g, packet), -1, jnp.int32)
    t2_best = jnp.full((g, packet), BIGFLOAT)
    row2_best = jnp.full((g, packet), -1, jnp.int32)

    def cond(state):
        j = state[0]
        return jnp.any(j < counts)

    def body(state):
        j, t_best, row_best, t2_best, row2_best = state
        active = j < counts
        cid = order[jnp.arange(g), jnp.minimum(j, n_clusters - 1)]

        def test(cid_g, o, dvec, act):
            coeff = jax.lax.dynamic_slice_in_dim(
                tiles.coeff, cid_g * cluster, cluster
            )
            const = jax.lax.dynamic_slice_in_dim(
                tiles.const, cid_g * cluster, cluster
            )
            t = _chunk_test(o, dvec, coeff, const)  # [Q, K]
            t = jnp.where(act, t, BIGFLOAT)
            imin = jnp.argmin(t, axis=1).astype(jnp.int32)
            tmin = jnp.min(t, axis=1)
            col = jnp.arange(cluster, dtype=jnp.int32)[None, :]
            t_wo = jnp.where(col == imin[:, None], BIGFLOAT, t)
            imin2 = jnp.argmin(t_wo, axis=1).astype(jnp.int32)
            tmin2 = jnp.min(t_wo, axis=1)
            base = cid_g * cluster
            return tmin, base + imin, tmin2, base + imin2

        tmin, rmin, tmin2, rmin2 = jax.vmap(test)(cid, po, pd_, active)
        # Merge running top-2 with the step's top-2 (per ray).
        cand_t = jnp.stack([t_best, t2_best, tmin, tmin2], axis=-1)
        cand_r = jnp.stack([row_best, row2_best, rmin, rmin2], axis=-1)
        srt = jnp.argsort(cand_t, axis=-1)
        top_t = jnp.take_along_axis(cand_t, srt[..., :2], axis=-1)
        top_r = jnp.take_along_axis(cand_r, srt[..., :2], axis=-1)
        return (
            j + 1,
            top_t[..., 0],
            top_r[..., 0],
            top_t[..., 1],
            top_r[..., 1],
        )

    state = (jnp.int32(0), t_best, row_best, t2_best, row2_best)
    _, t_best, row_best, t2_best, row2_best = jax.lax.while_loop(
        cond, body, state
    )
    # Seed rows (t_cur with row -1) may occupy slots; mark rows invalid
    # where the recorded t equals the untouched seed.
    row2_best = jnp.where(t2_best < BIGFLOAT, row2_best, -1)
    return (
        t_best.reshape(-1)[:num_rays],
        row_best.reshape(-1)[:num_rays],
        row2_best.reshape(-1)[:num_rays],
    )


def coherence_order(p, d, scene_lo, scene_hi):
    """Sort key for ray coherence: a 15-bit Morton code of the origin
    (high bits) then a 15-bit Morton code of the DIRECTION. Packets of
    sorted rays share tight origin-boxes and narrow direction intervals —
    exactly what `_packet_cull`'s interval test needs. The direction bits
    matter most for pinhole-camera batches, where every origin is
    identical and an origin-only key (the r03 version) degenerated to no
    sort at all: terrain-style wide scanline packets then spanned the whole
    frustum and culled nothing. Returns the permutation [B].

    Pure reordering: the sweep's winners are per-ray, so sorting + inverse
    scatter is bit-neutral on results (tested).
    """
    ext = jnp.maximum(scene_hi - scene_lo, 1e-12)
    q = jnp.clip((p - scene_lo) / ext * 31.0, 0.0, 31.0).astype(jnp.uint32)
    qd = jnp.clip((d + 1.0) * 15.999, 0.0, 31.0).astype(jnp.uint32)

    def spread5(v):  # 5 bits -> every 3rd position
        v = (v | (v << 8)) & jnp.uint32(0x0100F)
        v = (v | (v << 4)) & jnp.uint32(0x010C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249)
        return v

    def morton(a):
        return (
            spread5(a[:, 0]) | (spread5(a[:, 1]) << 1)
            | (spread5(a[:, 2]) << 2)
        )

    key = (morton(q) << 15) | morton(qd)
    return jnp.argsort(key)


def exact_winner_rows(p, d, rows, tiles: TiledMesh, tri_v):
    """Exact re-test of per-ray winner rows; returns (t, bary, front, valid,
    gid) with gid the ORIGINAL triangle id (reference numerics, one [B]
    gather)."""
    safe = jnp.maximum(rows, 0)
    gid = tiles.gid[safe]
    valid_row = (rows >= 0) & (gid >= 0)
    v = tri_v[jnp.maximum(gid, 0)]
    t, bary, front, hit = intersect_triangles(
        p, d, v[:, 0], v[:, 1], v[:, 2], jnp.full(p.shape[:1], BIGFLOAT)
    )
    valid = hit & valid_row
    return jnp.where(valid, t, BIGFLOAT), bary, front, valid, gid
