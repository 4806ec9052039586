"""Packed fat-node BVH traversal: one row gather per step.

The stacked walk in ops/bvh_traverse.py re-expresses the reference's
iterative traversal (objects/objects.cpp:324-419) directly: pop a node,
gather its bounds/left/right/count from five separate SoA arrays, test or
push. On TPU every one of those gathers is a full-megabatch HBM
random-access pass, and they dominate the traversal cost.

This variant restructures the *memory layout*, not the algorithm:

- **Fat nodes**: each INNER node's row carries BOTH children's boxes and
  child references — `pnodes: f32[Ni, 16]` = [child0 bmin|bmax (6),
  child1 bmin|bmax (6), bitcast ref0, bitcast ref1, pad, pad]. One gather
  serves the two slab tests that the pop requires. A reference >= 0 is an
  inner-node row index; ref < 0 encodes a leaf as -(elem_off * 8 + count
  + 1) (count <= max_leaf <= 7).
- **Inline leaves**: leaf children are intersected in the same iteration
  that discovers them, so the while_loop runs once per *inner* node
  visited, about half the trip count of the pop-per-node walk, and leaf
  refs are never pushed (the stack only ever holds inner refs — except a
  degenerate single-leaf BVH root, which is handled by treating a popped
  leaf ref as slot-0 work).
- **Leaf-ordered triangles**: `ltri: f32[F, 12]` rows hold [v0, v1, v2,
  bitcast global_tri_id, pad, pad] in leaf-element order, so the k-th
  triangle of a leaf is row `off + k` — consecutive rows, no `bvh_elems`
  indirection gather, and the winning lane's global id (for the attribute
  pass) rides along for free.

A third variant — a stackless skip-pointer ("threaded") walk with one
int32 of per-lane state — was built and benched in round 2 and removed in
round 3: it loses the near-child-first ordering (so it re-tests boxes the
packed walk prunes), still pays one full-node gather per step, and its
host-side threading pass is a per-node Python loop that does not scale to
the multi-million-node BVHs this module targets. Lesson kept: per-lane
state size was never the bottleneck — gather count per visited node is,
which is exactly what the fat-node layout minimizes.

Numerics are identical to ops/bvh_traverse.py: same slab test (reciprocal
trick, 1e-7 parallel guard mapped to (-inf, inf), entry < t_best and
exit > BIAS pruning) and the same dominant-axis triangle test
(ops/intersect.py:intersect_triangles). Near-child-first ordering is kept:
among two hit inner children the far one is pushed first. Results are
bitwise-equal closest hits; traversal *order* differs from the pop-per-node
walk only in when leaf triangles are tested, which cannot change the
closest hit (min over the same hit set) nor any-hit occlusion.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qaray_tpu.core.constants import BIAS, BIGFLOAT
from qaray_tpu.ops.intersect import intersect_triangles


def pack_bvh(bounds, left, right, count, elems, tri_v):
    """Host-side packing of a flat (possibly concatenated multi-root) BVH.

    bounds [N,6] f32; left/right/count [N] int32 (left < 0 marks a leaf,
    right = child index or elem offset); elems [F] leaf-ordered global
    triangle ids; tri_v [F,3,3] triangle vertices in GLOBAL id order.

    Returns (pnodes f32[Ni,16], ltri f32[F,12], ref int32[N]) where ref[n]
    is the packed reference for original node n (pass ref[root] as a lane's
    traversal root).
    """
    bounds = np.asarray(bounds, np.float32)
    left = np.asarray(left, np.int64)
    right = np.asarray(right, np.int64)
    count = np.asarray(count, np.int64)
    elems = np.asarray(elems, np.int64)
    tri_v = np.asarray(tri_v, np.float32)

    is_leaf = left < 0
    # Leaf refs pack the element count into 3 bits: counts > 7 would bleed
    # into the offset bits and corrupt the encoding. The builder's max_leaf
    # must therefore be <= 7, and the traversal's static max_leaf must be >=
    # the largest actual leaf (validated again in traverse_bvh_packed).
    if is_leaf.any():
        cmax = int(count[is_leaf].max())
        if cmax > 7:
            raise ValueError(
                f"pack_bvh: leaf count {cmax} exceeds the 3-bit encoding "
                "limit (build the BVH with max_leaf <= 7)"
            )
    inner_slot = np.cumsum(~is_leaf) - 1  # slot id for inner nodes
    ref = np.where(is_leaf, -(right * 8 + count + 1), inner_slot).astype(
        np.int32
    )

    n_inner = int((~is_leaf).sum())
    pnodes = np.zeros((max(n_inner, 1), 16), np.float32)
    if n_inner:
        li = left[~is_leaf]
        ri = right[~is_leaf]
        rows = inner_slot[~is_leaf]
        pnodes[rows, 0:6] = bounds[li]
        pnodes[rows, 6:12] = bounds[ri]
        pnodes[rows, 12] = ref[li].view(np.float32)
        pnodes[rows, 13] = ref[ri].view(np.float32)

    num_elems = elems.shape[0]
    ltri = np.zeros((max(num_elems, 1), 12), np.float32)
    if num_elems:
        v = tri_v[elems]  # [F,3,3] leaf order
        ltri[:num_elems, 0:9] = v.reshape(num_elems, 9)
        ltri[:num_elems, 9] = elems.astype(np.int32).view(np.float32)
    return pnodes, ltri, ref


def _slab(box, p, rcp_d, d_small, t_best):
    """box [B,6]; returns (hit [B], entry [B]) — same numerics as
    ops/bvh_traverse._slab_test."""
    t_lo = (box[:, :3] - p) * rcp_d
    t_hi = (box[:, 3:] - p) * rcp_d
    t0 = jnp.where(d_small, -BIGFLOAT, jnp.minimum(t_lo, t_hi))
    t1 = jnp.where(d_small, BIGFLOAT, jnp.maximum(t_lo, t_hi))
    entry = jnp.max(t0, axis=-1)
    exit_ = jnp.min(t1, axis=-1)
    return (entry < t_best) & (entry < exit_) & (exit_ > BIAS), entry


@partial(jax.jit, static_argnames=("max_leaf", "stack_size", "any_hit"))
def traverse_bvh_packed(
    p,
    d,
    roots_ref,
    t_init,
    pnodes,
    ltri,
    max_leaf: int = 4,
    stack_size: int = 40,
    any_hit: bool = False,
):
    """Trace B rays through the packed BVH. API mirrors traverse_bvh but
    roots are packed refs and the return carries GLOBAL triangle ids.

    Returns (t [B], tri [B] global id or -1, bary [B,3], front [B]).
    """
    num_rays = p.shape[0]
    lane = jnp.arange(num_rays)
    n_inner = pnodes.shape[0]
    n_ltri = ltri.shape[0]

    d_small = jnp.abs(d) < 1e-7
    rcp_d = jnp.where(d_small, 1.0, 1.0 / d)

    # Stack of packed refs. Sentinel 0 is a valid inner ref, so track depth.
    stack = jnp.zeros((num_rays, stack_size), jnp.int32)
    stack = stack.at[:, 0].set(roots_ref)
    sp = jnp.ones((num_rays,), jnp.int32)

    t_best = t_init
    tri_best = jnp.full((num_rays,), -1, jnp.int32)
    bary_best = jnp.zeros((num_rays, 3), jnp.float32)
    front_best = jnp.zeros((num_rays,), bool)

    def cond(state):
        _, sp, *_ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, t_best, tri_best, bary_best, front_best = state
        active = sp > 0
        sp_pop = jnp.maximum(sp - 1, 0)
        ref = stack[lane, sp_pop]

        popped_leaf = active & (ref < 0)
        is_inner = active & (ref >= 0)

        row = pnodes[jnp.clip(ref, 0, n_inner - 1)]  # [B,16]
        ref0 = jax.lax.bitcast_convert_type(row[:, 12], jnp.int32)
        ref1 = jax.lax.bitcast_convert_type(row[:, 13], jnp.int32)

        hit0, entry0 = _slab(row[:, 0:6], p, rcp_d, d_small, t_best)
        hit1, entry1 = _slab(row[:, 6:12], p, rcp_d, d_small, t_best)
        hit0 &= is_inner
        hit1 &= is_inner

        # Leaf work: slot 0 = hit leaf child0, or the popped ref itself when
        # it is a leaf (only possible for a single-leaf BVH root); slot 1 =
        # hit leaf child1.
        leaf0 = hit0 & (ref0 < 0)
        leaf1 = hit1 & (ref1 < 0)

        def decode(r):
            e = (-r) - 1
            return e >> 3, e & 7

        off_p, cnt_p = decode(ref)
        off_0, cnt_0 = decode(ref0)
        off_1, cnt_1 = decode(ref1)
        s0_off = jnp.where(popped_leaf, off_p, off_0)
        s0_cnt = jnp.where(popped_leaf, cnt_p, jnp.where(leaf0, cnt_0, 0))
        s1_cnt = jnp.where(leaf1, cnt_1, 0)

        new_t, new_tri = t_best, tri_best
        new_bary, new_front = bary_best, front_best
        for s_off, s_cnt in ((s0_off, s0_cnt), (off_1, s1_cnt)):
            for k in range(max_leaf):
                trow = ltri[jnp.clip(s_off + k, 0, n_ltri - 1)]  # [B,12]
                t_hit, bary, front, hit = intersect_triangles(
                    p, d, trow[:, 0:3], trow[:, 3:6], trow[:, 6:9], new_t
                )
                take = (k < s_cnt) & hit & (t_hit < new_t)
                gid = jax.lax.bitcast_convert_type(trow[:, 9], jnp.int32)
                new_t = jnp.where(take, t_hit, new_t)
                new_tri = jnp.where(take, gid, new_tri)
                new_bary = jnp.where(take[:, None], bary, new_bary)
                new_front = jnp.where(take, front, new_front)

        # Push hit INNER children, far-first so the near child pops first
        # (near-first heuristic, objects.cpp:404-416). Re-check entry against
        # the possibly-tightened t_best from this iteration's leaf hits.
        push0 = hit0 & (ref0 >= 0) & (entry0 < new_t)
        push1 = hit1 & (ref1 >= 0) & (entry1 < new_t)
        both = push0 & push1
        near_is_0 = entry0 < entry1
        first = jnp.where(
            both,
            jnp.where(near_is_0, ref1, ref0),
            jnp.where(push0, ref0, ref1),
        )
        second = jnp.where(near_is_0, ref0, ref1)
        do_first = push0 | push1
        do_second = both

        sp0 = sp_pop
        idx0 = jnp.minimum(sp0, stack_size - 1)
        stack = stack.at[lane, idx0].set(
            jnp.where(do_first, first, stack[lane, idx0])
        )
        sp1 = sp0 + do_first.astype(jnp.int32)
        idx1 = jnp.minimum(sp1, stack_size - 1)
        stack = stack.at[lane, idx1].set(
            jnp.where(do_second, second, stack[lane, idx1])
        )
        sp2 = sp1 + do_second.astype(jnp.int32)

        if any_hit:
            sp2 = jnp.where(new_tri >= 0, 0, sp2)

        return stack, sp2, new_t, new_tri, new_bary, new_front

    state = (stack, sp, t_best, tri_best, bary_best, front_best)
    state = jax.lax.while_loop(cond, body, state)
    _, _, t_best, tri_best, bary_best, front_best = state
    return t_best, tri_best, bary_best, front_best
