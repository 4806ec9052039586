"""Vectorized BVH traversal: a megabatch of rays walks per-lane stacks.

TPU-native re-expression of the reference's iterative stack walk
(objects/objects.cpp:324-419): the same near-child-first dual-slab traversal,
but over B rays at once inside `lax.while_loop` — every iteration pops one
node per lane and either tests its (<= max_leaf) triangles or pushes its
children. Lanes with empty stacks idle behind masks until the whole batch
drains, which is the standard SIMT trade: the loop count is the max lane
depth, not the sum.

The slab test matches the reference numerics: reciprocal-direction trick,
1e-7 parallel-axis guard mapping to (-inf, +inf), near-first push order, and
`entry < t_best` pruning. One extra `exit > BIAS` rejection is added (boxes
entirely behind the origin cannot contain a t > BIAS hit — pure pruning, no
image change).
"""

from functools import partial

import jax
import jax.numpy as jnp

from qaray_tpu.core.constants import BIAS, BIGFLOAT
from qaray_tpu.ops.intersect import intersect_triangles
from qaray_tpu.scene.arrays import MeshArrays


def _slab_test(node_ids, p, rcp_d, d_small, mesh: MeshArrays, t_best):
    """Entry/exit for node boxes; returns (hit [B], entry [B])."""
    bounds = mesh.bvh_bounds[node_ids]  # [B, 6]
    bmin, bmax = bounds[:, :3], bounds[:, 3:]
    t_lo = (bmin - p) * rcp_d
    t_hi = (bmax - p) * rcp_d
    t0 = jnp.minimum(t_lo, t_hi)
    t1 = jnp.maximum(t_lo, t_hi)
    # Parallel-axis guard (objects.cpp:364-396): treat the axis as wide open.
    t0 = jnp.where(d_small, -BIGFLOAT, t0)
    t1 = jnp.where(d_small, BIGFLOAT, t1)
    entry = jnp.max(t0, axis=-1)
    exit_ = jnp.min(t1, axis=-1)
    hit = (entry < t_best) & (entry < exit_) & (exit_ > BIAS)
    return hit, entry


@partial(jax.jit, static_argnames=("max_leaf", "stack_size", "any_hit"))
def traverse_bvh(
    p,
    d,
    roots,
    t_init,
    mesh: MeshArrays,
    max_leaf: int = 4,
    stack_size: int = 40,
    any_hit: bool = False,
):
    """Trace B object-space rays through the shared flattened BVH.

    p, d: [B, 3] object-space rays; roots: [B] per-lane BVH root node ids
    (lanes already carry their instance's root); t_init: [B] current-closest
    pruning distance (BIGFLOAT, or t_max for shadow rays).

    Returns (t [B], tri [B] global triangle id (-1 if none), bary [B, 3],
    front [B]). For any_hit=True, only `t < t_init` signals occlusion and
    lanes stop at the first accepted triangle.
    """
    num_rays = p.shape[0]
    lane = jnp.arange(num_rays)

    d_small = jnp.abs(d) < 1e-7
    rcp_d = jnp.where(d_small, 1.0, 1.0 / d)

    stack = jnp.zeros((num_rays, stack_size), jnp.int32)
    stack = stack.at[:, 0].set(roots)
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
        node = stack[lane, sp_pop]

        is_leaf = (mesh.bvh_left[node] < 0) & active
        is_inner = (~(mesh.bvh_left[node] < 0)) & active

        # ---- leaf: test up to max_leaf triangles (unrolled) ----
        elem_off = mesh.bvh_right[node]
        count = mesh.bvh_count[node]
        new_t, new_tri = t_best, tri_best
        new_bary, new_front = bary_best, front_best
        for k in range(max_leaf):
            valid = is_leaf & (k < count)
            tri_id = mesh.bvh_elems[
                jnp.clip(elem_off + k, 0, max(mesh.bvh_elems.shape[0] - 1, 0))
            ]
            v = mesh.tri_v[tri_id]  # [B,3,3]
            t_hit, bary, front, hit = intersect_triangles(
                p, d, v[:, 0], v[:, 1], v[:, 2], new_t
            )
            take = valid & hit & (t_hit < new_t)
            new_t = jnp.where(take, t_hit, new_t)
            new_tri = jnp.where(take, tri_id, new_tri)
            new_bary = jnp.where(take[:, None], bary, new_bary)
            new_front = jnp.where(take, front, new_front)

        # ---- inner: slab-test both children, push near-first ----
        child0 = mesh.bvh_left[node]
        child1 = mesh.bvh_right[node]
        hit0, entry0 = _slab_test(child0, p, rcp_d, d_small, mesh, new_t)
        hit1, entry1 = _slab_test(child1, p, rcp_d, d_small, mesh, new_t)
        hit0 &= is_inner
        hit1 &= is_inner
        both = hit0 & hit1
        near_is_0 = entry0 < entry1
        # Far child is pushed first so the near child pops first
        # (objects.cpp:404-416).
        first = jnp.where(both, jnp.where(near_is_0, child1, child0),
                          jnp.where(hit0, child0, child1))
        second = jnp.where(near_is_0, child0, child1)
        do_first = hit0 | hit1
        do_second = both

        sp0 = sp_pop
        write1 = jnp.where(do_first, first, stack[lane, jnp.minimum(sp0, stack_size - 1)])
        stack = stack.at[lane, jnp.minimum(sp0, stack_size - 1)].set(write1)
        sp1 = sp0 + do_first.astype(jnp.int32)
        write2 = jnp.where(do_second, second, stack[lane, jnp.minimum(sp1, stack_size - 1)])
        stack = stack.at[lane, jnp.minimum(sp1, stack_size - 1)].set(write2)
        sp2 = sp1 + do_second.astype(jnp.int32)

        if any_hit:
            # Lane done as soon as any occluder is found.
            sp2 = jnp.where(new_tri >= 0, 0, sp2)

        return stack, sp2, new_t, new_tri, new_bary, new_front

    state = (stack, sp, t_best, tri_best, bary_best, front_best)
    state = jax.lax.while_loop(cond, body, state)
    _, _, t_best, tri_best, bary_best, front_best = state
    return t_best, tri_best, bary_best, front_best
