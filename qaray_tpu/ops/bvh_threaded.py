"""Stackless ("threaded") BVH traversal: skip-pointer walk, no per-ray stack.

The stacked walk in ops/bvh_traverse.py carries a [B, depth] stack through a
`lax.while_loop`; on TPU that stack lives in HBM and every iteration pays a
full-batch scatter + gather just to push/pop — for deep BVHs the stack
traffic, not the box math, dominates. This variant precomputes two
"threading" pointers per node on the host (a classic stackless encoding):

    enter[n]  where to go when n's box is hit: first child (inner) or the
              node's own leaf-test then skip (leaf);
    skip[n]   next node in depth-first order when n's box is missed or n's
              subtree is exhausted (-1 when the walk is done).

Per-lane state collapses to ONE int32 node pointer; each `while_loop`
iteration gathers node data, slab-tests, and advances. The fixed DFS order
gives up the reference's near-child-first heuristic
(objects/objects.cpp:404-416) — a pruning heuristic only, never a
correctness condition, since `entry < t_best` still rejects occluded
subtrees. To recover most of the heuristic, `thread_bvh` orders each inner
node's children along the dominant axis of the scene's diagonal so
depth-first order correlates with front-to-back for the common camera
placement; rays marching the other way pay extra box tests but no wrong
answers.

Multi-root note: traversal starts at any `roots[lane]` and *terminates* at
`skip[root]`-reachable -1 because threading is computed per BVH (the scene
compiler concatenates per-mesh BVHs; each root's skip chain ends at -1
within its own tree).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qaray_tpu.core.constants import BIAS, BIGFLOAT
from qaray_tpu.ops.intersect import intersect_triangles
from qaray_tpu.scene.arrays import MeshArrays


def thread_bvh(bvh, order_axis: int | None = None):
    """Host-side threading of a FlatBVH → (enter, skip) int32 arrays.

    order_axis: dominant world axis used to order each node's children
    front-to-back in DFS order (None → pick the widest axis of the root
    bounds). Returns numpy arrays aligned with the node index space.
    """
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    bounds = np.asarray(bvh.bounds)
    n = len(left)
    enter = np.full(n, -1, np.int32)
    skip = np.full(n, -1, np.int32)

    # Roots = nodes that are nobody's child (scene compiler concatenates
    # per-mesh BVHs into one index space).
    is_child = np.zeros(n, bool)
    inner = left >= 0
    is_child[left[inner]] = True
    is_child[right[inner]] = True
    roots = np.nonzero(~is_child)[0]

    for root in roots:
        if order_axis is None:
            ext = bounds[root, 3:] - bounds[root, :3]
            axis = int(np.argmax(ext))
        else:
            axis = order_axis
        # Iterative DFS threading: (node, continuation) pairs.
        stack = [(int(root), -1)]
        while stack:
            node, cont = stack.pop()
            skip[node] = cont
            if left[node] < 0:  # leaf: after its triangles, continue at cont
                enter[node] = cont
                continue
            c0, c1 = int(left[node]), int(right[node])
            # Near-first along the chosen axis: child whose box starts
            # earlier goes first in DFS order.
            if bounds[c1, axis] < bounds[c0, axis]:
                c0, c1 = c1, c0
            enter[node] = c0
            stack.append((c1, cont))
            stack.append((c0, c1))

    return enter.astype(np.int32), skip.astype(np.int32)


@partial(jax.jit, static_argnames=("max_leaf", "any_hit"))
def traverse_bvh_threaded(
    p,
    d,
    roots,
    t_init,
    mesh: MeshArrays,
    threads,
    max_leaf: int = 4,
    any_hit: bool = False,
):
    """Trace B object-space rays via skip pointers; API mirrors traverse_bvh.

    threads: (enter [N], skip [N]) int32 device arrays from `thread_bvh`.
    Returns (t, tri, bary, front) with identical semantics to the stacked
    walk (same slab numerics: reciprocal trick, 1e-7 guard, entry<t_best,
    exit>BIAS pruning).
    """
    enter, skip = threads
    num_rays = p.shape[0]

    d_small = jnp.abs(d) < 1e-7
    rcp_d = jnp.where(d_small, 1.0, 1.0 / d)

    cur = roots.astype(jnp.int32)
    t_best = t_init
    tri_best = jnp.full((num_rays,), -1, jnp.int32)
    bary_best = jnp.zeros((num_rays, 3), jnp.float32)
    front_best = jnp.zeros((num_rays,), bool)

    nb = mesh.bvh_bounds
    n_nodes = nb.shape[0]
    # Pack per-node hot data to one gather each: bounds row + int row.
    ints = jnp.stack(
        [mesh.bvh_left, mesh.bvh_right, mesh.bvh_count, enter, skip], axis=-1
    )  # [N, 5]

    def cond(state):
        cur = state[0]
        return jnp.any(cur >= 0)

    def body(state):
        cur, t_best, tri_best, bary_best, front_best = state
        active = cur >= 0
        node = jnp.maximum(cur, 0)

        ni = ints[node]  # [B,5]
        n_left, n_right, n_count = ni[:, 0], ni[:, 1], ni[:, 2]
        n_enter, n_skip = ni[:, 3], ni[:, 4]

        b = nb[node]  # [B,6]
        t_lo = (b[:, :3] - p) * rcp_d
        t_hi = (b[:, 3:] - p) * rcp_d
        t0 = jnp.where(d_small, -BIGFLOAT, jnp.minimum(t_lo, t_hi))
        t1 = jnp.where(d_small, BIGFLOAT, jnp.maximum(t_lo, t_hi))
        entry = jnp.max(t0, axis=-1)
        exit_ = jnp.min(t1, axis=-1)
        box_hit = (entry < t_best) & (entry < exit_) & (exit_ > BIAS) & active

        is_leaf = n_left < 0
        test_leaf = box_hit & is_leaf

        new_t, new_tri = t_best, tri_best
        new_bary, new_front = bary_best, front_best
        elem_hi = max(mesh.bvh_elems.shape[0] - 1, 0)
        for k in range(max_leaf):
            valid = test_leaf & (k < n_count)
            tri_id = mesh.bvh_elems[jnp.clip(n_right + k, 0, elem_hi)]
            v = mesh.tri_v[tri_id]
            t_hit, bary, front, hit = intersect_triangles(
                p, d, v[:, 0], v[:, 1], v[:, 2], new_t
            )
            take = valid & hit & (t_hit < new_t)
            new_t = jnp.where(take, t_hit, new_t)
            new_tri = jnp.where(take, tri_id, new_tri)
            new_bary = jnp.where(take[:, None], bary, new_bary)
            new_front = jnp.where(take, front, new_front)

        nxt = jnp.where(box_hit & ~is_leaf, n_enter, n_skip)
        nxt = jnp.where(active, nxt, -1)
        if any_hit:
            nxt = jnp.where(new_tri >= 0, -1, nxt)

        return nxt, new_t, new_tri, new_bary, new_front

    state = (cur, t_best, tri_best, bary_best, front_best)
    state = jax.lax.while_loop(cond, body, state)
    _, t_best, tri_best, bary_best, front_best = state
    return t_best, tri_best, bary_best, front_best
