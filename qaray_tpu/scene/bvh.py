"""Host-side BVH build over triangles, flattened for device traversal.

Same build policy as the reference's vendored cyBVH (src/ext/cyBVH.h):
- binary tree, leaves hold up to `max_leaf` elements (reference uses 4 via
  TriObj::Load -> bvh.SetMesh(this, 4), objects/objects.h:70),
- spatial-median ("MeanSplit") partition on the widest axis of the element
  bound box, trying the other two axes on failure, then falling back to a
  half-split of the element list (cyBVH.h:380-420).

Instead of cyBVH's bit-packed nodes we emit plain SoA int32/float32 arrays —
friendlier to vectorized device traversal:

    bounds  [N, 6]  (min xyz, max xyz)
    left    [N]     left child index, or -1 for leaf
    right   [N]     right child index, or first-element offset for leaf
    count   [N]     0 for inner, element count for leaf
    elems   [F]     triangle indices in leaf order

Traversal order note: children are stored so that dependents can use the
near-child-first heuristic of the reference's stack walk
(objects/objects.cpp:404-416) at run time; order in memory is irrelevant.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class FlatBVH(NamedTuple):
    bounds: np.ndarray  # [N, 6] float32
    left: np.ndarray  # [N] int32 (-1 for leaf)
    right: np.ndarray  # [N] int32 (child or elem offset)
    count: np.ndarray  # [N] int32 (leaf element count; 0 for inner)
    elems: np.ndarray  # [F] int32


def build_bvh(tri_verts: np.ndarray, max_leaf: int = 4,
              use_native: bool = True) -> FlatBVH:
    """tri_verts: [F, 3, 3] triangle vertex positions (object space).

    Uses the C++ builder (native/qaray_native.cpp) when available — same
    policy, node-for-node identical output — and falls back to NumPy.
    """
    if use_native:
        from qaray_tpu import native

        out = native.bvh_build_native(tri_verts.astype(np.float32), max_leaf)
        if out is not None:
            bounds, left, right, count, elems = out
            return FlatBVH(bounds, left, right, count, elems)
    return _build_bvh_numpy(tri_verts, max_leaf)


def _build_bvh_numpy(tri_verts: np.ndarray, max_leaf: int = 4) -> FlatBVH:
    num_tris = tri_verts.shape[0]
    if num_tris == 0:
        return FlatBVH(
            bounds=np.zeros((1, 6), np.float32),
            left=np.array([-1], np.int32),
            right=np.array([0], np.int32),
            count=np.array([0], np.int32),
            elems=np.zeros((0,), np.int32),
        )

    tri_min = tri_verts.min(axis=1)  # [F, 3]
    tri_max = tri_verts.max(axis=1)
    tri_center = 0.5 * (tri_min + tri_max)

    bounds_list = []
    left_list = []
    right_list = []
    count_list = []
    elem_order = []

    def new_node():
        bounds_list.append(np.zeros(6, np.float32))
        left_list.append(-1)
        right_list.append(0)
        count_list.append(0)
        return len(bounds_list) - 1

    # Iterative build with an explicit stack to avoid Python recursion limits.
    root = new_node()
    stack = [(root, np.arange(num_tris, dtype=np.int64))]
    while stack:
        node, ids = stack.pop()
        bmin = tri_min[ids].min(axis=0)
        bmax = tri_max[ids].max(axis=0)
        bounds_list[node] = np.concatenate([bmin, bmax]).astype(np.float32)
        if len(ids) <= max_leaf:
            left_list[node] = -1
            right_list[node] = len(elem_order)
            count_list[node] = len(ids)
            elem_order.extend(ids.tolist())
            continue
        # MeanSplit: spatial median on widest axis, 3-axis fallback.
        centers = tri_center[ids]
        extent = bmax - bmin
        axes = np.argsort(-extent)
        ids_l = ids_r = None
        for axis in axes:
            mid = 0.5 * (bmin[axis] + bmax[axis])
            mask = centers[:, axis] < mid
            n_l = int(mask.sum())
            if 0 < n_l < len(ids):
                ids_l, ids_r = ids[mask], ids[~mask]
                break
        if ids_l is None:
            half = len(ids) // 2
            ids_l, ids_r = ids[:half], ids[half:]
        lchild = new_node()
        rchild = new_node()
        left_list[node] = lchild
        right_list[node] = rchild
        stack.append((lchild, ids_l))
        stack.append((rchild, ids_r))

    return FlatBVH(
        bounds=np.stack(bounds_list).astype(np.float32),
        left=np.asarray(left_list, np.int32),
        right=np.asarray(right_list, np.int32),
        count=np.asarray(count_list, np.int32),
        elems=np.asarray(elem_order, np.int32),
    )


def bvh_depth(bvh: FlatBVH) -> int:
    """Maximum depth (for sizing traversal stacks)."""
    depth = np.zeros(len(bvh.left), np.int32)
    maxd = 1
    for i in range(len(bvh.left)):
        if bvh.left[i] >= 0:
            d = depth[i] + 1
            depth[bvh.left[i]] = d
            depth[bvh.right[i]] = d
            maxd = max(maxd, d + 1)
    return int(maxd)
