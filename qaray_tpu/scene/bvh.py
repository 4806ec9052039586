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
              use_native: bool = True, method: str = "sah") -> FlatBVH:
    """tri_verts: [F, 3, 3] triangle vertex positions (object space).

    method="sah" (default): binned surface-area-heuristic build — a tree-
    quality upgrade over the reference's MeanSplit policy that matters most
    for the merged world-space BVH, where instances of very different scales
    share one tree. method="mean": the reference's cyBVH MeanSplit policy
    (spatial median on the widest axis, 3-axis fallback; cyBVH.h:380-420).
    Traversal semantics are identical either way — only the tree shape (and
    so the box-test count) changes.

    Uses the C++ builder (native/qaray_native.cpp) when available — same
    policy, node-for-node identical output — and falls back to NumPy.
    """
    import os

    if os.environ.get("QARAY_BVH"):
        method = os.environ["QARAY_BVH"]
    if use_native:
        from qaray_tpu import native

        out = native.bvh_build_native(
            tri_verts.astype(np.float32), max_leaf, method=method
        )
        if out is not None:
            bounds, left, right, count, elems = out
            return FlatBVH(bounds, left, right, count, elems)
    if method == "sah":
        return _build_bvh_sah_numpy(tri_verts, max_leaf)
    return _build_bvh_numpy(tri_verts, max_leaf)


_SAH_BINS = 16


def _build_bvh_sah_numpy(tri_verts: np.ndarray, max_leaf: int = 4) -> FlatBVH:
    """Binned SAH build: 16 centroid bins on the widest centroid axis;
    split minimizing SA_L*N_L + SA_R*N_R; spatial-median fallback when
    binning degenerates (all centroids in one bin)."""
    num_tris = tri_verts.shape[0]
    if num_tris == 0:
        return _build_bvh_numpy(tri_verts, max_leaf)

    tri_min = tri_verts.min(axis=1)
    tri_max = tri_verts.max(axis=1)
    tri_center = 0.5 * (tri_min + tri_max)

    bounds_list, left_list, right_list, count_list = [], [], [], []
    elem_order = []

    def new_node():
        bounds_list.append(np.zeros(6, np.float32))
        left_list.append(-1)
        right_list.append(0)
        count_list.append(0)
        return len(bounds_list) - 1

    def half_area(bmin, bmax):
        e = np.maximum(bmax - bmin, 0.0)
        return e[0] * e[1] + e[1] * e[2] + e[2] * e[0]

    root = new_node()
    stack = [(root, np.arange(num_tris, dtype=np.int64))]
    while stack:
        node, ids = stack.pop()
        n = len(ids)
        bmin = tri_min[ids].min(axis=0)
        bmax = tri_max[ids].max(axis=0)
        bounds_list[node] = np.concatenate([bmin, bmax]).astype(np.float32)
        if n <= max_leaf:
            left_list[node] = -1
            right_list[node] = len(elem_order)
            count_list[node] = n
            elem_order.extend(ids.tolist())
            continue

        centers = tri_center[ids]
        cmin = centers.min(axis=0)
        cmax = centers.max(axis=0)
        axis = int(np.argmax(cmax - cmin))
        extent = cmax[axis] - cmin[axis]
        ids_l = ids_r = None
        if extent > 1e-12:
            # Bin centroids; prefix/suffix-scan bin bounds for SAH sweep.
            scale = _SAH_BINS * (1.0 - 1e-6) / extent
            bidx = ((centers[:, axis] - cmin[axis]) * scale).astype(np.int64)
            cnt = np.bincount(bidx, minlength=_SAH_BINS)
            binmin = np.full((_SAH_BINS, 3), np.inf, np.float64)
            binmax = np.full((_SAH_BINS, 3), -np.inf, np.float64)
            np.minimum.at(binmin, bidx, tri_min[ids])
            np.maximum.at(binmax, bidx, tri_max[ids])
            # Left-to-right and right-to-left accumulated bounds/counts.
            lmin = np.minimum.accumulate(binmin, axis=0)
            lmax = np.maximum.accumulate(binmax, axis=0)
            lcnt = np.cumsum(cnt)
            rmin = np.minimum.accumulate(binmin[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(binmax[::-1], axis=0)[::-1]
            rcnt = np.cumsum(cnt[::-1])[::-1]
            # Split after bin k: left = bins[0..k], right = bins[k+1..].
            cost = np.full(_SAH_BINS - 1, np.inf)
            for k in range(_SAH_BINS - 1):
                nl, nr = lcnt[k], rcnt[k + 1]
                if nl == 0 or nr == 0:
                    continue
                cost[k] = nl * half_area(lmin[k], lmax[k]) + nr * half_area(
                    rmin[k + 1], rmax[k + 1]
                )
            best = int(np.argmin(cost))
            if np.isfinite(cost[best]):
                mask = bidx <= best
                ids_l, ids_r = ids[mask], ids[~mask]
        if ids_l is None:
            # Degenerate: identical centroids — split the list in half.
            half = n // 2
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
