#!/usr/bin/env python3
"""Micro-benchmark: BVH traversal variants on the live JAX device.

Builds a dense icosphere (20*4^N tris), fires a camera-style megabatch of
rays at it, and times closest-hit traversal:
  - stacked: ops/bvh_traverse.traverse_bvh (per-lane stack in HBM)
  - threaded: stackless skip-pointer traversal (ops/bvh_threaded)

Usage: python tools/bench_bvh.py [subdiv] [num_rays]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    # Camera at z=4 looking at origin; rays spread over the sphere.
    side = int(np.sqrt(n))
    u = (np.arange(n) % side) / side - 0.5
    v = (np.arange(n) // side % side) / side - 0.5
    p = np.zeros((n, 3), np.float32)
    p[:, 2] = 4.0
    d = np.stack([u * 1.6, v * 1.6, -np.ones(n)], axis=-1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return p, d


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 19

    sys.path.insert(0, "tools")
    from make_mesh_goldens import icosphere

    import jax
    import jax.numpy as jnp

    from qaray_tpu.scene.bvh import build_bvh, bvh_depth
    from qaray_tpu.scene.arrays import MeshArrays
    from qaray_tpu.core.constants import BIGFLOAT

    verts, faces = icosphere(subdiv)
    tri_v = verts[faces].astype(np.float32)  # [F,3,3]
    print(f"tris={len(tri_v)} rays={n_rays} device={jax.devices()[0]}")

    bvh = build_bvh(tri_v)
    depth = bvh_depth(bvh)
    print(f"bvh nodes={len(bvh.left)} depth={depth}")

    mesh = MeshArrays(
        tri_v=jnp.asarray(tri_v),
        tri_n=jnp.asarray(np.zeros_like(tri_v)),
        tri_uv=jnp.zeros((len(tri_v), 3, 2), jnp.float32),
        tri_mtl=jnp.zeros((len(tri_v),), jnp.int32),
        tri_has_uv=jnp.zeros((len(tri_v),), bool),
        bvh_bounds=jnp.asarray(bvh.bounds),
        bvh_left=jnp.asarray(bvh.left),
        bvh_right=jnp.asarray(bvh.right),
        bvh_count=jnp.asarray(bvh.count),
        bvh_elems=jnp.asarray(bvh.elems),
    )

    p_np, d_np = make_rays(n_rays)
    p = jnp.asarray(p_np)
    d = jnp.asarray(d_np)
    roots = jnp.zeros((n_rays,), jnp.int32)
    t_init = jnp.full((n_rays,), BIGFLOAT)

    def timeit(name, fn):
        out = fn()
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        print(f"{name:>10}: {best*1e3:8.2f} ms   {n_rays/best/1e6:9.1f} Mray/s")
        return out

    from qaray_tpu.ops.bvh_traverse import traverse_bvh

    f_stacked = jax.jit(
        lambda: traverse_bvh(p, d, roots, t_init, mesh, stack_size=depth + 2)
    )
    out_s = timeit("stacked", f_stacked)

    from qaray_tpu.ops.bvh_packed import pack_bvh, traverse_bvh_packed

    pnodes, ltri, ref = pack_bvh(
        bvh.bounds, bvh.left, bvh.right, bvh.count, bvh.elems, tri_v
    )
    pnodes_d = jnp.asarray(pnodes)
    ltri_d = jnp.asarray(ltri)
    proots = jnp.full((n_rays,), ref[0], jnp.int32)
    f_packed = jax.jit(
        lambda: traverse_bvh_packed(
            p, d, proots, t_init, pnodes_d, ltri_d, stack_size=depth + 2
        )
    )
    out_p = timeit("packed", f_packed)
    t_s0, tri_s0 = np.asarray(out_s[0]), np.asarray(out_s[1])
    t_p0, tri_p0 = np.asarray(out_p[0]), np.asarray(out_p[1])
    hs, hp = tri_s0 >= 0, tri_p0 >= 0
    print(
        f"packed agree: hits {np.mean(hs == hp):.6f}  "
        f"t maxdiff {np.max(np.abs(np.where(hs & hp, t_s0 - t_p0, 0.0))):.2e}"
    )

    try:
        from qaray_tpu.ops.bvh_threaded import traverse_bvh_threaded, thread_bvh

        threads = thread_bvh(bvh)
        th = tuple(jnp.asarray(a) for a in threads)
        f_thr = jax.jit(lambda: traverse_bvh_threaded(p, d, roots, t_init, mesh, th))
        out_t = timeit("threaded", f_thr)
        t_s, tri_s = np.asarray(out_s[0]), np.asarray(out_s[1])
        t_t, tri_t = np.asarray(out_t[0]), np.asarray(out_t[1])
        hit_s = tri_s >= 0
        hit_t = tri_t >= 0
        print(
            f"agree: hits {np.mean(hit_s == hit_t):.6f}  "
            f"t maxdiff {np.max(np.abs(np.where(hit_s & hit_t, t_s - t_t, 0.0))):.2e}  "
            f"hit-rate {hit_s.mean():.3f}"
        )
    except ImportError:
        print("threaded variant not present")


if __name__ == "__main__":
    main()
