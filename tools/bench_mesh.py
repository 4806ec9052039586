#!/usr/bin/env python3
"""Mesh-path micro-benchmark on the live JAX device.

Times the three mesh intersection paths on a dense icosphere with a
camera-style megabatch:
  - stream:  dense gather-free sweep (ops/mesh_stream.py)
  - packed:  fat-node per-lane BVH walk (ops/bvh_packed.py)
  - anyhit:  streaming occlusion sweep

Usage: python tools/bench_mesh.py [subdiv] [num_rays]
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 18

    from make_mesh_goldens import icosphere
    from bench_bvh import make_rays

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from qaray_tpu.core.constants import BIGFLOAT
    from qaray_tpu.ops.bvh_packed import pack_bvh, traverse_bvh_packed
    from qaray_tpu.ops.mesh_stream import (
        build_stream,
        exact_winner,
        stream_any_hit,
        stream_closest,
    )
    from qaray_tpu.scene.bvh import build_bvh, bvh_depth

    verts, faces = icosphere(subdiv)
    tri_v = verts[faces].astype(np.float32)
    print(f"tris={len(tri_v)} rays={n_rays} device={jax.devices()[0]}")

    bvh = build_bvh(tri_v)
    depth = bvh_depth(bvh)
    pn, lt, ref = pack_bvh(
        bvh.bounds, bvh.left, bvh.right, bvh.count, bvh.elems, tri_v
    )
    pnodes, ltri = jnp.asarray(pn), jnp.asarray(lt)
    stream = build_stream(tri_v)
    tv = jnp.asarray(tri_v)

    p_np, d_np = make_rays(n_rays)
    p, d = jnp.asarray(p_np), jnp.asarray(d_np)
    t_init = jnp.full((n_rays,), BIGFLOAT)
    t_max = jnp.full((n_rays,), 6.0)
    proots = jnp.full((n_rays,), ref[0], jnp.int32)

    # NOTE: pass arrays as ARGUMENTS to jitted fns — closing over them in a
    # zero-arg jit bakes them into the HLO as constants, which the axon
    # remote-compile tunnel uploads per compile (minutes at 100k+ tris,
    # HTTP 413 beyond ~0.5 GB).
    def timeit(name, fn, *a, **kw):
        out = jax.block_until_ready(fn(*a, **kw))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a, **kw))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:>10}: {best*1e3:9.2f} ms   {n_rays/best/1e6:9.1f} Mray/s")
        return out

    @jax.jit
    def f_stream(p, d, t_init, stream, tv):
        t, gid, _ = stream_closest(p, d, t_init, stream)
        t_e, bary, front, valid = exact_winner(p, d, gid, tv)
        return t_e, jnp.where(valid, gid, -1), bary, front

    out_st = timeit("stream", f_stream, p, d, t_init, stream, tv)

    timeit("anyhit", stream_any_hit, p, d, t_max, stream)

    out_pk = timeit(
        "packed", traverse_bvh_packed, p, d, proots, t_init, pnodes, ltri,
        stack_size=depth + 2,
    )

    t_s, tri_s = np.asarray(out_st[0]), np.asarray(out_st[1])
    t_p, tri_p = np.asarray(out_pk[0]), np.asarray(out_pk[1])
    hs, hp = tri_s >= 0, tri_p >= 0
    both = hs & hp
    print(
        f"stream vs packed: hits agree {np.mean(hs == hp):.6f}  "
        f"t maxdiff {np.max(np.abs(np.where(both, t_s - t_p, 0.0))):.2e}  "
        f"hit-rate {hs.mean():.3f}"
    )


if __name__ == "__main__":
    main()
