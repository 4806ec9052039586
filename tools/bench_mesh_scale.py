#!/usr/bin/env python3
"""Large-mesh traversal benchmark: closest-hit throughput vs triangle count.

SURVEY.md ranks "BVH traversal on TPU" hard-part #1 (the reference's hot
loop is TriObj::TraceBVHNode, objects/objects.cpp:324-419). This sweep
measures the product mesh paths at realistic scales (1e5 .. 5e6 world
triangles) on the live JAX device:

  - packed:  fat-node per-lane BVH walk (ops/bvh_packed.py)
  - stream:  dense gather-free sweep (ops/mesh_stream.py) — O(rays x tris),
             benched only up to --stream-max tris
  - anyhit:  packed walk occlusion variant (shadow-ray cost)

Geometries (procedural, generated on host in seconds):
  - icoN:     subdivided icosphere, 20 * 4^N faces — convex, shallow BVH,
              high hit-rate; the traversal-friendly end.
  - terrainN: N x N heightfield, 2(N-1)^2 faces, camera at an oblique
              angle — long diagonal walks, realistic depth complexity.

Usage: python tools/bench_mesh_scale.py [--rays 524288] [--stream-max 400000]
       [--out bench_mesh_scale.json] [--cases ico7,ico8,ico9,terrain512,...]

Writes one JSON dict per case to --out and prints a table.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def icosphere_tris(subdiv: int) -> np.ndarray:
    """[F,3,3] f32 triangle soup of a unit icosphere, 20*4^subdiv faces.

    No vertex dedup (unnecessary for traversal benches): each subdivision
    maps one triangle to four via edge midpoints, then vertices are
    re-normalized to the sphere.
    """
    t = (1.0 + 5**0.5) / 2.0
    v = np.array(
        [
            (-1, t, 0), (1, t, 0), (-1, -t, 0), (1, -t, 0),
            (0, -1, t), (0, 1, t), (0, -1, -t), (0, 1, -t),
            (t, 0, -1), (t, 0, 1), (-t, 0, -1), (-t, 0, 1),
        ],
        np.float64,
    )
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    f = np.array(
        [
            (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
            (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
            (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
            (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
        ],
        np.int64,
    )
    tri = v[f]  # [F,3,3]
    for _ in range(subdiv):
        a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
        ab = (a + b) / 2
        bc = (b + c) / 2
        ca = (c + a) / 2
        for m in (ab, bc, ca):
            m /= np.linalg.norm(m, axis=-1, keepdims=True)
        tri = np.concatenate(
            [
                np.stack([a, ab, ca], 1),
                np.stack([ab, b, bc], 1),
                np.stack([ca, bc, c], 1),
                np.stack([ab, bc, ca], 1),
            ],
            axis=0,
        )
    return tri.astype(np.float32)


def terrain_tris(n: int, seed: int = 0) -> np.ndarray:
    """[F,3,3] f32 heightfield over [-1,1]^2, 2(n-1)^2 faces.

    Multi-octave value noise via random coarse grids bilinearly upsampled —
    ridge/valley structure so oblique rays sweep long BVH walks.
    """
    rng = np.random.default_rng(seed)
    h = np.zeros((n, n), np.float32)
    scale = 0.5
    for octave in (8, 32, 128):
        if octave >= n:
            break
        coarse = rng.standard_normal((octave, octave)).astype(np.float32)
        # Bilinear upsample to n x n.
        xi = np.linspace(0, octave - 1, n)
        x0 = np.clip(xi.astype(np.int64), 0, octave - 2)
        fx = (xi - x0).astype(np.float32)
        rows = (
            coarse[x0] * (1 - fx)[:, None] + coarse[x0 + 1] * fx[:, None]
        )
        cols = rows[:, x0] * (1 - fx)[None, :] + rows[:, x0 + 1] * fx[None, :]
        h += scale * cols
        scale *= 0.5
    h *= 0.15
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    pts = np.stack([gx, h, gy], axis=-1)  # y-up heightfield
    a = pts[:-1, :-1]
    b = pts[1:, :-1]
    c = pts[:-1, 1:]
    d = pts[1:, 1:]
    t1 = np.stack([a, b, c], axis=2).reshape(-1, 3, 3)
    t2 = np.stack([b, d, c], axis=2).reshape(-1, 3, 3)
    return np.concatenate([t1, t2]).astype(np.float32)


def camera_rays(n: int, kind: str):
    """Camera-like ray grid covering the geometry (hit rate ~0.4-0.8)."""
    side = int(np.sqrt(n))
    u = (np.arange(n) % side) / side - 0.5
    v = (np.arange(n) // side % side) / side - 0.5
    p = np.zeros((n, 3), np.float32)
    if kind == "ico":
        p[:, 2] = 4.0
        d = np.stack([u * 0.7, v * 0.7, -np.ones(n)], axis=-1)
    else:  # terrain: oblique view from a corner
        p[:] = (-1.8, 1.0, -1.8)
        look = np.stack(
            [u * 2.0 + 1.0, -0.6 + v * 0.8, np.ones(n) * 1.0], axis=-1
        )
        d = look
    d = d.astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return p, d


CASES = {
    "ico6": lambda: ("ico", icosphere_tris(6)),      # 81,920
    "ico7": lambda: ("ico", icosphere_tris(7)),      # 327,680
    "ico8": lambda: ("ico", icosphere_tris(8)),      # 1,310,720
    "ico9": lambda: ("ico", icosphere_tris(9)),      # 5,242,880
    "terrain256": lambda: ("terrain", terrain_tris(256)),    # 130,050
    "terrain724": lambda: ("terrain", terrain_tris(724)),    # 1,045,458
    "terrain1601": lambda: ("terrain", terrain_tris(1601)),  # 5,120,000
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 19)
    ap.add_argument("--stream-max", type=int, default=400_000)
    ap.add_argument("--out", default="bench_mesh_scale.json")
    ap.add_argument("--cases", default="ico6,ico7,ico8,ico9,terrain256,terrain724,terrain1601")
    ap.add_argument("--walks", default="packed,stream,anyhit")
    # Canonical padded shapes: through the axon tunnel a fresh XLA compile of
    # a while_loop walk costs MINUTES, and every distinct pnodes/ltri shape
    # is a fresh compile. Padding all cases to one (pnodes_rows, ltri_rows)
    # ceiling makes the packed/anyhit walks compile ONCE for the whole
    # sweep. The walk only touches nodes it visits, so padding changes
    # nothing about the measured traversal. (The stream sweep is NOT padded
    # this way - its cost is proportional to the array size.)
    ap.add_argument("--pad-pnodes", type=int, default=4_000_000)
    ap.add_argument("--pad-ltri", type=int, default=6_000_000)
    ap.add_argument("--stack", type=int, default=64)
    # Driver mode: the axon runtime nondeterministically hangs some repeat
    # dispatches of while_loop executables (a second call of an executable
    # that just ran in 0.2 ms can block forever). --driver runs every
    # (case) as a SUBPROCESS with a timeout and retries, collecting the
    # JSON rows the child prints.
    ap.add_argument("--driver", action="store_true")
    ap.add_argument("--case-timeout", type=int, default=900)
    ap.add_argument("--retries", type=int, default=2)
    args = ap.parse_args()

    if args.driver:
        import subprocess

        results = []
        for case in args.cases.split(","):
            row = None
            for attempt in range(args.retries + 1):
                cmd = [
                    sys.executable, __file__, "--rays", str(args.rays),
                    "--stream-max", str(args.stream_max),
                    "--cases", case, "--walks", args.walks,
                    "--pad-pnodes", str(args.pad_pnodes),
                    "--pad-ltri", str(args.pad_ltri),
                    "--stack", str(args.stack),
                    "--out", f"/tmp/mesh_scale_{case}.json",
                ]
                try:
                    proc = subprocess.run(
                        cmd, timeout=args.case_timeout, capture_output=True,
                        text=True,
                    )
                except subprocess.TimeoutExpired:
                    print(f"{case}: attempt {attempt} timed out", flush=True)
                    continue
                for line in proc.stdout.splitlines():
                    if line.startswith("{"):
                        row = json.loads(line)
                if row is not None:
                    break
                print(f"{case}: attempt {attempt} rc={proc.returncode} "
                      f"{proc.stderr[-300:]}", flush=True)
            if row is not None:
                results.append(row)
                print(json.dumps(row), flush=True)
            else:
                results.append({"case": case, "error": "all attempts failed"})
        with open(args.out, "w") as fp:
            json.dump({"rays": args.rays, "results": results}, fp, indent=2)
        return

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from qaray_tpu.core.constants import BIGFLOAT
    from qaray_tpu.ops.bvh_packed import pack_bvh, traverse_bvh_packed
    from qaray_tpu.ops.mesh_stream import (
        build_stream,
        exact_winner,
        stream_closest,
    )
    from qaray_tpu.scene.bvh import build_bvh, bvh_depth

    n_rays = args.rays
    device = str(jax.devices()[0])
    walks = args.walks.split(",")
    results = []
    print(f"device={device} rays={n_rays}")

    for case in args.cases.split(","):
        kind, tri_v = CASES[case]()
        ntris = len(tri_v)
        t_build0 = time.perf_counter()
        bvh = build_bvh(tri_v)
        build_s = time.perf_counter() - t_build0
        depth = bvh_depth(bvh)
        pn, lt, ref = pack_bvh(
            bvh.bounds, bvh.left, bvh.right, bvh.count, bvh.elems, tri_v
        )
        assert depth + 2 <= args.stack, f"{case}: depth {depth} > stack"
        assert pn.shape[0] <= args.pad_pnodes and lt.shape[0] <= args.pad_ltri
        pn = np.pad(pn, ((0, args.pad_pnodes - pn.shape[0]), (0, 0)))
        lt = np.pad(lt, ((0, args.pad_ltri - lt.shape[0]), (0, 0)))
        pnodes, ltri = jnp.asarray(pn), jnp.asarray(lt)
        tv = jnp.asarray(tri_v)
        p_np, d_np = camera_rays(n_rays, kind)
        p, d = jnp.asarray(p_np), jnp.asarray(d_np)
        t_init = jnp.full((n_rays,), BIGFLOAT)
        proots = jnp.full((n_rays,), ref[0], jnp.int32)
        row = {
            "case": case,
            "tris": ntris,
            "bvh_depth": depth,
            "bvh_build_s": round(build_s, 3),
        }

        # NOTE: the traversal entry points are already @jax.jit with the
        # arrays as ARGUMENTS. Wrapping them in a zero-arg jit(lambda: ...)
        # would bake pnodes/ltri (hundreds of MB) into the HLO as constants
        # — through the axon remote-compile tunnel that upload dominated the
        # "compile" time and overflows the request size at scale (HTTP 413).
        def sync(out):
            # block_until_ready can return before completion on the axon
            # backend; a scalar reduction pulled to host cannot lie.
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(leaf.reshape(-1)[:1].astype(jnp.float32).min())
            return out

        def timeit(fn, *a, **kw):
            out = sync(fn(*a, **kw))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                sync(fn(*a, **kw))
                best = min(best, time.perf_counter() - t0)
            return out, best

        hit_rate = None
        if "packed" in walks:
            out, dt = timeit(
                traverse_bvh_packed, p, d, proots, t_init, pnodes, ltri,
                stack_size=args.stack,
            )
            hit_rate = float(np.mean(np.asarray(out[1]) >= 0))
            row["packed_mrays_s"] = round(n_rays / dt / 1e6, 1)
            row["hit_rate"] = round(hit_rate, 3)
        if "anyhit" in walks:
            t_mid = jnp.full((n_rays,), 4.0)
            _, dt = timeit(
                traverse_bvh_packed, p, d, proots, t_mid, pnodes, ltri,
                stack_size=args.stack, any_hit=True,
            )
            row["anyhit_mrays_s"] = round(n_rays / dt / 1e6, 1)
        if "pallas" in walks:
            from qaray_tpu.ops.pallas_mesh import (
                PALLAS_MESH_MAX_TRIS,
                pack_coeff16,
                pallas_sweep_closest,
            )
            from qaray_tpu.ops.mesh_stream import build_stream as _bs

            if ntris <= PALLAS_MESH_MAX_TRIS * 2:  # allow headroom probing
                stream_ = _bs(tri_v, chunk=128)
                c16 = jnp.asarray(pack_coeff16(stream_.coeff, stream_.const))

                def f_pallas(p, d, t_init, c16):
                    t, row, _ = pallas_sweep_closest(p, d, t_init, c16)
                    return t, row

                out, dt = timeit(f_pallas, p, d, t_init, c16)
                row["pallas_mrays_s"] = round(n_rays / dt / 1e6, 3)
                row["pallas_gtests_s"] = round(n_rays * ntris / dt / 1e9, 1)
        if "tiles" in walks:
            from qaray_tpu.ops.mesh_tiles import (
                build_tiles,
                exact_winner_rows,
                tiled_sweep,
            )

            t_build0 = time.perf_counter()
            tiles = build_tiles(tri_v)
            row["tiles_build_s"] = round(time.perf_counter() - t_build0, 3)

            @jax.jit
            def f_tiles(p, d, t_init, tiles, tv):
                t, rows_, _ = tiled_sweep(p, d, t_init, tiles)
                return exact_winner_rows(p, d, rows_, tiles, tv)

            out, dt = timeit(f_tiles, p, d, t_init, tiles, tv)
            row["tiles_mrays_s"] = round(n_rays / dt / 1e6, 3)
            row["tiles_hit_rate"] = round(
                float(np.mean(np.asarray(out[3]))), 3
            )

            @jax.jit
            def f_tiles_any(p, d, t_max, tiles):
                return tiled_sweep(p, d, t_max, tiles, any_hit=True)

            t_mid2 = jnp.full((n_rays,), 4.0)
            _, dt = timeit(f_tiles_any, p, d, t_mid2, tiles)
            row["tiles_anyhit_mrays_s"] = round(n_rays / dt / 1e6, 3)
        if "ptiles" in walks:
            from qaray_tpu.ops.mesh_tiles import (
                build_tiles,
                exact_winner_rows,
            )
            from qaray_tpu.ops.pallas_tiles import (
                pack_coeffT,
                pallas_tiled_sweep,
                tiled_closest_twophase,
            )

            t_build0 = time.perf_counter()
            tiles = build_tiles(tri_v)
            cT_host = pack_coeffT(tiles.coeff, tiles.const)
            t_host = time.perf_counter()
            coeffT = jnp.asarray(cT_host)
            coeffT.block_until_ready()
            row["ptiles_build_host_s"] = round(t_host - t_build0, 3)
            row["ptiles_upload_s"] = round(time.perf_counter() - t_host, 3)
            row["ptiles_build_s"] = round(time.perf_counter() - t_build0, 3)

            from qaray_tpu.ops.mesh_tiles import coherence_order

            import os as _os

            _budget = int(_os.environ.get("QARAY_PTILE_BUDGET", "12"))

            @jax.jit
            def f_pt(p, d, t_init, tiles, coeffT, tv):
                # Mirror the production path (ops/trace._tiled_closest):
                # two-phase divergence-compacted march (sort internal).
                t, rows_, _ = tiled_closest_twophase(
                    p, d, t_init, tiles, coeffT, budget=_budget
                )
                return exact_winner_rows(p, d, rows_, tiles, tv)

            out, dt = timeit(f_pt, p, d, t_init, tiles, coeffT, tv)
            row["ptiles_mrays_s"] = round(n_rays / dt / 1e6, 3)
            row["ptiles_hit_rate"] = round(
                float(np.mean(np.asarray(out[3]))), 3
            )

            @jax.jit
            def f_pt_any(p, d, t_max, tiles, coeffT):
                lo = jnp.min(tiles.cbounds[:, :3], axis=0)
                hi = jnp.max(tiles.cbounds[:, 3:], axis=0)
                perm = coherence_order(p, d, lo, hi)
                inv = jnp.argsort(perm)
                occ = pallas_tiled_sweep(
                    p[perm], d[perm], t_max[perm], tiles, coeffT,
                    any_hit=True,
                )
                return occ[inv]

            t_mid2 = jnp.full((n_rays,), 4.0)
            _, dt = timeit(f_pt_any, p, d, t_mid2, tiles, coeffT)
            row["ptiles_anyhit_mrays_s"] = round(n_rays / dt / 1e6, 3)
        if "stream" in walks and ntris <= args.stream_max:
            stream = build_stream(tri_v)

            @jax.jit
            def f_stream(p, d, t_init, stream, tv):
                t, gid, _ = stream_closest(p, d, t_init, stream)
                return exact_winner(p, d, gid, tv)

            _, dt = timeit(f_stream, p, d, t_init, stream, tv)
            row["stream_mrays_s"] = round(n_rays / dt / 1e6, 1)
            # Effective dense-sweep compute rate (6 dot products, ~36 flop
            # per ray-triangle pair) — the MFU-style denominator for the
            # stream path.
            row["stream_tflops_eff"] = round(
                n_rays * ntris * 36.0 / dt / 1e12, 1
            )
        results.append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as fp:
        json.dump({"device": device, "rays": n_rays, "results": results}, fp,
                  indent=2)


if __name__ == "__main__":
    main()
