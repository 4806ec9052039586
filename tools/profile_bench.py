#!/usr/bin/env python3
"""Per-kernel timing table for the production dispatch paths -> PROFILE.md.

VERDICT r03 asked for a profile artifact behind the bench numbers. The
tunneled axon runtime does not expose a usable per-kernel device trace to
jax.profiler (attempted below; the result is recorded either way), so this
script times each production kernel in ISOLATION with pipelined
forced-completion timing — the same methodology as bench.py — and writes
the table to PROFILE.md + profile_kernels.json.

Usage: python tools/profile_bench.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from qaray_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()

    from qaray_tpu.core.constants import BIGFLOAT
    from qaray_tpu.integrators.engine import (
        IntegratorConfig,
        render_batch,
        render_batch_xla,
    )
    from qaray_tpu.scene.compiler import compile_scene
    from qaray_tpu.scene.xml_parser import load_scene

    rows = []
    dev = str(jax.devices()[0])

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(leaf.reshape(-1)[:1].astype(jnp.float32).min())

    def timeit(name, fn, lanes, work_desc, reps=3, inner=6):
        sync(fn(0))
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            outs = [fn(r * inner + i + 1) for i in range(inner)]
            sync(outs[-1])
            best = min(best, (time.perf_counter() - t0) / inner)
        rows.append({
            "kernel": name,
            "lanes": lanes,
            "ms_per_dispatch": round(best * 1e3, 3),
            "lanes_per_s": round(lanes / best),
            "work": work_desc,
        })
        print(rows[-1], flush=True)

    # Scene setup (box = bench primary).
    scene = load_scene("/root/reference/inputs/example_project3_box.xml")
    arrays, meta = compile_scene(scene)
    cfg = IntegratorConfig(integrator="pathtrace", max_bounce=5,
                           shadow_spp=16)
    B = 1 << 19
    ids = np.arange(B, dtype=np.int32)
    px = jnp.asarray(ids % meta.img_width)
    py = jnp.asarray((ids // meta.img_width) % meta.img_height)
    key = jax.random.key(0, impl="threefry2x32")

    # 1. The megakernel (whole dispatch).
    timeit(
        "megakernel pathtrace (box, 6 vertices, NEE)",
        lambda s: render_batch(arrays, meta, cfg, px, py,
                               jnp.full((B,), s, jnp.int32), key)[0],
        B, "raygen + 6x(closest+shadow+shade) fused",
    )

    # 2. The XLA wavefront engine on the same work (what the megakernel
    #    replaced).
    timeit(
        "XLA wavefront engine (same work)",
        lambda s: render_batch_xla(arrays, meta, cfg, px, py,
                                   jnp.full((B,), s, jnp.int32), key)[0],
        B, "dozens of separate elementwise passes per bounce",
    )

    # 3. Analytic closest-hit + attributes kernel alone.
    from qaray_tpu.ops.pallas_analytic import (
        closest_analytic_full_pallas,
        shadow_analytic_pallas,
    )

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-20, 20, (B, 3)).astype(np.float32))
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    kinds = meta.analytic_kinds
    timeit(
        "pallas closest-hit + attrs (7 analytic prims)",
        lambda s: closest_analytic_full_pallas(p, d, arrays.analytic,
                                               kinds, want_uv=False)["t"],
        B, "one trace",
    )
    tmax = jnp.full((B,), BIGFLOAT)
    timeit(
        "pallas any-hit shadow (7 analytic prims)",
        lambda s: shadow_analytic_pallas(p, d, tmax, arrays.analytic, kinds),
        B, "one occlusion test",
    )

    # 4. Dense mesh sweep kernel (16k synthetic tris).
    from qaray_tpu.ops.mesh_stream import build_stream
    from qaray_tpu.ops.pallas_mesh import pack_coeff16, pallas_sweep_closest

    F = 16384
    c = rng.uniform(-10, 10, (F, 3)).astype(np.float32)
    tri = c[:, None, :] + rng.uniform(-0.4, 0.4, (F, 3, 3)).astype(np.float32)
    stream = build_stream(tri)
    c16 = jnp.asarray(pack_coeff16(stream.coeff, stream.const))
    timeit(
        f"pallas dense mesh sweep ({F} tris)",
        lambda s: pallas_sweep_closest(p, d, tmax, c16)[0],
        B, f"{F} tri tests/ray ({B*F/1e9:.1f} Gtest/dispatch)",
    )

    # 5. Cluster-DMA tiled kernel (330k tris).
    from qaray_tpu.ops.mesh_tiles import build_tiles, coherence_order
    from qaray_tpu.ops.pallas_tiles import pack_coeffT, pallas_tiled_sweep

    F2 = 327680
    c = rng.uniform(-10, 10, (F2, 3)).astype(np.float32)
    tri2 = c[:, None, :] + rng.uniform(-0.3, 0.3, (F2, 3, 3)).astype(np.float32)
    tiles = build_tiles(tri2)
    coeffT = jnp.asarray(pack_coeffT(tiles.coeff, tiles.const))
    lo = jnp.min(tiles.cbounds[:, :3], axis=0)
    hi = jnp.max(tiles.cbounds[:, 3:], axis=0)

    @jax.jit
    def f_tiled(p, d, t):
        perm = coherence_order(p, d, lo, hi)
        tt, r, _, _ = pallas_tiled_sweep(p[perm], d[perm], t[perm], tiles,
                                      coeffT)
        return tt

    timeit(
        f"pallas tiled cluster-DMA sweep ({F2} tris)",
        lambda s: f_tiled(p, d, tmax),
        B, "front-to-back cluster march + early exit",
    )

    # 5b. Two-phase divergence-compacted closest hit (same mesh).
    from qaray_tpu.ops.pallas_tiles import tiled_closest_twophase

    timeit(
        f"pallas tiled TWO-PHASE closest ({F2} tris)",
        lambda s: tiled_closest_twophase(p, d, tmax, tiles, coeffT,
                                         budget=6)[0],
        B, "budgeted march + re-pack unresolved + finish",
    )

    # 6. Photon gather sweep (10k-photon map, scene-surface queries).
    from qaray_tpu.ops.pallas_photon import pallas_gather
    from qaray_tpu.photon.gather import PhotonMapData
    from qaray_tpu.photon.cluster import cluster_photon_map

    P = 10000
    ppos = rng.uniform(-15, 15, (P, 3)).astype(np.float32)
    ppow = rng.uniform(0, 1e-3, (P, 3)).astype(np.float32)
    pdir = rng.normal(size=(P, 3)).astype(np.float32)
    pdir /= np.linalg.norm(pdir, axis=1, keepdims=True)
    pmap = cluster_photon_map(PhotonMapData(
        pos=jnp.asarray(ppos), power=jnp.asarray(ppow),
        max_power=jnp.asarray(ppow.max(1)), direction=jnp.asarray(pdir),
        radius=jnp.asarray(np.float32(0.2)),
        valid=jnp.asarray(np.ones(P, bool)),
    ))
    qB = 1 << 18
    q = jnp.asarray(rng.uniform(-15, 15, (qB, 3)).astype(np.float32))
    timeit(
        f"pallas photon gather sweep ({P}-photon map, shuffled queries)",
        lambda s: pallas_gather(pmap.ctable, pmap.cbounds, pmap.radius,
                                q)[0],
        qB, "cluster-culled filtered-sum sweep (r_eff = r)",
    )

    # 7. Fused adjoint (backward) kernel on the box scene.
    from qaray_tpu.ops.pallas_adjoint import adjoint_render

    ct = jnp.full((B, 3), 1.0 / (B * 3), jnp.float32)
    kd = jax.random.key_data(key)
    timeit(
        "pallas adjoint kernel (box, DiffParams grads)",
        lambda s: adjoint_render(arrays, meta, cfg, px, py,
                                 jnp.full((B,), s, jnp.int32), kd, ct),
        B, "forward replay + reverse beta-chain + param reduce",
    )

    # jax.profiler attempt (recorded for the artifact either way).
    prof_note = "not attempted"
    try:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                sync(render_batch(arrays, meta, cfg, px, py,
                                  jnp.zeros((B,), jnp.int32), key)[0])
            import glob
            import os

            files = glob.glob(os.path.join(td, "**", "*"), recursive=True)
            n_bytes = sum(os.path.getsize(f) for f in files
                          if os.path.isfile(f))
            prof_note = (
                f"jax.profiler.trace produced {len(files)} files, "
                f"{n_bytes} bytes (host-side trace only; the tunneled axon "
                "runtime exposes no per-kernel device timeline)"
            )
    except Exception as e:
        prof_note = f"jax.profiler.trace failed: {str(e)[:150]}"

    with open("profile_kernels.json", "w") as f:
        json.dump({"device": dev,
                   "timing": "forced_completion_scalar_reduction_pipelined",
                   "profiler_note": prof_note, "rows": rows}, f, indent=2)

    with open("PROFILE.md", "w") as f:
        f.write(
            "# PROFILE — per-kernel timings (round 5)\n\n"
            f"Device: {dev}. Methodology: each production kernel timed in\n"
            "isolation, 6 pipelined dispatches per host sync, best of 3,\n"
            "forced completion by scalar reduction (block_until_ready can\n"
            "return at enqueue on this tunneled runtime). Reproduce with\n"
            "`python tools/profile_bench.py`.\n\n"
            "| kernel | lanes | ms/dispatch | lanes/s | work |\n"
            "|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['kernel']} | {r['lanes']} | {r['ms_per_dispatch']} "
                f"| {r['lanes_per_s']:.3g} | {r['work']} |\n"
            )
        f.write(
            f"\njax.profiler status: {prof_note}\n\n"
            "Runtime-physics denominators (elementwise GB/s, VPU FLOP/s,\n"
            "gather rows/s, MXU TFLOP/s): `tools/microbench_runtime.py` →\n"
            "`microbench_runtime.json`; summarized in MESH_SCALE.md.\n"
        )
    print("wrote PROFILE.md")


if __name__ == "__main__":
    main()
