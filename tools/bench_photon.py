"""Photon-mapping benchmarks on the real TPU (forced-completion timing).

Measures the round-5 photon fast path end to end:
  - photon/caustics map build (device emission batches)
  - standalone Pallas gather rate (coherent + shuffled query orders)
    vs the exact XLA gather
  - photon-mapped render throughput (full Renderer loop, megakernel
    in-kernel gathering + escalation) on trc_mtl_glass (real caustics)
    and example_project12_caustics_glossy (BASELINE configs[3]; its
    caustics map is unfillable by reference semantics — the reference
    HANGS on this scene with -use-photon-map, see photon/build.py)
  - --full: the flagship 1024 spp caustics_glossy run with a per-round
    wall-time trace.

Usage:  python tools/bench_photon.py [--full] [--out bench_photon_r05.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _force_complete(x):
    """Honest timing: pull a scalar reduction to host (CLAUDE.md)."""
    import jax.numpy as jnp

    return float(jnp.asarray(x).ravel()[:1024].sum())


def bench_gather_rate(gmap, queries, label, out):
    """Pallas cluster sweep vs exact XLA capped gather, queries/s."""
    import jax
    from qaray_tpu.ops.pallas_photon import pallas_gather
    from qaray_tpu.photon.gather import estimate_irradiance

    q = jax.numpy.asarray(queries)

    def run_pallas():
        irr, dsum, cnt = pallas_gather(gmap.ctable, gmap.cbounds,
                                       gmap.radius, q)
        return _force_complete(irr)

    run_pallas()  # compile
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        run_pallas()
    dt = (time.perf_counter() - t0) / reps
    rate_p = queries.shape[0] / dt
    out[f"gather_pallas_{label}_q_per_s"] = rate_p

    def run_xla():
        irr, d = estimate_irradiance(gmap, q)
        return _force_complete(irr)

    run_xla()
    t0 = time.perf_counter()
    run_xla()
    dt_x = time.perf_counter() - t0
    out[f"gather_xla_{label}_q_per_s"] = queries.shape[0] / dt_x
    print(f"  gather[{label}]: pallas {rate_p:.3e} q/s  "
          f"xla {queries.shape[0] / dt_x:.3e} q/s")


def render_scene(xml, res, spp, out, tag, full_trace=False,
                 reuse_maps=None):
    from qaray_tpu.renderer import Renderer, RendererParam
    from qaray_tpu.scene.xml_parser import load_scene

    scene = load_scene(xml)
    if res is not None:
        scene.camera.img_width, scene.camera.img_height = res
    p = RendererParam(spp_min=spp, spp_max=spp, integrator="photonmap",
                      use_photon_map=True, max_bounce=5)
    r = Renderer(p)
    t0 = time.perf_counter()
    if reuse_maps is not None:
        r.param.use_photon_map = True
        from qaray_tpu.scene.compiler import compile_scene

        r.scene_arrays, r.meta = compile_scene(scene)
        from qaray_tpu.fb.framebuffer import FrameBuffer

        r.fb = FrameBuffer(r.meta.img_width, r.meta.img_height)
        r.photon_maps = reuse_maps
    else:
        r.compute_scene(scene)
    out[f"{tag}_scene_build_s"] = time.perf_counter() - t0

    rounds = []
    if full_trace:
        last = [time.perf_counter()]

        def cb(done, total):
            now = time.perf_counter()
            rounds.append(round(now - last[0], 4))
            last[0] = now

        r.set_progress_callback(cb)

    t0 = time.perf_counter()
    fb = r.render()
    wall = time.perf_counter() - t0
    npx = fb.width * fb.height
    out[f"{tag}_wall_s"] = wall
    out[f"{tag}_samples_per_s"] = npx * spp / wall
    out[f"{tag}_resolution"] = [fb.width, fb.height]
    out[f"{tag}_spp"] = spp
    out[f"{tag}_mega_photon"] = bool(getattr(r, "_mega_photon", False))
    if full_trace:
        out[f"{tag}_round_wall_s"] = rounds
    print(f"  {tag}: {wall:.1f}s wall, "
          f"{npx * spp / wall:.3e} samples/s, mega={r._mega_photon}")
    return r, fb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="run the 1024spp flagship renders")
    ap.add_argument("--out", default="bench_photon_r05.json")
    args = ap.parse_args()

    from qaray_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    import jax

    out = {"device": str(jax.devices()[0].device_kind),
           "timing": "forced_completion_scalar_reduction"}

    # --- map build + gather microbench on trc_mtl_glass -------------------
    from qaray_tpu.renderer import Renderer, RendererParam
    from qaray_tpu.scene.xml_parser import load_scene

    scene = load_scene("/root/reference/inputs/trc_mtl_glass.xml")
    p = RendererParam(spp_min=4, spp_max=4, integrator="photonmap",
                      use_photon_map=True, max_bounce=5)
    r = Renderer(p)
    t0 = time.perf_counter()
    r.compute_scene(scene)
    out["glass_maps_build_s"] = time.perf_counter() - t0
    gmap, cmap = r.photon_maps
    print(f"maps built in {out['glass_maps_build_s']:.1f}s")

    # Gather queries: wall points from a coherent raster order and a
    # shuffled (incoherent) order — brackets the megakernel's per-bounce
    # block coherence.
    import jax.numpy as jnp
    from qaray_tpu.core import rng as RNG
    from qaray_tpu.integrators.engine import (
        IntegratorConfig, generate_camera_rays,
    )
    from qaray_tpu.ops.trace import trace_closest

    W, H = 512, 384
    ids = np.arange(W * H, dtype=np.int32)
    px = jnp.asarray(ids % W)
    py = jnp.asarray(ids // W)
    key = jax.random.key(0, impl="threefry2x32")
    keys = RNG.ray_keys(key, ids)
    campos, d, *_ = generate_camera_rays(
        r.scene_arrays, r.meta, IntegratorConfig(), px, py,
        jnp.zeros_like(px), keys,
    )
    hits = trace_closest(r.scene_arrays, r.meta, campos, d)
    hp = np.asarray(hits["p"])
    bench_gather_rate(gmap, hp, "coherent", out)
    bench_gather_rate(gmap, hp[np.random.RandomState(0).permutation(len(hp))],
                      "shuffled", out)

    # --- photon-mapped renders --------------------------------------------
    render_scene("/root/reference/inputs/trc_mtl_glass.xml", None, 64, out,
                 "glass_300x200_64spp", reuse_maps=r.photon_maps)
    render_scene(
        "/root/reference/inputs/example_project12_caustics_glossy.xml",
        None, 16, out, "caustics_glossy_800x600_16spp",
    )

    if args.full:
        _, fbc = render_scene(
            "/root/reference/inputs/example_project12_caustics_glossy.xml",
            None, 1024, out, "caustics_glossy_800x600_1024spp",
            full_trace=True,
        )
        fbc.save_image("bench_caustics_glossy_1024spp.png")
        _, fb = render_scene(
            "/root/reference/inputs/trc_mtl_glass.xml", None, 1024, out,
            "glass_300x200_1024spp",
        )
        fb.save_image("bench_caustics_glass_1024spp.png")

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if not k.endswith("round_wall_s")}, indent=1))


if __name__ == "__main__":
    main()
