"""Benchmark: path-tracing throughput (rays/s) on the device JAX selects.

Renders the reference's example_project3_box.xml (Cornell-style, fully
asset-complete) with the flagship path-trace integrator and reports primary
rays per second, counting one full path-trace dispatch per primary ray (all
bounces + shadow rays included in the timed work but only primary rays in
the numerator, matching how the reference would count PixelRender calls).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against BASELINE_RAYS_PER_S: the patched reference
C++ build (/tmp/qref, Release, OpenMP) *measured* on this same scene at
800x600 — marginal rays/s between -spp 1 and -spp 16 runs, 2 threads on this
host's 2-core CPU (see BASELINE.md "Measured" table). Per-thread that is
~0.57 Mray/s, so an 8-thread workstation extrapolates to ~4.5 Mray/s
(reported separately in bench_details.json as vs_baseline_8thread).
"""

import json
import time

import numpy as np

BASELINE_RAYS_PER_S = 1.136e6  # measured: 2 threads, this host, box scene
BASELINE_8THREAD_EXTRAPOLATED = 4.54e6  # 8 x measured per-thread rate

# Every timing below ends by pulling a scalar reduction of device output to
# host: on this tunneled runtime block_until_ready can return at enqueue
# time, so only a host-visible data dependency proves the work ran.
TIMING_METHOD = "forced_completion_scalar_reduction"


def main():
    import jax
    import jax.numpy as jnp

    from qaray_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()

    from qaray_tpu.integrators.engine import IntegratorConfig, render_batch
    from qaray_tpu.scene.compiler import compile_scene
    from qaray_tpu.scene.xml_parser import load_scene

    scene = load_scene("/root/reference/inputs/example_project3_box.xml")
    arrays, meta = compile_scene(scene)
    cfg = IntegratorConfig(integrator="pathtrace", max_bounce=5, shadow_spp=16)

    w, h = meta.img_width, meta.img_height
    batch = w * h  # 480k primary rays per dispatch
    ids = np.arange(batch, dtype=np.int32)
    px = jnp.asarray(ids % w)
    py = jnp.asarray(ids // w)
    key = jax.random.key(0, impl="rbg")

    def step(s):
        sample_ids = jnp.full((batch,), s, jnp.int32)
        radiance, t0 = render_batch(arrays, meta, cfg, px, py, sample_ids, key)
        return radiance

    # Warmup / compile. NOTE on timing honesty: on the axon backend,
    # `block_until_ready` can return before the dispatch actually completes
    # (measured: a traversal that takes seconds wall-clock "blocks" in
    # 0.2 ms), silently turning a throughput bench into an enqueue bench.
    # Every measurement therefore ends by pulling a SCALAR REDUCTION of the
    # output to host (float(x.min())) — 4 bytes, forces real completion.
    def sync(x):
        return float(x.min())

    sync(step(0))
    for s in range(1, 4):
        sync(step(s))

    # Pipelined measurement (how the renderer actually dispatches rounds —
    # it pulls each round's radiance to host), best-of-3.
    rounds = 20
    best = float("inf")
    s0 = 4
    for trial in range(3):
        t_start = time.perf_counter()
        outs = [step(s0 + s) for s in range(rounds)]
        sync(outs[-1])
        best = min(best, time.perf_counter() - t_start)
        s0 += rounds
    rays_per_s = rounds * batch / best

    # Secondary metrics -> bench_details.json (stdout stays one JSON line).
    details = {
        "primary_rays_per_s_pathtrace_box": rays_per_s,
        # Methodology flag: every number in this file ends with a scalar
        # reduction pulled to host (float(x.min())). The r01/r02 artifacts
        # (2.0e9 "rays/s") carried no such flag and timed ENQUEUE on this
        # tunneled runtime; any bench JSON without this field is suspect.
        "timing": TIMING_METHOD,
        "batch_lanes": batch,
        "spp_equivalent_per_s_800x600": rays_per_s / batch,
        "device": str(jax.devices()[0]),
        "baseline_reference_rays_per_s_2thread_measured": BASELINE_RAYS_PER_S,
        "vs_baseline_8thread_extrapolated": rays_per_s
        / BASELINE_8THREAD_EXTRAPOLATED,
    }
    # Cost-model context. IMPORTANT caveat (round-3 lesson): XLA's
    # cost_analysis reports LOGICAL pre-fusion flops/bytes — its "bytes
    # accessed" exceeded the chip's physical HBM bandwidth by 2.1x in r03,
    # so neither is a physical utilization denominator. They are recorded
    # only as work-complexity context, with names that say so; physical
    # per-kernel timings live in PROFILE.md (tools/profile_bench.py).
    try:
        sample_ids = jnp.full((batch,), 0, jnp.int32)
        compiled = (
            render_batch.lower(arrays, meta, cfg, px, py, sample_ids, key)
            .compile()
        )
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_out = float(ca.get("bytes accessed", 0.0))
        dispatch_s = batch / rays_per_s
        details["xla_costmodel_logical_flops_per_dispatch"] = flops
        details["xla_costmodel_logical_bytes_per_dispatch"] = bytes_out
        details["logical_tflops_over_wall"] = flops / dispatch_s / 1e12
        details["costmodel_caveat"] = (
            "logical pre-fusion counts; NOT physical HBM/MXU utilization "
            "(r03 measured logical bytes at 2.1x physical HBM peak)"
        )
    except Exception as e:  # cost model availability varies by backend
        details["cost_analysis_error"] = str(e)[:200]
    try:
        details["mesh_scene_rays_per_s"] = _mesh_bench()
    except Exception as e:  # mesh bench is best-effort
        details["mesh_scene_error"] = str(e)[:200]
    try:
        # Matched config (bounce 5 / shadow 16 — same as the forward bench)
        # so fwd/bwd ratios are apples-to-apples; the lighter config is kept
        # for cross-round comparison with r03.
        details["backward_paths_per_s_matched_cfg"] = _grad_bench(
            max_bounce=5, shadow_spp=16
        )
        details["backward_paths_per_s_light_cfg"] = _grad_bench(
            max_bounce=3, shadow_spp=4
        )
    except Exception as e:
        details["grad_bench_error"] = str(e)[:200]
    try:
        details["mesh_backward_paths_per_s"] = _mesh_grad_bench()
    except Exception as e:
        details["mesh_grad_bench_error"] = str(e)[:200]
    try:
        details.update(_xmas_bench())
    except Exception as e:
        details["xmas_bench_error"] = str(e)[:200]
    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "primary_rays_per_s_pathtrace_box",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S,
                "timing": TIMING_METHOD,
            }
        )
    )


def _grad_bench(max_bounce=5, shadow_spp=16):
    """Forward+backward (value_and_grad) path throughput on the box scene.

    Runs the production kernels: the Pallas closest-hit carries a
    custom_vjp (winner-only XLA backward, ops/pallas_analytic.py), so the
    differentiable path no longer needs QARAY_NO_PALLAS. Pipelined
    best-of-3 over 20 rounds — the round-2 bench (5 rounds, ~2 ms of device
    time) was dominated by dispatch-latency noise and swung 330-600 Mpaths/s
    run-to-run.
    """
    import jax
    import jax.numpy as jnp

    from qaray_tpu.diff import render_value_and_grad
    from qaray_tpu.integrators.engine import IntegratorConfig
    from qaray_tpu.scene.compiler import compile_scene
    from qaray_tpu.scene.xml_parser import load_scene

    scene = load_scene("/root/reference/inputs/example_project3_box.xml")
    arrays, meta = compile_scene(scene)
    cfg = IntegratorConfig(
        integrator="pathtrace", max_bounce=max_bounce, shadow_spp=shadow_spp
    )
    batch = 1 << 18
    ids = np.arange(batch, dtype=np.int32)
    px = jnp.asarray(ids % meta.img_width)
    py = jnp.asarray((ids // meta.img_width) % meta.img_height)
    key = jax.random.key(0, impl="rbg")

    def step(s):
        sids = jnp.full((batch,), s, jnp.int32)
        return render_value_and_grad(arrays, meta, cfg, px, py, sids, key)

    # Forced-sync (see main(): block_until_ready can lie on this backend).
    float(step(0)[0].min())
    float(step(1)[0].min())
    rounds = 20
    best = float("inf")
    s0 = 2
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [step(s0 + s) for s in range(rounds)]
        float(outs[-1][0].min())
        best = min(best, time.perf_counter() - t0)
        s0 += rounds
    return rounds * batch / best


def _mesh_bench():
    """Triangle-mesh path throughput (icosphere scene, BVH traversal)."""
    import jax
    import jax.numpy as jnp

    from qaray_tpu.integrators.engine import IntegratorConfig, render_batch
    from qaray_tpu.scene.compiler import compile_scene
    from qaray_tpu.scene.xml_parser import load_scene

    scene = load_scene("tests/assets/mesh_scene.xml")
    arrays, meta = compile_scene(scene)
    cfg = IntegratorConfig(integrator="pathtrace", max_bounce=5, shadow_spp=16)
    w, h = meta.img_width, meta.img_height
    npx = w * h
    mult = 16  # 480k lanes
    batch = npx * mult
    ids = np.arange(batch, dtype=np.int32)
    px = jnp.asarray(ids % w)
    py = jnp.asarray((ids // w) % h)
    sids = jnp.asarray(ids // npx)
    key = jax.random.key(0, impl="rbg")

    def step(s):
        return render_batch(arrays, meta, cfg, px, py, sids + s, key)[0]

    float(step(0).min())  # forced-sync warmup
    rounds = 10
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [step(s) for s in range(1, rounds + 1)]
        float(outs[-1].min())
        best = min(best, time.perf_counter() - t0)
    return rounds * batch / best


def _mesh_grad_bench():
    """Forward+backward path throughput on the mesh scene: gradients must
    flow while pallas_sweep_closest (or the tiled sweep) is in the forward
    trace — the round-3 gap flagged in VERDICT weak #5."""
    import jax
    import jax.numpy as jnp

    from qaray_tpu.diff import render_value_and_grad
    from qaray_tpu.integrators.engine import IntegratorConfig
    from qaray_tpu.scene.compiler import compile_scene
    from qaray_tpu.scene.xml_parser import load_scene

    scene = load_scene("tests/assets/mesh_scene.xml")
    arrays, meta = compile_scene(scene)
    cfg = IntegratorConfig(integrator="pathtrace", max_bounce=5, shadow_spp=16)
    batch = 1 << 17
    ids = np.arange(batch, dtype=np.int32)
    px = jnp.asarray(ids % meta.img_width)
    py = jnp.asarray((ids // meta.img_width) % meta.img_height)
    key = jax.random.key(0, impl="rbg")

    def step(s):
        sids = jnp.full((batch,), s, jnp.int32)
        return render_value_and_grad(arrays, meta, cfg, px, py, sids, key)

    float(step(0)[0].min())
    rounds = 5
    best = float("inf")
    s0 = 1
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [step(s0 + s) for s in range(rounds)]
        float(outs[-1][0].min())
        best = min(best, time.perf_counter() - t0)
        s0 += rounds
    return rounds * batch / best


def _xmas_bench():
    """BASELINE primary metric: the FULL Renderer (adaptive loop, photon
    maps if flagged) on trc_scene_xmas.xml — end-to-end wall clock, not raw
    render_batch. Reports samples/s at the run spp plus the wall-clock a
    1024spp render extrapolates to (BASELINE.json configs[4] wants 1024spp;
    running that here would monopolize the round's bench slot, so the rate
    is measured at QARAY_BENCH_XMAS_SPP (default 32) — the adaptive loop is
    linear in spp, making the extrapolation a rate multiply). Saves the PNG
    next to the details file."""
    import os

    from qaray_tpu.renderer import Renderer, RendererParam
    from qaray_tpu.scene.xml_parser import load_scene

    spp = int(os.environ.get("QARAY_BENCH_XMAS_SPP", "32"))
    scene = load_scene("/root/reference/inputs/trc_scene_xmas.xml")
    param = RendererParam(
        spp_min=spp, spp_max=spp, integrator="photonmap", max_bounce=5
    )
    r = Renderer(param)
    r.compute_scene(scene)
    t0 = time.perf_counter()
    fb = r.render()
    cold_wall = time.perf_counter() - t0
    # Steady-state rate: render again with warm executables (the cold wall
    # is dominated by the megakernel's Mosaic compile, a one-time cost the
    # persistent compile cache amortizes across runs).
    r.fb.__init__(r.meta.img_width, r.meta.img_height)
    t0 = time.perf_counter()
    fb = r.render()
    wall = time.perf_counter() - t0
    fb.save_image("bench_xmas.png")
    pixels = fb.width * fb.height
    samples = float(np.asarray(fb.count, np.float64).sum())
    sps = samples / wall
    return {
        "xmas_resolution": [fb.width, fb.height],
        "xmas_spp": spp,
        "xmas_cold_wall_s": cold_wall,
        "xmas_wall_s": wall,
        "xmas_samples_per_s": sps,
        "xmas_projected_1024spp_wall_s": pixels * 1024 / sps,
    }


if __name__ == "__main__":
    main()
