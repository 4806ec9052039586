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


def main():
    import jax
    import jax.numpy as jnp

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
        "batch_lanes": batch,
        "spp_equivalent_per_s_800x600": rays_per_s / batch,
        "device": str(jax.devices()[0]),
        "baseline_reference_rays_per_s_2thread_measured": BASELINE_RAYS_PER_S,
        "vs_baseline_8thread_extrapolated": rays_per_s
        / BASELINE_8THREAD_EXTRAPOLATED,
    }
    # Efficiency denominators: XLA's own cost model for one dispatch
    # (lowered+compiled executable cost_analysis) against v5e peaks. A ray
    # tracer is select/compare-heavy, so MFU is structurally low — the
    # interesting numbers are achieved flops and HBM draw per dispatch.
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
        details["xla_flops_per_dispatch"] = flops
        details["xla_bytes_accessed_per_dispatch"] = bytes_out
        details["achieved_tflops"] = flops / dispatch_s / 1e12
        details["achieved_hbm_gbps"] = bytes_out / dispatch_s / 1e9
        # v5e: 197 TFLOP/s bf16 MXU peak, ~819 GB/s HBM.
        details["mfu_vs_v5e_bf16_peak"] = flops / dispatch_s / 197e12
        details["hbm_util_vs_819gbps"] = bytes_out / dispatch_s / 819e9
    except Exception as e:  # cost model availability varies by backend
        details["cost_analysis_error"] = str(e)[:200]
    try:
        details["mesh_scene_rays_per_s"] = _mesh_bench()
    except Exception as e:  # mesh bench is best-effort
        details["mesh_scene_error"] = str(e)[:200]
    try:
        details["backward_paths_per_s"] = _grad_bench()
    except Exception as e:
        details["grad_bench_error"] = str(e)[:200]
    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "primary_rays_per_s_pathtrace_box",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S,
            }
        )
    )


def _grad_bench():
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
    cfg = IntegratorConfig(integrator="pathtrace", max_bounce=3, shadow_spp=4)
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


if __name__ == "__main__":
    main()
