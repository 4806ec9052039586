#!/usr/bin/env python3
"""Runtime-physics microbenchmarks: the four numbers behind MESH_SCALE.md.

Round-3's architecture decisions (megakernel, gather-free sweeps, cluster
DMA) rest on claims about THIS runtime's effective rates:

  1. XLA elementwise chains  -> effective HBM GB/s (the wavefront engine's
     per-bounce passes ride this)
  2. Pallas VPU FMA loop     -> effective f32 FLOP/s in-kernel
  3. XLA per-lane gather     -> random-index rows/s (the BVH-walk shape)
  4. XLA MXU matmul          -> TFLOP/s (the fast path everything else is
     measured against)

Every timing ends with a scalar reduction pulled to host (on this tunneled
runtime block_until_ready can return at enqueue; a host-visible data
dependency cannot lie). Prints one JSON line per metric and writes
microbench_runtime.json.

Usage: python tools/microbench_runtime.py [--out microbench_runtime.json]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="microbench_runtime.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dev = str(jax.devices()[0])
    results = {"device": dev,
               "timing": "forced_completion_scalar_reduction"}

    def sync(x):
        return float(x.reshape(-1)[:1].astype(jnp.float32).min())

    def best_of(fn, reps=3, inner=8):
        """Pipelined: `inner` dispatches per host sync — a single
        round-trip through the tunneled runtime costs ~25 ms, which would
        otherwise dominate every sub-100ms kernel. Returns seconds per
        call."""
        sync(fn())  # warm/compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(inner)]
            sync(outs[-1])
            best = min(best, (time.perf_counter() - t0) / inner)
        return best

    # 1. XLA elementwise chain: N sequential multiply-adds over [M] f32.
    #    Each pass reads+writes M*4 bytes if unfused; XLA fuses the chain,
    #    so the measured rate IS the effective elementwise throughput of
    #    one fused pass (bytes = 2 * M * 4 per chain).
    m = 1 << 24  # 16M f32 = 64 MB
    x = jnp.arange(m, dtype=jnp.float32)
    chain = 16

    @jax.jit
    def f_elem(x):
        for i in range(chain):
            x = x * 1.0000001 + 0.5
        return x

    dt = best_of(lambda: f_elem(x))
    results["xla_fused_elementwise_gbps"] = 2 * m * 4 / dt / 1e9
    results["xla_elementwise_note"] = (
        f"one fused chain of {chain} fma over {m} f32; bytes=read+write"
    )

    # 1b. UNFUSED elementwise: force materialization between passes by
    #     making each pass a separate jit dispatch (what a long wavefront
    #     pipeline of distinct jitted stages pays).
    @jax.jit
    def f_one(x):
        return x * 1.0000001 + 0.5

    def run_unfused():
        y = x
        for _ in range(chain):
            y = f_one(y)
        return y

    dt = best_of(run_unfused, inner=2)
    dt = dt / chain  # per elementwise dispatch
    results["xla_per_dispatch_elementwise_gbps"] = 2 * m * 4 / dt / 1e9

    # 2. Pallas VPU FMA loop: K iterations of an FMA on an [8,128] tile per
    #    grid step, G steps. flops = G * K * 1024 * 2.
    K = 4096
    G = 512

    def vpu_kernel(x_ref, o_ref):
        v = x_ref[:]

        def body(i, v):
            return v * 1.0000001 + 1e-7

        v = jax.lax.fori_loop(0, K, body, v)
        o_ref[:] = v

    xt = jnp.ones((G * 8, 128), jnp.float32)
    spec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def f_vpu(xt):
        return pl.pallas_call(
            vpu_kernel, grid=(G,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((G * 8, 128), jnp.float32),
        )(xt)

    dt = best_of(lambda: f_vpu(xt))
    results["pallas_vpu_fma_tflops"] = G * K * 1024 * 2 / dt / 1e12

    # 3. Per-lane gather: B random row indices into a [N, 8] table.
    n_rows = 1 << 20
    b = 1 << 20
    table = jnp.asarray(
        np.random.default_rng(0).standard_normal((n_rows, 8)), jnp.float32
    )
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, n_rows, b), jnp.int32
    )

    @jax.jit
    def f_gather(table, idx):
        return table[idx]

    dt = best_of(lambda: f_gather(table, idx))
    results["xla_random_gather_mrows_s"] = b / dt / 1e6
    results["xla_random_gather_gbps"] = b * 32 / dt / 1e9

    # 4. MXU matmul: bf16 [4096, 4096] @ [4096, 4096].
    mm = 4096
    a = jnp.ones((mm, mm), jnp.bfloat16)
    bmat = jnp.ones((mm, mm), jnp.bfloat16)

    @jax.jit
    def f_mm(a, bmat):
        return jnp.dot(a, bmat, preferred_element_type=jnp.float32)

    dt = best_of(lambda: f_mm(a, bmat))
    results["xla_mxu_bf16_tflops"] = 2 * mm**3 / dt / 1e12

    for k, v in results.items():
        if isinstance(v, float):
            results[k] = round(v, 3)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
