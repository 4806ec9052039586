"""qaray-tpu: a TPU-native (JAX/XLA/Pallas) ray-tracing framework.

A from-scratch re-design of the capabilities of the `qaray` CPU ray tracer
(reference: /root/reference, wilsonCernWq/qaray) for TPU hardware:

- wavefront megabatch integrators (path tracing, Whitted, MC-GI, photon map)
  instead of per-pixel recursive shading,
- SoA scene arrays + vectorized/Pallas intersection kernels instead of
  virtual dispatch over a node tree,
- counter-based deterministic RNG (threefry) instead of time-seeded
  thread-local xorshift,
- `jax.sharding.Mesh` + `shard_map` tile sharding instead of TBB + MPI,
- differentiable radiance w.r.t. material/light/texture parameters
  (the reference has no backward pass).

The XML scene dialect, OBJ loading, material/light models and CLI flags
match the reference so its `inputs/*.xml` scenes run unmodified.
"""

__version__ = "0.1.0"

from qaray_tpu.scene.xml_parser import load_scene
from qaray_tpu.scene.compiler import compile_scene
from qaray_tpu.renderer import Renderer, RendererParam

__all__ = [
    "load_scene",
    "compile_scene",
    "Renderer",
    "RendererParam",
    "__version__",
]
