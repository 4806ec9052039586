"""Device-mesh sharding of the render: the TPU-native MPI replacement.

The reference distributes tiles round-robin over MPI ranks and gathers
per-rank {color, z, spp, mask} buffers point-to-point to rank 0
(Renderer_MPI.cpp:103-207). Here the same decomposition is a
`jax.sharding.Mesh` over all chips with the ray-batch axis sharded via
`shard_map`; the "gather" is simply the output sharding (XLA inserts the
all-gather over ICI/DCN), and scene arrays are replicated per chip exactly
as every MPI rank loads the full scene (Renderer_MPI.cpp:54).

Multi-host: under `jax.distributed` initialization the same code spans
hosts — mesh axes ride ICI within a host and DCN across; nothing else
changes, which is the point of the design.
"""

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qaray_tpu.integrators.engine import IntegratorConfig, render_batch
from qaray_tpu.scene.arrays import SceneArrays, SceneMeta


def make_render_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices; axis 'rays' shards the batch."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("rays",))


def shard_render_batch(mesh: Mesh):
    """Sharded version of engine.render_batch.

    Inputs are placed with explicit shardings (batch axis over 'rays', scene
    replicated); the jitted engine then runs SPMD under GSPMD propagation —
    XLA partitions every per-ray computation and inserts the final
    all-gather when the host reads the result. Batch size must be a multiple
    of the mesh size (the renderer pads to power-of-two buckets, so this
    holds whenever the bucket >= device count).
    """
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("rays"))

    def run(scene, meta, cfg, px, py, sample_ids, base_key, photon_maps=None,
            want_aux=False):
        scene = jax.device_put(scene, replicated)
        px = jax.device_put(px, sharded)
        py = jax.device_put(py, sharded)
        sample_ids = jax.device_put(sample_ids, sharded)
        base_key = jax.device_put(base_key, replicated)
        if photon_maps is not None:
            photon_maps = jax.device_put(photon_maps, replicated)
        return render_batch(scene, meta, cfg, px, py, sample_ids, base_key,
                            photon_maps, want_aux=want_aux)

    return run


def device_put_replicated(scene: SceneArrays, mesh: Mesh) -> SceneArrays:
    """Replicate the compiled scene across the mesh (per-chip copy)."""
    return jax.device_put(scene, NamedSharding(mesh, P()))


def device_put_sharded_batch(arr, mesh: Mesh):
    return jax.device_put(arr, NamedSharding(mesh, P("rays")))
