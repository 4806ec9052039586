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

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qaray_tpu.integrators.engine import render_batch
from qaray_tpu.scene.arrays import SceneArrays


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
    multiprocess = len(mesh.devices.flatten()) > len(
        [d for d in mesh.devices.flatten() if d.process_index == jax.process_index()]
    )

    def put(x, sh):
        """Place with a global sharding. Multi-process: device_put rejects
        non-addressable shardings, so build the global array from the
        process-local full copy (every host computes the same full batch —
        the reference's every-rank-loads-everything discipline)."""
        if not multiprocess:
            return jax.device_put(x, sh)
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a))
            if not _is_key(a)
            else a,
            x,
        )

    def _is_key(a):
        import jax.dtypes

        return hasattr(a, "dtype") and jax.dtypes.issubdtype(
            a.dtype, jax.dtypes.prng_key
        )

    def run(scene, meta, cfg, px, py, sample_ids, base_key, photon_maps=None,
            want_aux=False):
        scene = put(scene, replicated)
        px = put(px, sharded)
        py = put(py, sharded)
        sample_ids = put(sample_ids, sharded)
        # Typed key arrays can't round-trip through process-local
        # construction; they are host-identical scalars, passed through and
        # treated as replicated by jit.
        if not multiprocess:
            base_key = jax.device_put(base_key, replicated)
        if photon_maps is not None:
            photon_maps = put(photon_maps, replicated)
        out = render_batch(scene, meta, cfg, px, py, sample_ids, base_key,
                           photon_maps, want_aux=want_aux)
        if jax.process_count() > 1:
            # Multi-process: the outputs are GLOBAL sharded arrays whose
            # shards live on other hosts too; gather them so every process
            # holds the full result (the reference's mask-composite to rank
            # 0, Renderer_MPI.cpp:142-207 — except every rank gets a copy,
            # which is what the renderer's accumulate expects).
            from jax.experimental import multihost_utils

            out = multihost_utils.process_allgather(out, tiled=True)
        return out

    return run


def device_put_replicated(scene: SceneArrays, mesh: Mesh) -> SceneArrays:
    """Replicate the compiled scene across the mesh (per-chip copy)."""
    return jax.device_put(scene, NamedSharding(mesh, P()))


def device_put_sharded_batch(arr, mesh: Mesh):
    return jax.device_put(arr, NamedSharding(mesh, P("rays")))
