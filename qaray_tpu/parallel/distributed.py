"""Multi-host initialization and the distributed render recipe.

The reference's inter-node story is MPI point-to-point with a static tile
decomposition (Renderer_MPI.cpp). The TPU-native equivalent needs NO new
communication code: after `init_distributed()`, `jax.devices()` spans every
chip in the pod slice, the same 1-D 'rays' mesh covers ICI within a host and
DCN across hosts, and the replicated-scene + sharded-batch pattern from
parallel/mesh.py runs unchanged. Parameter gradients under `qaray_tpu.diff`
are reduced by XLA's psum across the mesh — the one collective the
reference never needed (no backward pass there).

Usage on each host of a pod slice:

    from qaray_tpu.parallel.distributed import init_distributed
    init_distributed()            # env-driven (TPU pods autoconfigure)
    # ... build Renderer(param) with num_devices=len(jax.devices()) ...

Each process renders the full pixel set logically; XLA partitions the lanes
so every chip traces its shard — identical math to the reference's
round-robin tile ownership, without the hand-written gather.
"""

from __future__ import annotations

import jax


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """jax.distributed.initialize with TPU-pod auto-detection.

    On Cloud TPU pods all arguments are discovered from the environment;
    pass them explicitly for other clusters.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """Rank-0 check (the reference's `mpiRank == 0` gating for IO)."""
    return jax.process_index() == 0
