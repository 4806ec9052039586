"""Host-side photon-map clustering for the device-resident Pallas gather.

The reference gathers photons with a balanced kd-tree kNN
(`cyPhotonMap::EstimateIrradiance<100>`, /root/reference/src/ext/
cyPhotonMap.h:334-395). kd descent is pointer-chasing — hostile to TPU — so
the TPU-native gather is a cluster-culled dense sweep (ops/pallas_photon.py):
photons are Morton-ordered by position and packed into fixed-size clusters
whose AABBs let a whole [R, 128] query block skip clusters farther than the
gather radius from every lane. Measured reference workloads put a *mean* of
0.2-0.4 photons inside the radius per query (default 10k-photon map at
r=0.2), so with 128-photon clusters most blocks sweep a handful of clusters.

Table layout ([Fp, 16] f32 rows, one photon per row — the same
[rows, <=128] shaping the megakernel's scene tables use for dynamic-sublane
scalar reads):
  cols 0-2   position
  cols 3-5   RGB power (already 1/numEmitted scaled)
  cols 6-8   max_power * direction  (premultiplied: the filter-weighted mean
             direction of EstimateIrradiance sums w * maxPower * dir)
  cols 9-15  zero padding
Padding rows carry position = +1e30: their d^2 overflows to +inf, so they
never land inside any radius and contribute exactly zero.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

PHOTON_CLUSTER = 128  # photons per cull cluster

# EstimateIrradiance<100>: the reference's compile-time kNN cap
# (MtlBlinn_PhotonMap.cpp:426-458 instantiates NUM_PHOTONS=100).
GATHER_K = 100


def pack_photon_clusters(pos, power, direction, max_power, valid,
                         cluster: int = PHOTON_CLUSTER):
    """Valid photons -> (ctable [Fp, 16], cbounds [C, 8]) numpy arrays.

    Rows are Morton-ordered by position (tight cluster AABBs). An empty map
    packs to one all-padding cluster with an inverted (never-overlapping)
    bound box.
    """
    from qaray_tpu.ops.mesh_tiles import _morton3

    pos = np.asarray(pos, np.float32)
    power = np.asarray(power, np.float32)
    direction = np.asarray(direction, np.float32)
    max_power = np.asarray(max_power, np.float32)
    valid = np.asarray(valid, bool)

    pos = pos[valid]
    power = power[valid]
    pdir = direction[valid] * max_power[valid][:, None]
    n = pos.shape[0]
    if n:
        order = np.argsort(_morton3(pos), kind="stable")
        pos, power, pdir = pos[order], power[order], pdir[order]
    fp = max(((n + cluster - 1) // cluster) * cluster, cluster)
    tab = np.zeros((fp, 16), np.float32)
    tab[:, 0:3] = 1e30  # padding rows: infinitely far away
    tab[:n, 0:3] = pos
    tab[:n, 3:6] = power
    tab[:n, 6:9] = pdir
    nc = fp // cluster
    cb = np.zeros((nc, 8), np.float32)
    for c in range(nc):
        rows = pos[c * cluster : (c + 1) * cluster]
        if rows.size == 0:
            cb[c, 0:3] = 1.0
            cb[c, 3:6] = -1.0  # inverted: never overlaps
        else:
            cb[c, 0:3] = rows.min(axis=0)
            cb[c, 3:6] = rows.max(axis=0)
    return tab, cb


def cluster_photon_map(pmap, cluster: int = PHOTON_CLUSTER):
    """PhotonMapData -> PhotonMapData with ctable/cbounds attached."""
    tab, cb = pack_photon_clusters(
        pmap.pos, pmap.power, pmap.direction, pmap.max_power, pmap.valid,
        cluster,
    )
    return pmap._replace(ctable=jnp.asarray(tab), cbounds=jnp.asarray(cb))
