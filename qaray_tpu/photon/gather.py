"""Photon irradiance estimation on device.

The reference gathers with a balanced kd-tree kNN (cyPhotonMap.h
EstimateIrradiance<100>: up to 100 nearest within a radius cap, quadratic
filter 1 - d^2/r^2, area normalization pi/2 * r^2, and a filter-weighted mean
photon direction). kd-tree descent is pointer-chasing — hostile to TPU — so
the TPU-native gather is a *dense chunked sweep*: every query lane scores
every photon chunk, and the filter-weighted sums become [B,C] x [C,3]
matmuls that run on the MXU. Photon maps are small (10k default), so the
sweep is bandwidth-trivial and needs no spatial structure at all.

The <=100-nearest cap (EstimateIrradiance<100>) is applied exactly: the
kd heap's final `dist2[0]` is the distance of the 100th-nearest photon when
more than 100 lie inside the radius, and both the quadratic filter and the
pi/2*r^2 area use that shrunken radius. Here the same quantity is the kth
smallest entry of the dense distance row, found with `lax.top_k` per query
chunk — identical estimates, no kd-tree.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from qaray_tpu.core.constants import COLOR_LUMA_THRESHOLD
from qaray_tpu.core.vecmath import dot, luma, normalize, pow_safe


class PhotonMapData(NamedTuple):
    pos: jnp.ndarray  # [P, 3]
    power: jnp.ndarray  # [P, 3] RGB power (already 1/numEmitted scaled)
    max_power: jnp.ndarray  # [P] max component (direction weighting)
    direction: jnp.ndarray  # [P, 3] incoming photon direction
    radius: jnp.ndarray  # [] gather radius
    valid: jnp.ndarray  # [P] bool (padding mask)
    # Device-resident gather tables (photon/cluster.py): Morton-clustered
    # photon rows + cluster AABBs for the Pallas cluster-culled sweep.
    # None on maps that only feed the exact XLA gather paths below.
    ctable: jnp.ndarray = None  # [Fp, 16]
    cbounds: jnp.ndarray = None  # [C, 8]


def estimate_irradiance(
    pmap: PhotonMapData,
    p,
    chunk: int = 512,
    max_photons: int | None = 100,
    q_chunk: int = 1024,
):
    """Quadratic-filtered irradiance + mean direction at query points p [B,3].

    Port of cyPhotonMap::EstimateIrradiance (FILTER_TYPE_QUADRATIC):
        irrad = sum_i (1 - d_i^2/r_eff^2) * power_i / (pi/2 * r_eff^2)
        dir   = normalize(sum_i (1 - d_i^2/r_eff^2) * maxPower_i * dir_i)
    where r_eff^2 = min(radius^2, d2 of the `max_photons`-th nearest photon)
    — the kd heap's final dist2[0] (cyPhotonMap.h:356-357,385).

    max_photons=None disables the cap and runs the cheaper photon-chunked
    MXU sweep (all in-radius photons contribute with r_eff = radius).
    """
    if max_photons is not None:
        if pmap.pos.shape[0] > _STREAM_THRESHOLD:
            return _estimate_capped_stream(pmap, p, max_photons, q_chunk)
        return _estimate_capped(pmap, p, max_photons, q_chunk)
    return _estimate_uncapped(pmap, p, chunk)


# Above this map size the one-shot [Q, P] distance matrix + top_k over P
# stops fitting comfortably; the two-pass streaming gather takes over.
_STREAM_THRESHOLD = 32768
_P_CHUNK = 2048  # photon chunk for the streaming passes


def _estimate_capped_stream(pmap: PhotonMapData, p, max_photons: int,
                            q_chunk: int):
    """Exact `EstimateIrradiance<k>` at large map sizes (100k-1M photons).

    Identical estimates to `_estimate_capped` (equivalence-tested), but the
    photon axis is STREAMED in chunks instead of materialized as one [Q, P]
    row: pass 1 scan-merges a running top-k distance set per query (top_k
    over k + chunk columns) and counts in-radius photons, which yields the
    exact shrunken radius; pass 2 re-streams the chunks and accumulates the
    quadratic-filtered sums as [Q,C]x[C,3] MXU matmuls. No per-lane gathers,
    no spatial structure — dense VPU/MXU work, O(Q*P) but with O(Q*k)
    memory.
    """
    num_photons = pmap.pos.shape[0]
    num_q = p.shape[0]
    r2 = pmap.radius * pmap.radius
    k = min(max_photons, num_photons)

    pad_p = (-num_photons) % _P_CHUNK
    pos = jnp.pad(pmap.pos, ((0, pad_p), (0, 0)))
    power = jnp.pad(pmap.power, ((0, pad_p), (0, 0)))
    maxp = jnp.pad(pmap.max_power, (0, pad_p))
    pdir = jnp.pad(pmap.direction, ((0, pad_p), (0, 0)))
    valid = jnp.pad(pmap.valid, (0, pad_p))
    n_pc = (num_photons + pad_p) // _P_CHUNK
    pos_c = pos.reshape(n_pc, _P_CHUNK, 3)
    pow_c = power.reshape(n_pc, _P_CHUNK, 3)
    maxp_c = maxp.reshape(n_pc, _P_CHUNK)
    dir_c = pdir.reshape(n_pc, _P_CHUNK, 3)
    val_c = valid.reshape(n_pc, _P_CHUNK)

    q_chunk = min(q_chunk, max(num_q, 1))
    pad_q = (-num_q) % q_chunk
    q = jnp.pad(p, ((0, pad_q), (0, 0)))
    n_qc = (num_q + pad_q) // q_chunk

    def one_chunk(qc):  # [Qc, 3] -> ([Qc,3], [Qc,3])
        def d2_of(cpos, cvalid):
            d2 = jnp.sum((qc[:, None, :] - cpos[None, :, :]) ** 2, axis=-1)
            return jnp.where(cvalid[None, :], d2, jnp.inf)

        def pass1(carry, args):
            topk, count = carry
            d2 = d2_of(args[0], args[1])
            merged = jnp.concatenate([topk, d2], axis=1)
            topk = -jax.lax.top_k(-merged, k)[0]
            count = count + jnp.sum(d2 < r2, axis=-1)
            return (topk, count), None

        init = (
            jnp.full((qc.shape[0], k), jnp.inf, jnp.float32),
            jnp.zeros((qc.shape[0],), jnp.int32),
        )
        (topk, count), _ = jax.lax.scan(pass1, init, (pos_c, val_c))
        kth = topk[:, -1]
        # dist2[0] shrinks only when STRICTLY MORE than k photons lie inside
        # the radius (cyPhotonMap.h:497) — same rule as _estimate_capped.
        r_eff2 = jnp.where(count > k, jnp.minimum(r2, kth), r2)
        r_eff2 = jnp.maximum(r_eff2, 1e-30)

        def pass2(carry, args):
            irrad, dsum = carry
            cpos, cpow, cmaxp, cdir, cvalid = args
            d2 = d2_of(cpos, cvalid)
            w = jnp.maximum(0.0, 1.0 - d2 / r_eff2[:, None])  # inf rows -> 0
            irrad = irrad + jnp.dot(w, cpow, preferred_element_type=jnp.float32)
            dsum = dsum + jnp.dot(
                w * cmaxp[None, :], cdir, preferred_element_type=jnp.float32
            )
            return (irrad, dsum), None

        init2 = (
            jnp.zeros((qc.shape[0], 3), jnp.float32),
            jnp.zeros((qc.shape[0], 3), jnp.float32),
        )
        (irrad, dsum), _ = jax.lax.scan(
            pass2, init2, (pos_c, pow_c, maxp_c, dir_c, val_c)
        )
        area = jnp.pi * 0.5 * r_eff2
        return irrad / area[:, None], normalize(dsum, eps=1e-30)

    irrad, direction = jax.lax.map(one_chunk, q.reshape(n_qc, q_chunk, 3))
    return (
        irrad.reshape(-1, 3)[:num_q],
        direction.reshape(-1, 3)[:num_q],
    )


def _estimate_capped(pmap: PhotonMapData, p, max_photons: int, q_chunk: int):
    num_photons = pmap.pos.shape[0]
    num_q = p.shape[0]
    r2 = pmap.radius * pmap.radius

    pad_p = (-num_photons) % 128
    pos = jnp.pad(pmap.pos, ((0, pad_p), (0, 0)))
    power = jnp.pad(pmap.power, ((0, pad_p), (0, 0)))
    maxp = jnp.pad(pmap.max_power, (0, pad_p))
    pdir = jnp.pad(pmap.direction, ((0, pad_p), (0, 0)))
    valid = jnp.pad(pmap.valid, (0, pad_p))
    total_p = num_photons + pad_p
    k = min(max_photons, total_p)

    q_chunk = min(q_chunk, max(num_q, 1))
    pad_q = (-num_q) % q_chunk
    q = jnp.pad(p, ((0, pad_q), (0, 0)))
    n_chunks = (num_q + pad_q) // q_chunk

    def one_chunk(qc):  # [Qc, 3] -> ([Qc,3], [Qc,3])
        d2 = jnp.sum((qc[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(valid[None, :], d2, jnp.inf)  # [Qc, P]
        # dist2[0] semantics (cyPhotonMap.h:497): it shrinks to the heap max
        # (= kth-nearest distance) only via the replacement branch, i.e. only
        # when STRICTLY MORE than k photons lie inside the radius; with <= k
        # found it stays radius^2.
        kth = -jax.lax.top_k(-d2, k)[0][:, -1]
        count = jnp.sum(d2 < r2, axis=-1)
        r_eff2 = jnp.where(count > k, jnp.minimum(r2, kth), r2)
        r_eff2 = jnp.maximum(r_eff2, 1e-30)
        w = jnp.maximum(0.0, 1.0 - d2 / r_eff2[:, None])  # inf rows -> 0
        irrad = jnp.dot(w, power, preferred_element_type=jnp.float32)
        dsum = jnp.dot(w * maxp[None, :], pdir, preferred_element_type=jnp.float32)
        area = jnp.pi * 0.5 * r_eff2
        return irrad / area[:, None], normalize(dsum, eps=1e-30)

    irrad, direction = jax.lax.map(one_chunk, q.reshape(n_chunks, q_chunk, 3))
    return (
        irrad.reshape(-1, 3)[:num_q],
        direction.reshape(-1, 3)[:num_q],
    )


def _estimate_uncapped(pmap: PhotonMapData, p, chunk: int = 512):
    num_photons = pmap.pos.shape[0]
    r2 = pmap.radius * pmap.radius
    pad = (-num_photons) % chunk
    pos = jnp.pad(pmap.pos, ((0, pad), (0, 0)))
    power = jnp.pad(pmap.power, ((0, pad), (0, 0)))
    maxp = jnp.pad(pmap.max_power, (0, pad))
    pdir = jnp.pad(pmap.direction, ((0, pad), (0, 0)))
    valid = jnp.pad(pmap.valid, (0, pad))
    n_chunks = (num_photons + pad) // chunk

    def body(carry, args):
        irrad, dsum = carry
        cpos, cpow, cmaxp, cdir, cvalid = args
        # [B, C] squared distances.
        d2 = jnp.sum(
            (p[:, None, :] - cpos[None, :, :]) ** 2, axis=-1
        )
        w = jnp.maximum(0.0, 1.0 - d2 / r2)
        w = jnp.where((d2 < r2) & cvalid[None, :], w, 0.0)
        irrad = irrad + jnp.dot(w, cpow, preferred_element_type=jnp.float32)
        dsum = dsum + jnp.dot(
            w * cmaxp[None, :], cdir, preferred_element_type=jnp.float32
        )
        return (irrad, dsum), None

    init = (jnp.zeros((p.shape[0], 3)), jnp.zeros((p.shape[0], 3)))
    (irrad, dsum), _ = jax.lax.scan(
        body,
        init,
        (
            pos.reshape(n_chunks, chunk, 3),
            power.reshape(n_chunks, chunk, 3),
            maxp.reshape(n_chunks, chunk),
            pdir.reshape(n_chunks, chunk, 3),
            valid.reshape(n_chunks, chunk),
        ),
    )
    area = jnp.pi * 0.5 * r2
    irrad = irrad / jnp.maximum(area, 1e-30)
    direction = normalize(dsum, eps=1e-30)
    return irrad, direction


def gather_blinn(pmap: PhotonMapData, p, n, v, diffuse, specular, glossiness):
    """Blinn-weighted photon gather (MtlBlinn_PhotonMap.cpp:426-458):
        L = -normalize(D); H = norm(V+L)
        contribution = I * cosNL * (diffuse + specular * cosNH^gloss)
    zeroed when the estimate luma is below the reference threshold."""
    irrad, d = estimate_irradiance(pmap, p)
    l_dir = -d
    h = normalize(v + l_dir, eps=1e-30)
    cos_nl = jnp.maximum(0.0, dot(n, l_dir))
    cos_nh = jnp.maximum(0.0, dot(n, h))
    c = irrad * cos_nl[:, None] * (
        diffuse + specular * pow_safe(cos_nh, glossiness)[:, None]
    )
    return jnp.where((luma(irrad) > COLOR_LUMA_THRESHOLD)[:, None], c, 0.0)
