"""Streaming (gather-free) mesh intersection: dense triangle sweep.

Why this exists: the BVH walks (ops/bvh_traverse.py, ops/bvh_packed.py) are
the reference's traversal re-expressed per lane, but on TPU their per-lane
random gathers lower to scalar loads — measured ~GB/s effective bandwidth,
four orders of magnitude under VPU throughput. The TPU-native shape of the
problem is the opposite: *stream the scene past the rays* as dense
vector ops with zero gathers, and cull work at block granularity rather
than per lane. (This mirrors how the fused Pallas analytic kernel already
treats spheres/planes — ops/pallas_analytic.py — extended to triangles.)

The triangle test is the reference's own (plane hit + dominant-axis 2D
barycentric, objects/objects.cpp:212-248) refactored into a form linear in
the hit point, so each ray x triangle-chunk pass is a handful of
broadcasted FMAs:

    t = (k - P.n) / (D.n)             k = v0.n precomputed
    a = A0 + A.P + t (A.D)            A, A0: barycentric-row coefficients
    b = B0 + B.P + t (B.D)            on the tri's dominant axis, /2S
    hit = !parallel & t>BIAS & a>=0 & b>=0 & 1-a-b>=0

The sweep finds the winning triangle id per ray; exact hit attributes
(t, bary, front) are then recomputed for the single winner with the
bit-exact reference formula (ops/intersect.py:intersect_triangles), so
everything downstream of the trace matches the BVH paths' numerics.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from qaray_tpu.core.constants import BIAS, BIGFLOAT
from qaray_tpu.ops.intersect import intersect_triangles

STREAM_CHUNK = 256  # triangles per fori step (static)


class StreamTris(NamedTuple):
    """Host-precomputed per-triangle streaming coefficients (padded)."""

    coeff: jnp.ndarray  # [Fp, 3, 3] rows: n, A, B
    const: jnp.ndarray  # [Fp, 4] k=v0.n, A0, B0, |n|


def build_stream(tri_v: np.ndarray, chunk: int = STREAM_CHUNK) -> StreamTris:
    """tri_v [F,3,3] -> StreamTris with F padded to a chunk multiple.

    Padding rows are all-zero: t = -(0-0)/eps = 0 fails t > BIAS, so padded
    triangles can never hit.
    """
    tri_v = np.asarray(tri_v, np.float32)
    num = tri_v.shape[0]
    if num == 0:
        z = np.zeros((chunk, 3, 3), np.float32)
        return StreamTris(jnp.asarray(z), jnp.asarray(np.zeros((chunk, 4), np.float32)))
    v0, v1, v2 = tri_v[:, 0], tri_v[:, 1], tri_v[:, 2]
    n = np.cross(v1 - v0, v2 - v0)
    k = np.sum(v0 * n, axis=-1)
    # Dominant axis by the reference's strict comparisons
    # (objects.cpp TriangleArea axis selection).
    an = np.abs(n)
    ax = np.where(
        (an[:, 0] > an[:, 1]) & (an[:, 0] > an[:, 2]),
        0,
        np.where(an[:, 1] > an[:, 2], 1, 2),
    )
    # ij = {0: (1, 2), 1: (0, 2), 2: (0, 1)} vectorized (a python loop here
    # cost ~1.5 s at 1M triangles — scene-load latency).
    i_idx = np.where(ax == 0, 1, 0)
    j_idx = np.where(ax == 2, 1, 2)
    ar = np.arange(num)
    v0i, v0j = v0[ar, i_idx], v0[ar, j_idx]
    v1i, v1j = v1[ar, i_idx], v1[ar, j_idx]
    v2i, v2j = v2[ar, i_idx], v2[ar, j_idx]
    s = (v1i - v0i) * (v2j - v0j) - (v2i - v0i) * (v1j - v0j)
    s = np.where(np.abs(s) < 1e-30, 1e-30, s)
    # area(hp,v1,v2)/s and area(hp,v2,v0)/s expanded linearly in hp.
    a0 = (v1i * v2j - v2i * v1j) / s
    avec = np.zeros((num, 3), np.float64)
    avec[ar, i_idx] = (v1j - v2j) / s
    avec[ar, j_idx] = (v2i - v1i) / s
    b0 = (v2i * v0j - v0i * v2j) / s
    bvec = np.zeros((num, 3), np.float64)
    bvec[ar, i_idx] = (v2j - v0j) / s
    bvec[ar, j_idx] = (v0i - v2i) / s

    coeff = np.stack([n, avec, bvec], axis=1).astype(np.float32)
    const = np.stack(
        [k, a0, b0, np.linalg.norm(n, axis=-1)], axis=-1
    ).astype(np.float32)
    pad = (-num) % chunk
    if pad:
        coeff = np.concatenate([coeff, np.zeros((pad, 3, 3), np.float32)])
        const = np.concatenate([const, np.zeros((pad, 4), np.float32)])
    return StreamTris(jnp.asarray(coeff), jnp.asarray(const))


def _chunk_test(p, d, coeff, const):
    """All rays vs one triangle chunk. coeff [CH,3,3], const [CH,4].

    Returns (t [B,CH] with BIGFLOAT misses). The six ray.coefficient dot
    products are [B,3]x[3,CH] matmuls — tiny K, but XLA's TPU matmul path
    fuses the epilogue and keeps intermediates on-chip, measuring ~450x the
    equivalent broadcast-FMA formulation. precision="highest" keeps the
    dots f32-accurate (the winner's attributes are re-derived exactly
    afterwards regardless).
    """
    n = coeff[:, 0]  # [CH,3]
    av = coeff[:, 1]
    bv = coeff[:, 2]

    def dots(w):  # [B,CH] = rays . w
        wt = w.T  # [3,CH]
        return (
            jax.lax.dot(p, wt, precision="highest"),
            jax.lax.dot(d, wt, precision="highest"),
        )

    pn, dn = dots(n)
    pa, da = dots(av)
    pb, db = dots(bv)
    k = const[None, :, 0]
    a0 = const[None, :, 1]
    b0 = const[None, :, 2]
    nl = const[None, :, 3]
    safe = jnp.where(jnp.abs(dn) < 1e-30, 1e-30, dn)
    t = (k - pn) / safe
    parallel = jnp.abs(dn) < 1e-7 * nl
    a = pa + t * da + a0
    b = pb + t * db + b0
    c = 1.0 - a - b
    ok = (~parallel) & (t > BIAS) & (a >= 0.0) & (b >= 0.0) & (c >= 0.0)
    return jnp.where(ok, t, BIGFLOAT)


@partial(jax.jit, static_argnames=("chunk",))
def stream_closest(p, d, t_cur, stream: StreamTris, chunk: int = STREAM_CHUNK):
    """Dense sweep closest hit. Returns (t [B], gid [B] or -1, gid2 [B]).

    t is the sweep's winner distance (used only for pruning comparisons);
    callers re-derive exact attributes for the winner via `exact_winner`.
    gid2 is the runner-up triangle: the sweep's linear-in-t predicate can
    disagree with the exact test near triangle edges, so if the winner fails
    the exact re-test the caller falls back to the runner-up instead of
    reporting a spurious miss.
    """
    num_rays = p.shape[0]
    total = stream.coeff.shape[0]
    assert total % chunk == 0, (
        f"stream triangle array length {total} is not a multiple of the "
        f"traversal chunk {chunk} (build_stream pads to its own chunk; pass "
        "the same value to both)"
    )
    t_best = t_cur
    gid_best = jnp.full((num_rays,), -1, jnp.int32)
    t2_best = jnp.full((num_rays,), BIGFLOAT)
    gid2_best = jnp.full((num_rays,), -1, jnp.int32)

    def body(c, carry):
        t_best, gid_best, t2_best, gid2_best = carry
        coeff = jax.lax.dynamic_slice_in_dim(stream.coeff, c * chunk, chunk)
        const = jax.lax.dynamic_slice_in_dim(stream.const, c * chunk, chunk)
        t = _chunk_test(p, d, coeff, const)
        imin = jnp.argmin(t, axis=1).astype(jnp.int32)
        tmin = jnp.min(t, axis=1)
        # Chunk runner-up: min with the winner column masked out.
        col = jnp.arange(chunk, dtype=jnp.int32)[None, :]
        t_wo = jnp.where(col == imin[:, None], BIGFLOAT, t)
        imin2 = jnp.argmin(t_wo, axis=1).astype(jnp.int32)
        tmin2 = jnp.min(t_wo, axis=1)
        gmin = c * chunk + imin
        gmin2 = c * chunk + imin2
        # Merge the chunk's top-2 with the running top-2 (4 candidates).
        cand_t = jnp.stack([t_best, t2_best, tmin, tmin2], axis=1)
        cand_g = jnp.stack(
            [gid_best, gid2_best, gmin, gmin2], axis=1
        )
        order = jnp.argsort(cand_t, axis=1)
        top_t = jnp.take_along_axis(cand_t, order[:, :2], axis=1)
        top_g = jnp.take_along_axis(cand_g, order[:, :2], axis=1)
        return top_t[:, 0], top_g[:, 0], top_t[:, 1], top_g[:, 1]

    t_best, gid_best, t2_best, gid2_best = jax.lax.fori_loop(
        0, total // chunk, body, (t_best, gid_best, t2_best, gid2_best)
    )
    # Runner-up only matters if it is itself a live hit (not the t_cur seed).
    gid2_best = jnp.where(t2_best < BIGFLOAT, gid2_best, -1)
    return t_best, gid_best, gid2_best


@partial(jax.jit, static_argnames=("chunk",))
def stream_any_hit(p, d, t_max, stream: StreamTris, chunk: int = STREAM_CHUNK):
    """Dense sweep occlusion: True where any triangle has BIAS < t < t_max."""
    total = stream.coeff.shape[0]
    assert total % chunk == 0, (
        f"stream triangle array length {total} is not a multiple of the "
        f"traversal chunk {chunk}"
    )
    occ = jnp.zeros((p.shape[0],), bool)

    def body(c, occ):
        coeff = jax.lax.dynamic_slice_in_dim(stream.coeff, c * chunk, chunk)
        const = jax.lax.dynamic_slice_in_dim(stream.const, c * chunk, chunk)
        t = _chunk_test(p, d, coeff, const)
        return occ | jnp.any(t < t_max[:, None], axis=1)

    return jax.lax.fori_loop(0, total // chunk, body, occ)


def exact_winner(p, d, gid, tri_v):
    """Re-run the reference-exact triangle test for each ray's winning
    triangle (ONE [B] gather). Returns (t, bary, front, hit)."""
    safe = jnp.maximum(gid, 0)
    v = tri_v[safe]  # [B,3,3]
    t, bary, front, hit = intersect_triangles(
        p, d, v[:, 0], v[:, 1], v[:, 2], jnp.full(p.shape[:1], BIGFLOAT)
    )
    valid = hit & (gid >= 0)
    return jnp.where(valid, t, BIGFLOAT), bary, front, valid
