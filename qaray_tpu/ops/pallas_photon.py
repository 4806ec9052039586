"""Pallas photon-gather sweep: cluster-culled dense irradiance estimation.

TPU-native realization of `cyPhotonMap::EstimateIrradiance<100>`
(/root/reference/src/ext/cyPhotonMap.h:334-395, quadratic filter): every
query lane of a [R, 128] block scores the photons of every cluster whose
AABB lies within the gather radius of the block's query bound box.

Cap semantics: the reference shrinks the effective radius to the 100th-
nearest distance only when MORE than 100 photons lie inside the radius.
Measured reference workloads (default 10k-photon map, r=0.2) put a mean of
0.2-0.4 photons in radius, so the sweep computes the exact un-shrunk
estimate (r_eff = r, identical to photon/gather.py when count <= 100) plus
a per-lane in-radius COUNT; callers escalate the (empirically ~0%) lanes
with count > 100 to the exact XLA top-k path. The megakernel
(ops/pallas_pathtrace.py) inlines `photon_sweep` per bounce and surfaces
the escalation mask; `pallas_gather` is the standalone dispatch used by
tests and the wavefront engine.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qaray_tpu.core.constants import BIGFLOAT
from qaray_tpu.photon.cluster import PHOTON_CLUSTER


def _masked_bounds(p, active):
    """Per-axis (lo, hi) scalar bounds over the block's ACTIVE lanes.

    No active lane => inverted bounds (lo=+BIG, hi=-BIG), which fail every
    cluster-overlap test, so the whole sweep is culled for free.
    """
    out = []
    for k in range(3):
        lo = jnp.min(jnp.where(active, p[k], BIGFLOAT))
        hi = jnp.max(jnp.where(active, p[k], -BIGFLOAT))
        out.append((lo, hi))
    return out


def photon_sweep(tab_ref, cb_ref, n_clusters: int, r2, p, active,
                 cluster: int = PHOTON_CLUSTER):
    """In-kernel gather over one clustered photon map.

    tab_ref: [Fp, 16] VMEM ref (photon/cluster.py layout); cb_ref: [C, 8];
    r2: scalar squared radius; p: component triple of [R, 128] query tiles;
    active: bool [R, 128] lanes that gather (inactive lanes get zeros).

    Returns (irrad_sum3, dirsum3, count) — the UN-normalized filtered sums
    (w = 1 - d^2/r^2 for d^2 < r^2) and the f32 in-radius count. Dividing
    irrad_sum by pi/2*r^2 reproduces photon/gather.py exactly whenever
    count <= GATHER_K.
    """
    shape = p[0].shape
    zero = jnp.zeros(shape, jnp.float32)
    qb = _masked_bounds(p, active)
    r = jnp.sqrt(r2)
    inv_r2 = 1.0 / r2

    def one_cluster(c, carry):
        ok = (cb_ref[c, 0] <= cb_ref[c, 3])
        for k in range(3):
            ok = ok & (cb_ref[c, k] - r <= qb[k][1]) \
                & (cb_ref[c, 3 + k] + r >= qb[k][0])

        def run(carry):
            def one_photon(j, carry):
                ir, ig, ib, dx, dy, dz, cnt = carry
                row = c * cluster + j
                ex = p[0] - tab_ref[row, 0]
                ey = p[1] - tab_ref[row, 1]
                ez = p[2] - tab_ref[row, 2]
                d2 = ex * ex + ey * ey + ez * ez
                inr = d2 < r2
                w = jnp.where(inr, 1.0 - d2 * inv_r2, 0.0)
                return (
                    ir + w * tab_ref[row, 3],
                    ig + w * tab_ref[row, 4],
                    ib + w * tab_ref[row, 5],
                    dx + w * tab_ref[row, 6],
                    dy + w * tab_ref[row, 7],
                    dz + w * tab_ref[row, 8],
                    cnt + jnp.where(inr, 1.0, 0.0),
                )

            return jax.lax.fori_loop(0, cluster, one_photon, carry)

        return jax.lax.cond(ok, run, lambda x: x, carry)

    ir, ig, ib, dx, dy, dz, cnt = jax.lax.fori_loop(
        0, n_clusters, one_cluster,
        (zero, zero, zero, zero, zero, zero, zero),
    )
    af = active.astype(jnp.float32)
    return (
        (ir * af, ig * af, ib * af),
        (dx * af, dy * af, dz * af),
        cnt * af,
    )


LANES = 128
BLOCK_ROWS = 8  # 1024 queries per grid step: tighter block AABBs than the
# megakernel's 4096-lane blocks — gather queries are points, and the cull
# win scales with block tightness.


def _standalone_kernel(n_clusters: int):
    def kernel(tab_ref, cb_ref, r2_ref, px_ref, py_ref, pz_ref, act_ref,
               ir_o, ig_o, ib_o, dx_o, dy_o, dz_o, cnt_o):
        p = (px_ref[:], py_ref[:], pz_ref[:])
        active = act_ref[:] > 0.5
        r2 = r2_ref[0, 0]
        (ir, ig, ib), (dx, dy, dz), cnt = photon_sweep(
            tab_ref, cb_ref, n_clusters, r2, p, active
        )
        ir_o[:] = ir
        ig_o[:] = ig
        ib_o[:] = ib
        dx_o[:] = dx
        dy_o[:] = dy
        dz_o[:] = dz
        cnt_o[:] = cnt

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def pallas_gather(ctable, cbounds, radius, p, active=None,
                  interpret: bool = False):
    """Standalone dispatch of the cluster sweep.

    p: [B, 3] query points. Returns (irrad_sum [B,3], dir_sum [B,3],
    count [B]) — same normalization contract as photon_sweep.
    """
    num = p.shape[0]
    if active is None:
        active = jnp.ones((num,), jnp.float32)
    else:
        active = active.astype(jnp.float32)
    block = BLOCK_ROWS * LANES
    pad = (-num) % block
    pp = jnp.pad(p, ((0, pad), (0, 0)))
    aa = jnp.pad(active, (0, pad))
    total = num + pad
    rows = total // LANES

    def shape2(a):
        return a.reshape(rows, LANES)

    n_clusters = ctable.shape[0] // PHOTON_CLUSTER
    r2 = (radius * radius).reshape(1, 1).astype(jnp.float32)

    block_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32s = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)

    outs = pl.pallas_call(
        _standalone_kernel(n_clusters),
        grid=(total // block,),
        in_specs=[small] * 3 + [block_spec] * 4,
        out_specs=(block_spec,) * 7,
        out_shape=(f32s,) * 7,
        interpret=interpret,
    )(ctable, cbounds, r2, shape2(pp[:, 0]), shape2(pp[:, 1]),
      shape2(pp[:, 2]), shape2(aa))

    flat = [o.reshape(-1)[:num] for o in outs]
    irrad = jnp.stack(flat[0:3], axis=-1)
    dsum = jnp.stack(flat[3:6], axis=-1)
    return irrad, dsum, flat[6]


# ---------------------------------------------------------------------------
# Record-based gathering: Morton-sort queries, sweep with tight blocks
# ---------------------------------------------------------------------------


def _morton_keys(p, valid):
    """[B,3] points -> 30-bit Morton codes over the valid points' bbox.

    Invalid lanes get INT32_MAX so the sort packs them at the tail, where
    whole blocks cull instantly (inactive lanes -> inverted block bounds).
    """
    big = jnp.float32(BIGFLOAT)
    lo = jnp.min(jnp.where(valid[:, None], p, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], p, -big), axis=0)
    ext = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((p - lo) / ext * 1023.0, 0.0, 1023.0).astype(jnp.uint32)

    def spread(v):
        v = (v | (v << jnp.uint32(16))) & jnp.uint32(0x030000FF)
        v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
        v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
        v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
        return v

    key = (
        spread(q[:, 0]) | (spread(q[:, 1]) << jnp.uint32(1))
        | (spread(q[:, 2]) << jnp.uint32(2))
    ).astype(jnp.int32)
    return jnp.where(valid, key, jnp.int32(0x7FFFFFFF))


def gather_apply(gmap, rec, interpret: bool = False):
    """Evaluate per-lane gather records against a clustered photon map.

    rec: 17 [B] f32 arrays in the megakernel's capture order —
    p(3), n(3), v(3), beta*diffuse(3), beta*specular(3), glossiness,
    valid. The records are Morton-sorted so the sweep's [R,128] blocks are
    spatially tight (deep-bounce gather points arrive in incoherent lane
    order), gathered, Blinn-combined (photon/gather.py gather_blinn), and
    un-sorted. Returns (contribution [B,3] — beta already folded in, zero
    on invalid lanes — and the escalation mask [B] for lanes whose
    in-radius count exceeds GATHER_K).
    """
    from qaray_tpu.core.constants import COLOR_LUMA_THRESHOLD
    from qaray_tpu.core.vecmath import dot, luma, normalize, pow_safe
    from qaray_tpu.photon.cluster import GATHER_K

    num = rec[0].shape[0]
    packed = jnp.stack(rec, axis=-1)  # [B, 17]
    valid = rec[16] > 0.5
    key = _morton_keys(packed[:, 0:3], valid)
    iota = jnp.arange(num, dtype=jnp.int32)
    _, si = jax.lax.sort_key_val(key, iota)
    ps = jnp.take(packed, si, axis=0)

    p_s = ps[:, 0:3]
    act_s = ps[:, 16]
    irr_sums, dirsum, cnt = pallas_gather(
        gmap.ctable, gmap.cbounds, gmap.radius, p_s, act_s,
        interpret=interpret,
    )
    r2 = gmap.radius * gmap.radius
    irrad = irr_sums / (jnp.pi * 0.5 * r2)
    # gather_blinn combine (MtlBlinn_PhotonMap.cpp:426-458).
    l_dir = -normalize(dirsum, eps=1e-30)
    n = ps[:, 3:6]
    v = ps[:, 6:9]
    h = normalize(v + l_dir, eps=1e-30)
    cos_nl = jnp.maximum(0.0, dot(n, l_dir))
    cos_nh = jnp.maximum(0.0, dot(n, h))
    c = irrad * cos_nl[:, None] * (
        ps[:, 9:12] + ps[:, 12:15] * pow_safe(cos_nh, ps[:, 15])[:, None]
    )
    gate = (act_s > 0.5) & (luma(irrad) > COLOR_LUMA_THRESHOLD)
    c = jnp.where(gate[:, None], c, 0.0)
    esc_s = (act_s > 0.5) & (cnt > float(GATHER_K))

    _, inv = jax.lax.sort_key_val(si, iota)
    return jnp.take(c, inv, axis=0), jnp.take(esc_s, inv, axis=0)
