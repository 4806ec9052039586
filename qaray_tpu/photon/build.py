"""Photon map construction as a batched wavefront emission pass.

The reference builds its maps with a serial per-photon loop on rank 0
(renderer.cpp:119-290): pick a light, emit, bounce with BxDF-sampled photon
scattering (MtlBlinn_PhotonMap::RandomPhotonBounce), store at diffuse
surfaces after the first bounce (the caustics map additionally requires no
prior diffuse hit). Here whole batches of photon paths advance in lock-step
on device; the host loop collects stores until the map is full.

Semantics preserved:
- photon sources are point lights only (PointLight::IsPhotonSource,
  SpotLight returns false: lights/lights.h:114,156)
- per-path intensity = light intensity / numPhotonLights (renderer.cpp:163)
- store gate: luma of BASE diffuse > 0 (IsPhotonSurface), bounce != 0
- power update c *= BxDF / (PDF * scale) with the RR selection scale
  (RandomPhotonBounce, MtlBlinn_PhotonMap.cpp:566-571), photon-mode diffuse
  sampling = uniform hemisphere with PDF 0.5
- back-face Beer attenuation on the segment just traveled
- final ScalePhotonPowers(1 / numOfEmittedRays) where an "emitted ray" is a
  path that recorded at least one photon (renderer.cpp:195-198)
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qaray_tpu.core import rng as RNG
from qaray_tpu.core.constants import COLOR_LUMA_THRESHOLD, PHOTON_KILL
from qaray_tpu.core.vecmath import dot, luma, normalize, to_local_frame
from qaray_tpu.core.warps import uniform_hemisphere, uniform_sphere
from qaray_tpu.integrators import common as C
from qaray_tpu.ops.trace import trace_closest
from qaray_tpu.photon.gather import PhotonMapData
from qaray_tpu.scene.arrays import LIGHT_POINT, SceneArrays, SceneMeta


def _photon_bounce(scene, meta, hits, mtl, v, keys, glossy_attempts=4):
    """RandomPhotonBounce: returns (new_dir, power_factor, alive)."""
    n = hits["n"]
    front = hits["front"]

    fr = C.compute_fresnel(n, v, front, mtl.ior)
    tot = fr.total_reflection[:, None]
    t_k = mtl.refraction
    r_k = mtl.reflection
    sample_transmission = jnp.where(tot, 0.0, t_k * fr.t_ratio[:, None])
    sample_reflection = jnp.where(tot, r_k + t_k, r_k + t_k * fr.r_ratio[:, None])

    luma_t = luma(sample_transmission)
    luma_r = luma(sample_reflection)
    luma_d = luma(mtl.diffuse)

    r = RNG.uniform(RNG.fold(keys, RNG.P_LOBE_SELECT))
    coef_t = luma_t
    coef_r = coef_t + luma_r
    coef_d = coef_r + luma_d
    coef_sum = coef_d + PHOTON_KILL
    select = r * coef_sum
    sel_t = (select < coef_t) & (luma_t > COLOR_LUMA_THRESHOLD)
    sel_r = (~sel_t) & (select < coef_r) & (luma_r > COLOR_LUMA_THRESHOLD)
    sel_d = (~sel_t) & (~sel_r) & (select < coef_d) & (luma_d > COLOR_LUMA_THRESHOLD)
    rcp = 1.0 / coef_sum
    scale = jnp.where(
        sel_t, luma_t * rcp,
        jnp.where(sel_r, luma_r * rcp, jnp.where(sel_d, luma_d * rcp, 1.0)),
    )

    ks = RNG.fold(keys, RNG.P_LOBE_SAMPLE)
    if meta.has_glossy:
        refl_glossy = mtl.reflection_glossiness > 0.0
        refl_dir = jnp.where(
            refl_glossy[:, None],
            C.glossy_jitter_dir(fr.r_dir, fr.y_axis, mtl.reflection_glossiness,
                                RNG.fold(ks, 11), want_up=True,
                                attempts=glossy_attempts),
            fr.r_dir,
        )
        refr_glossy = mtl.refraction_glossiness > 0.0
        trans_dir = jnp.where(
            refr_glossy[:, None],
            C.glossy_jitter_dir(fr.t_dir, fr.y_axis, mtl.refraction_glossiness,
                                RNG.fold(ks, 12), want_up=False,
                                attempts=glossy_attempts),
            fr.t_dir,
        )
    else:
        refl_dir = fr.r_dir
        trans_dir = fr.t_dir
    # Photon-mode diffuse: uniform hemisphere, PDF = 0.5
    # (SampleDiffuseBxDF photonMap=true, MtlBlinn_PhotonMap.cpp:203-224).
    u = RNG.uniform(RNG.fold(ks, 13), (2,))
    diff_dir = to_local_frame(n, uniform_hemisphere(u))
    h = normalize(v + normalize(diff_dir, eps=1e-30), eps=1e-30)
    cos_nh = jnp.maximum(0.0, dot(n, h))
    diff_bxdf = mtl.diffuse + mtl.specular * jnp.power(cos_nh, mtl.glossiness)[:, None]

    go_t = sel_t
    go_r = sel_r
    go_d = sel_d & front
    alive = go_t | go_r | go_d

    new_dir = jnp.where(
        go_t[:, None], trans_dir, jnp.where(go_d[:, None], diff_dir, refl_dir)
    )
    bxdf = jnp.where(
        go_t[:, None],
        sample_transmission,
        jnp.where(go_d[:, None], diff_bxdf, sample_reflection),
    )
    pdf = jnp.where(go_d, 0.5, 1.0)
    factor = bxdf / (pdf * jnp.maximum(scale, 1e-30))[:, None]
    # Beer attenuation for the segment just traveled inside a medium.
    att = jnp.exp(-mtl.absorption * hits["t"][:, None])
    factor = jnp.where((~front)[:, None], factor * att, factor)
    return normalize(new_dir, eps=1e-30), factor, alive


@partial(jax.jit, static_argnames=("meta", "num_paths", "bounces", "caustics"))
def trace_photon_paths(scene: SceneArrays, meta: SceneMeta, base_key,
                       num_paths: int, bounces: int, caustics: bool):
    """Trace a batch of photon paths; returns per-(path, bounce) stores.

    Output arrays are [num_paths, bounces]: store mask, position, incoming
    direction, power. Order inside a path follows the reference's sequential
    fill (path-major, bounce-minor).
    """
    photon_lights = [
        i for i, k in enumerate(meta.light_kinds) if k == LIGHT_POINT
    ]
    assert photon_lights, "photon maps require at least one point light"
    light_scale = 1.0 / len(photon_lights)

    keys = RNG.ray_keys(base_key, jnp.arange(num_paths))
    ke = RNG.fold(keys, RNG.P_PHOTON_EMIT)

    # Light pick: FLOOR(r * n) for the global map, CEIL quirk for caustics
    # (renderer.cpp:151-157 vs 225-231).
    nl = len(photon_lights)
    r = RNG.uniform(RNG.fold(ke, 0))
    if caustics:
        pick = jnp.minimum(jnp.ceil(r * nl).astype(jnp.int32), nl - 1)
    else:
        pick = jnp.minimum(jnp.floor(r * nl).astype(jnp.int32), nl - 1)
    light_ids = jnp.asarray(np.array(photon_lights, np.int32))[pick]

    p = scene.lights.position[light_ids]
    u = RNG.uniform(RNG.fold(ke, 1), (2,))
    d = uniform_sphere(u)  # PointLight::RandomPhoton (lights.cpp:76-80)
    power = scene.lights.intensity[light_ids] * light_scale

    alive = jnp.ones((num_paths,), bool)
    has_diffuse = jnp.zeros((num_paths,), bool)

    store_mask = []
    store_pos = []
    store_dir = []
    store_pow = []

    for bounce in range(bounces):
        hits = trace_closest(scene, meta, p, d)
        alive = alive & hits["hit"]
        mtl = C.gather_materials(scene, hits["mtl"], hits["uvw"], hits["has_texture"],
                                 textured=meta.has_mtl_textures)
        base_diffuse_luma = luma(scene.materials.diffuse[jnp.maximum(hits["mtl"], 0)])
        is_photon_surface = base_diffuse_luma > 0.0

        store = alive & is_photon_surface & (bounce != 0)
        if caustics:
            store = store & (~has_diffuse)
        store_mask.append(store)
        store_pos.append(hits["p"])
        store_dir.append(d)
        store_pow.append(power)

        kb = RNG.fold(keys, 2000 + bounce)
        new_dir, factor, cont = _photon_bounce(scene, meta, hits, mtl, -d, kb)
        power = jnp.where((alive & cont)[:, None], power * factor, power)
        has_diffuse = has_diffuse | (alive & is_photon_surface)
        alive = alive & cont
        p = hits["p"]
        d = new_dir

    return (
        jnp.stack(store_mask, axis=1),
        jnp.stack(store_pos, axis=1),
        jnp.stack(store_dir, axis=1),
        jnp.stack(store_pow, axis=1),
    )


def _build_one_map(scene, meta, param, size, bounces, radius, caustics, seed,
                   batch=4096):
    """Host loop: emit batches until `size` photons are stored.

    Mirrors the reference's fill-until-full loop (renderer.cpp:148-198 /
    225-277). The emission batch grows with the observed store rate so large
    maps (-photon-map-size 1e6) fill in a few dispatches; if the scene
    cannot store photons at all (no diffuse surfaces reachable), that is an
    error — the reference would spin forever, we fail loudly instead.
    """
    pos_all, dir_all, pow_all = [], [], []
    emitted_with_store = 0
    total = 0
    b = 0
    zero_batches = 0
    while total < size:
        key = jax.random.PRNGKey(seed + 7919 * b + (100000 if caustics else 0))
        mask, pos, pdir, ppow = trace_photon_paths(
            scene, meta, key, batch, bounces, caustics
        )
        mask = np.asarray(mask)
        emitted_with_store += int(mask.any(axis=1).sum())
        flat = mask.reshape(-1)
        idx = np.nonzero(flat)[0]
        pos_all.append(np.asarray(pos).reshape(-1, 3)[idx])
        dir_all.append(np.asarray(pdir).reshape(-1, 3)[idx])
        pow_all.append(np.asarray(ppow).reshape(-1, 3)[idx])
        total += idx.size
        b += 1
        zero_batches = zero_batches + 1 if idx.size == 0 else 0
        if zero_batches >= 8:
            if caustics and total == 0:
                # A caustics photon needs a FIRST hit on a zero-diffuse
                # surface (renderer.cpp:248-271: every photon-surface hit
                # sets hasDiffuseHit, including the first) — in scenes
                # where every material has diffuse luma > 0 (e.g.
                # example_project12_caustics_glossy.xml) no store is ever
                # possible and the reference's `while (true)` build loop
                # SPINS FOREVER. Degrade to an empty map (gathers return
                # exactly zero) instead of hanging or erroring.
                print(
                    "\nWARNING: caustics map cannot fill (no zero-diffuse "
                    "first-hit surface; the reference would hang here) — "
                    "using an empty caustics map."
                )
                break
            raise RuntimeError(
                f"photon map cannot fill: 8 consecutive emission batches "
                f"({8 * batch} paths) stored no photons "
                f"({'caustics' if caustics else 'global'} map, "
                f"{total}/{size} stored)"
            )
        # Scale the next batch to the remaining need (store rate so far),
        # but keep the dispatch shape a power of two to bound recompiles.
        if total and total < size:
            rate = total / (b * batch * mask.shape[1])
            need_paths = (size - total) / max(rate * mask.shape[1], 1e-9)
            while batch < need_paths and batch < (1 << 20):
                batch *= 2
    pos = np.concatenate(pos_all)[:size] if pos_all else np.zeros((0, 3), np.float32)
    pdir = np.concatenate(dir_all)[:size]
    ppow = np.concatenate(pow_all)[:size]
    n = pos.shape[0]
    scale = 1.0 / max(emitted_with_store, 1)
    ppow = ppow * scale
    # Pad to the requested size so shapes are static across scenes.
    pad = size - n
    return PhotonMapData(
        pos=jnp.asarray(np.pad(pos, ((0, pad), (0, 0)))),
        power=jnp.asarray(np.pad(ppow, ((0, pad), (0, 0)))),
        max_power=jnp.asarray(np.pad(ppow.max(axis=1), (0, pad))),
        direction=jnp.asarray(np.pad(pdir, ((0, pad), (0, 0)))),
        radius=jnp.asarray(np.float32(radius)),
        valid=jnp.asarray(np.pad(np.ones(n, bool), (0, pad))),
    )


def build_photon_maps(scene: SceneArrays, meta: SceneMeta, param):
    """Build (global, caustics) photon maps per RendererParam.

    Reference flow: renderer.cpp:119-290 (build, scale, kd-balance, dump).
    The kd-balance step has no equivalent here — the gather is a dense sweep.
    """
    import time

    t0 = time.time()
    gmap = _build_one_map(
        scene, meta, param, param.photon_map_size, param.photon_map_bounce,
        param.photon_map_radius, caustics=False, seed=param.seed + 31337,
    )
    print(f"\nPhoton Map Takes {time.time() - t0:f} s to Build")
    t0 = time.time()
    cmap = _build_one_map(
        scene, meta, param, param.caustics_map_size, param.caustics_map_bounce,
        param.caustics_map_radius, caustics=True, seed=param.seed + 77777,
    )
    print(f"\nCaustics Map Takes {time.time() - t0:f} s to Build")
    return gmap, cmap


def save_photon_map(pmap: PhotonMapData, filename: str):
    """Dump photons in the reference's raw binary layout (28-byte records:
    float3 position, float power, u8 rgb color, u8 plane, 2x i16 direction —
    cyPhotonMap.h:50-70) so PhotonMapViz-compatible tools can read it."""
    import struct

    pos = np.asarray(pmap.pos)
    power = np.asarray(pmap.power)
    direction = np.asarray(pmap.direction)
    valid = np.asarray(pmap.valid)
    with open(filename, "wb") as f:
        for i in range(pos.shape[0]):
            if not valid[i]:
                continue
            maxp = float(power[i].max())
            if maxp > 0:
                rgb = np.clip(power[i] / maxp * 255.0, 0, 255).astype(np.uint8)
            else:
                rgb = np.zeros(3, np.uint8)
            d = direction[i]
            theta_x = int(np.clip(d[0], -1, 1) * 32767)
            theta_y = int(np.clip(d[1], -1, 1) * 32767)
            plane_dirz = 0x8 if d[2] >= 0 else 0
            f.write(
                struct.pack(
                    "<fff f BBBB hh xx",
                    pos[i, 0], pos[i, 1], pos[i, 2],
                    maxp, rgb[0], rgb[1], rgb[2], plane_dirz,
                    theta_x, theta_y,
                )
            )
