"""Wavefront integrator engine.

The reference shades each pixel with recursive virtual `Material::Shade`
calls (e.g. MtlBlinn_PhotonMap.cpp:256-500). On TPU we re-express the same
estimators as a *wavefront*: a megabatch of B rays advances through bounce
iterations in lock-step; recursion becomes an unrolled loop carrying
path throughput `beta`, with masked lanes for dead paths. The radiance
decomposition is exact:

    L = sum_k beta_k * (emission_k + direct_k [+ gather_k]),
    beta_0 = 1, beta_{k+1} = beta_k * BxDF_k / PDF_k           (single path)

which matches the reference's `color += incoming * BxDF / PDF` recursion in
expectation, bounce-for-bounce.

Two single-path shading models are provided:
- "photonmap": MtlBlinn_PhotonMap::Shade semantics (the reference's default
  `MtlBlinn` alias, materials/materials.h:57) including its quirks: luma-
  weighted 4-way lobe select with kill=0.1 whose selection probability is
  NOT divided out (biased, as in the reference Shade), one-bounce diffuse GI
  gating via hasDiffuseHit, absorption applied to back-face continuations.
- "pathtrace": MtlBlinn_PathTracing::Shade semantics: colorMax-weighted
  4-lobe RR *with* probability division, double 1/numLights direct quirk,
  cosine-lobe glossy sampling, no absorption (dead code in the reference).

Bounce 0 misses shade from the screen-space background; deeper misses from
the environment map (renderer.cpp:335-339 vs Shade's SampleEnvironment).
"""

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from qaray_tpu.core import rng as RNG
from qaray_tpu.core.constants import (
    BIGFLOAT,
    COLOR_LUMA_THRESHOLD,
    PHOTON_KILL,
)
from qaray_tpu.core.halton import halton
from qaray_tpu.core.vecmath import dot, luma, normalize, pow_safe, to_local_frame
from qaray_tpu.core.warps import concentric_disc, cos_weighted_hemisphere
from qaray_tpu.integrators import common as C
from qaray_tpu.ops.texture import sample_background, sample_environment
from qaray_tpu.ops.trace import trace_closest
from qaray_tpu.scene.arrays import SceneArrays, SceneMeta


class IntegratorConfig(NamedTuple):
    """Static (hashable) integrator configuration.

    The reference selects the shading model at compile time
    (materials/materials.h:57-61); here it is a runtime config.
    """

    integrator: str = "photonmap"
    max_bounce: int = 5  # Material::maxBounce (CLI -bounce)
    shadow_spp: int = 16  # GenLight::shadow_spp_min
    shadow_spp_max: int = 64  # GenLight::shadow_spp_max (adaptive escalation)
    inverse_square_falloff: bool = True  # disabled by Basic/Phong ctors
    use_photon_map: bool = False
    glossy_attempts: int = 4
    mc_samples: int = 10  # MtlBlinn_MonteCarloGI maxMCSample


# ---------------------------------------------------------------------------
# Camera ray generation (reference renderer.cpp:302-327)
# ---------------------------------------------------------------------------


def generate_camera_rays(scene: SceneArrays, meta: SceneMeta, cfg, px, py,
                         sample_ids, keys):
    """px, py: [B] pixel integer coords; sample_ids: [B] sample indices.

    Sub-pixel jitter is Halton(s, 11), Halton(s, 13) — identical for every
    pixel at a given sample index, as in SuperSamplerHalton::NewPixelSample
    (scene/scene.cpp:99-102).
    """
    cam = scene.camera
    jx = halton(sample_ids, 11)
    jy = halton(sample_ids, 13)
    tx = px.astype(jnp.float32) + jx
    ty = py.astype(jnp.float32) + jy
    cpt = cam.screen_a[None, :] + tx[:, None] * cam.screen_u[None, :] \
        + ty[:, None] * cam.screen_v[None, :]
    campos = jnp.broadcast_to(cam.pos, cpt.shape)
    if meta.has_dof:
        u = RNG.uniform(RNG.fold(keys, RNG.P_DOF), (2,))
        lens = concentric_disc(u, cam.dof)
        campos = campos + lens[:, 0:1] * cam.screen_x[None, :] \
            + lens[:, 1:2] * cam.screen_y[None, :]
    d = normalize(cpt - campos)
    # Differential rays: +dx/+dy pixel-offset screen points (DiffRay ctor at
    # renderer.cpp:314-326; offsets DIFF_DX/DIFF_DY from core/ray.cpp:31-34).
    from qaray_tpu.core.constants import DIFF_DX, DIFF_DY

    xpt = cpt + DIFF_DX * cam.screen_u[None, :]
    ypt = cpt + DIFF_DY * cam.screen_v[None, :]
    diff = (campos, normalize(xpt - campos), campos, normalize(ypt - campos))
    return campos, d, tx, ty, diff


# ---------------------------------------------------------------------------
# Lobe sampling helpers
# ---------------------------------------------------------------------------


def _color_max(c):
    return jnp.max(c, axis=-1)


def _photonmap_vertex(scene, meta, cfg, hits, mtl, v, keys, has_diffuse_hit,
                      bounce_remaining, photon_maps=None):
    """One vertex of MtlBlinn_PhotonMap::Shade. Returns vertex outputs."""
    n = hits["n"]
    p = hits["p"]
    front = hits["front"]

    fr = C.compute_fresnel(n, v, front, mtl.ior)
    t_k = mtl.refraction
    r_k = mtl.reflection
    tot = fr.total_reflection[:, None]
    sample_transmission = jnp.where(tot, 0.0, t_k * fr.t_ratio[:, None])
    sample_reflection = jnp.where(tot, r_k + t_k, r_k + t_k * fr.r_ratio[:, None])

    luma_t = luma(sample_transmission)
    luma_r = luma(sample_reflection)
    luma_d = luma(mtl.diffuse)

    # RandomSelectMtl (MtlBlinn_PhotonMap.cpp:107-150).
    r = RNG.uniform(RNG.fold(keys, RNG.P_LOBE_SELECT))
    coef_t = luma_t
    coef_r = coef_t + luma_r
    coef_d = coef_r + luma_d
    coef_sum = coef_d + PHOTON_KILL
    select = r * coef_sum
    sel_transmit = (select < coef_t) & (luma_t > COLOR_LUMA_THRESHOLD)
    sel_reflect = (~sel_transmit) & (select < coef_r) & (luma_r > COLOR_LUMA_THRESHOLD)
    sel_diffuse = (
        (~sel_transmit) & (~sel_reflect) & (select < coef_d)
        & (luma_d > COLOR_LUMA_THRESHOLD)
    )

    # Direct lighting: always, ambient skipped, 1/L normalization.
    direct = C.blinn_direct(
        scene, meta, cfg, p, n, v, mtl.diffuse, mtl.specular, mtl.glossiness,
        keys, skip_ambient=True, norm_power=1,
    )

    vertex_color = mtl.emission + direct

    # Photon / caustics gathering (photon-map mode).
    # Photon-map mode (MtlBlinn_PhotonMap.cpp:344-368, 420-458): at vertices
    # that selected the diffuse lobe, later-than-first diffuse vertices
    # gather the global map instead of bouncing; the caustics map is always
    # gathered. Both gates carry the luma(sampleDiffuse) > threshold guard.
    diffuse_ok = luma_d > COLOR_LUMA_THRESHOLD
    if cfg.use_photon_map and photon_maps is not None:
        from qaray_tpu.photon.gather import gather_blinn

        gmap, cmap = photon_maps
        do_photon = sel_diffuse & has_diffuse_hit & diffuse_ok
        do_caustics = sel_diffuse & diffuse_ok
        gi = gather_blinn(gmap, p, n, v, mtl.diffuse, mtl.specular, mtl.glossiness)
        ci = gather_blinn(cmap, p, n, v, mtl.diffuse, mtl.specular, mtl.glossiness)
        vertex_color = vertex_color + jnp.where(do_photon[:, None], gi, 0.0)
        vertex_color = vertex_color + jnp.where(do_caustics[:, None], ci, 0.0)
        # Diffuse MC bounce happens only at first-diffuse vertices.
        do_diffuse_mc = sel_diffuse & (~has_diffuse_hit)
    else:
        do_diffuse_mc = sel_diffuse & (~has_diffuse_hit)

    # ---- continuation sampling ----
    ks = RNG.fold(keys, RNG.P_LOBE_SAMPLE)

    if meta.has_glossy:
        # Reflection: glossy jitter or mirror (SampleReflectionBxDF).
        refl_glossy = mtl.reflection_glossiness > 0.0
        refl_dir_g = C.glossy_jitter_dir(
            fr.r_dir, fr.y_axis, mtl.reflection_glossiness,
            RNG.fold(ks, 11), want_up=True, attempts=cfg.glossy_attempts,
        )
        refl_dir = jnp.where(refl_glossy[:, None], refl_dir_g, fr.r_dir)

        # Transmission: glossy jitter or refract (SampleTransmitBxDF).
        refr_glossy = mtl.refraction_glossiness > 0.0
        trans_dir_g = C.glossy_jitter_dir(
            fr.t_dir, fr.y_axis, mtl.refraction_glossiness,
            RNG.fold(ks, 12), want_up=False, attempts=cfg.glossy_attempts,
        )
        trans_dir = jnp.where(refr_glossy[:, None], trans_dir_g, fr.t_dir)
    else:
        # No glossy materials in the scene (static): mirror/refract exactly.
        refl_dir = fr.r_dir
        trans_dir = fr.t_dir

    # Diffuse: cosine hemisphere around N (SampleDiffuseBxDF, photonMap=False).
    u = RNG.uniform(RNG.fold(ks, 13), (2,))
    diff_dir = to_local_frame(n, cos_weighted_hemisphere(u))
    h = normalize(v + normalize(diff_dir, eps=1e-30), eps=1e-30)
    cos_nh = jnp.maximum(0.0, dot(n, h))
    diff_bxdf = mtl.diffuse + mtl.specular * pow_safe(cos_nh, mtl.glossiness)[:, None]

    can_bounce = bounce_remaining > 0
    go_reflect = sel_reflect & (luma_r > COLOR_LUMA_THRESHOLD) & can_bounce
    go_transmit = sel_transmit & (luma_t > COLOR_LUMA_THRESHOLD) & can_bounce
    go_diffuse = (
        do_diffuse_mc & (luma_d > COLOR_LUMA_THRESHOLD) & front & can_bounce
    )

    new_dir = jnp.where(
        go_transmit[:, None],
        trans_dir,
        jnp.where(go_diffuse[:, None], diff_dir, refl_dir),
    )
    weight = jnp.where(
        go_transmit[:, None],
        sample_transmission,
        jnp.where(go_diffuse[:, None], diff_bxdf, sample_reflection),
    )
    alive = go_reflect | go_transmit | go_diffuse
    # Reflect/transmit continuations reset hasDiffuseHit (ComputeSecondaryRay
    # default arg, MtlBlinn_PhotonMap.h:139); diffuse sets it.
    new_has_diffuse = go_diffuse
    pending_absorption = mtl.absorption
    return vertex_color, new_dir, weight, alive, new_has_diffuse, pending_absorption


def _pathtrace_vertex(scene, meta, cfg, hits, mtl, v, keys, has_diffuse_hit,
                      bounce_remaining, photon_maps=None):
    """One vertex of MtlBlinn_PathTracing::Shade (MtlBlinn_PathTracing.cpp:69-300)."""
    n = normalize(hits["n"], eps=1e-30)
    p = hits["p"]
    front = hits["front"]

    fr = C.compute_fresnel(n, v, front, mtl.ior)
    t_k = mtl.refraction
    r_k = mtl.reflection
    tot = fr.total_reflection[:, None]
    sample_refraction = jnp.where(tot, 0.0, t_k * fr.t_ratio[:, None])
    sample_reflection = jnp.where(tot, r_k + t_k, r_k + t_k * fr.r_ratio[:, None])

    coef_refraction = _color_max(sample_refraction)
    coef_reflection = _color_max(sample_reflection)
    coef_specular = _color_max(mtl.specular)
    coef_diffuse = _color_max(mtl.diffuse)
    coef_sum = coef_refraction + coef_reflection + coef_specular + coef_diffuse
    coef_sum = jnp.maximum(coef_sum, 1e-20)
    c_refr = coef_refraction / coef_sum
    c_refl = coef_reflection / coef_sum
    c_spec = coef_specular / coef_sum
    c_diff = coef_diffuse / coef_sum
    sum_refr = c_refr
    sum_refl = sum_refr + c_refl
    sum_spec = sum_refl + c_spec

    select = RNG.uniform(RNG.fold(keys, RNG.P_LOBE_SELECT))
    sel_refr = (select <= sum_refr) & (c_refr > 1e-6)
    sel_refl = (~sel_refr) & (select < sum_refl) & (c_refl > 1e-6)
    sel_spec = (~sel_refr) & (~sel_refl) & (select < sum_spec) & (c_spec > 1e-6)
    sel_diff = (~sel_refr) & (~sel_refl) & (~sel_spec) & (c_diff > 1e-6)

    # Direct: double-normalized quirk (normCoefDI applied twice).
    direct = C.blinn_direct(
        scene, meta, cfg, p, n, v, mtl.diffuse, mtl.specular, mtl.glossiness,
        keys, skip_ambient=True, norm_power=2,
    )
    vertex_color = mtl.emission + direct

    # Hemisphere frame around nZ = Y (faceforwarded normal), built with the
    # reference's branch (MtlBlinn_PathTracing.cpp:182-186).
    nz = fr.y_axis
    u = RNG.uniform(RNG.fold(keys, RNG.P_LOBE_SAMPLE), (2,))
    hemi = normalize(cos_weighted_hemisphere(u), eps=1e-30)
    hemi_world = to_local_frame(nz, hemi)

    refr_glossy = mtl.refraction_glossiness > 0.0
    refl_glossy = mtl.reflection_glossiness > 0.0

    # Refraction lobe.
    refr_dir = jnp.where(refr_glossy[:, None], -hemi_world, fr.t_dir)
    cos_vh_t = jnp.maximum(0.0, dot(v, fr.t_dir))
    refr_bxdf = jnp.where(
        refr_glossy[:, None],
        sample_refraction
        * pow_safe(cos_vh_t, mtl.refraction_glossiness)[:, None],
        sample_refraction,
    )

    # Reflection lobe.
    refl_dir = jnp.where(refl_glossy[:, None], hemi_world, fr.r_dir)
    cos_vh_r = jnp.maximum(0.0, dot(v, fr.r_dir))
    refl_bxdf = jnp.where(
        refl_glossy[:, None],
        sample_reflection
        * pow_safe(cos_vh_r, mtl.reflection_glossiness)[:, None],
        sample_reflection,
    )

    # Specular lobe (front hits only; glossiness > 0 always true in practice).
    spec_dir = hemi_world
    h = normalize(v + normalize(spec_dir, eps=1e-30), eps=1e-30)
    cos_nh = jnp.maximum(0.0, dot(n, h))
    spec_bxdf = mtl.specular * pow_safe(cos_nh, mtl.glossiness)[:, None]

    # Diffuse lobe (front hits only).
    diff_dir = hemi_world
    diff_bxdf = mtl.diffuse

    can_bounce = bounce_remaining > 0
    go_refr = sel_refr & can_bounce
    go_refl = sel_refl & can_bounce
    go_spec = sel_spec & front & can_bounce
    go_diff = sel_diff & front & can_bounce

    new_dir = jnp.where(
        go_refr[:, None],
        refr_dir,
        jnp.where(
            go_refl[:, None],
            refl_dir,
            jnp.where(go_spec[:, None], spec_dir, diff_dir),
        ),
    )
    pdf = jnp.where(
        go_refr,
        c_refr,
        jnp.where(go_refl, c_refl, jnp.where(go_spec, c_spec, c_diff)),
    )
    bxdf = jnp.where(
        go_refr[:, None],
        refr_bxdf,
        jnp.where(
            go_refl[:, None],
            refl_bxdf,
            jnp.where(go_spec[:, None], spec_bxdf, diff_bxdf),
        ),
    )
    weight = bxdf / jax.lax.stop_gradient(jnp.maximum(pdf, 1e-20))[:, None]
    alive = go_refr | go_refl | go_spec | go_diff
    # PathTracing applies no absorption on continuations (reference dead code:
    # `incoming` is overwritten after the attenuation multiply,
    # MtlBlinn_PathTracing.cpp:284-291).
    pending_absorption = jnp.zeros_like(mtl.absorption)
    return vertex_color, new_dir, weight, alive, has_diffuse_hit, pending_absorption


def _basic_family_vertex(scene, meta, cfg, hits, mtl, v, keys, has_diffuse_hit,
                         bounce_remaining, photon_maps=None, phong=False,
                         mcgi=False, direct_lighting=True):
    """Whitted-family vertex: MtlBlinn_Basic / MtlPhong_Basic /
    MtlBlinn_MonteCarloGI (materials/MtlBlinn_Basic.cpp:30-185,
    MtlPhong_Basic.cpp, MtlBlinn_MonteCarloGI.cpp).

    The reference recurses into BOTH refraction and reflection children
    (branching factor 2; MC-GI adds N diffuse GI samples). A branching tree
    does not fit a fixed-width wavefront, so this re-expression picks ONE
    child per vertex by russian roulette proportional to child luma and
    reweights by the selection probability — identical in expectation, with
    the variance absorbed by spp (documented deviation; golden parity uses
    the reference's own default photonmap model which is already one-path).
    """
    from qaray_tpu.core.constants import (
        REFLECTION_COLOR_THRESHOLD,
        REFRACTION_COLOR_THRESHOLD,
    )

    n = normalize(hits["n"], eps=1e-30)
    p = hits["p"]
    front = hits["front"]

    # Frame (MtlBlinn_Basic.cpp:49-50): X = norm((N x V) x N), Y = norm(N(N.V)).
    from qaray_tpu.core.vecmath import cross, vdot

    x_axis = normalize(cross(cross(n, v), n), eps=1e-30)
    ndotv = dot(n, v)
    y_axis = n * jnp.sign(ndotv)[:, None]

    # Glossy normal jitter with the reference's quirk ball
    # (MtlBlinn_Basic.cpp:58-66; radius is the raw glossiness value).
    from qaray_tpu.core.warps import uniform_ball_ref

    if meta.has_glossy:
        refr_glossy = mtl.refraction_glossiness > 0.001
        refl_glossy = mtl.reflection_glossiness > 0.001
        kb = RNG.fold(keys, RNG.P_GLOSSY)
        u_t = RNG.uniform(RNG.fold(kb, 0), (4, 2))
        u_r = RNG.uniform(RNG.fold(kb, 1), (4, 2))
        tj = normalize(
            n + uniform_ball_ref(u_t, mtl.refraction_glossiness), eps=1e-30
        )
        rj = normalize(
            n + uniform_ball_ref(u_r, mtl.reflection_glossiness), eps=1e-30
        )
        tjn = jnp.where(refr_glossy[:, None], tj, n)
        rjn = jnp.where(refl_glossy[:, None], rj, n)
    else:
        tjn = n
        rjn = n

    n_ior = jnp.where(front, 1.0 / mtl.ior, mtl.ior)
    cos_i = dot(tjn, v)
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    sin_o = jnp.clip(sin_i * n_ior, 0.0, 1.0)
    cos_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_o * sin_o))
    t_dir = -x_axis * sin_o[:, None] - y_axis * cos_o[:, None]
    r_dir = 2.0 * rjn * vdot(rjn, v) - v

    c0 = (n_ior - 1.0) ** 2 / (n_ior + 1.0) ** 2
    r_c = c0 + (1.0 - c0) * jnp.power(1.0 - jnp.abs(cos_i), 5.0)
    t_c = 1.0 - r_c
    tot = ((n_ior * sin_i) > 1.001)[:, None]
    t_k = jnp.where(tot, 0.0, mtl.refraction * t_c[:, None])
    r_k = jnp.where(
        tot, mtl.reflection + mtl.refraction,
        mtl.reflection + mtl.refraction * r_c[:, None],
    )

    # Direct lighting: front hits only, no normalization. Ambient is
    # included for Basic/Phong but SKIPPED by MC-GI (its ambient line is
    # commented out, MtlBlinn_MonteCarloGI.cpp:187-188 — the hemisphere
    # integral replaces it), and MC-GI's specular term carries no cosNL
    # (:190-196). direct_lighting=False skips it entirely — used by the
    # MC-GI N-sample expansion, whose extra replicas only need continuation
    # draws (the reference evaluates direct once per vertex).
    zero = jnp.zeros_like(p)
    if not direct_lighting:
        vertex_color = zero
    elif phong:
        direct = _phong_direct(scene, meta, cfg, p, n, v, mtl, keys)
        vertex_color = jnp.where(front[:, None], direct, zero)
    else:
        direct = C.blinn_direct(
            scene, meta, cfg, p, n, v, mtl.diffuse, mtl.specular,
            mtl.glossiness, keys, skip_ambient=mcgi, norm_power=0,
            spec_cos_nl=not mcgi,
        )
        vertex_color = jnp.where(front[:, None], direct, zero)
        if mcgi:
            # MC-GI seeds color with emission unconditionally (before the
            # hasFrontHit gate, MtlBlinn_MonteCarloGI.cpp:113-115); Basic
            # and Phong start from black (MtlBlinn_Basic.cpp:37).
            vertex_color = vertex_color + mtl.emission

    # Children.
    can_bounce = bounce_remaining > 0
    spawn_t = (jnp.max(t_k, axis=-1) > REFRACTION_COLOR_THRESHOLD) & can_bounce
    spawn_r = (jnp.max(r_k, axis=-1) > REFLECTION_COLOR_THRESHOLD) & can_bounce

    if mcgi:
        u = RNG.uniform(RNG.fold(keys, RNG.P_LOBE_SAMPLE), (2,))
        d_dir = to_local_frame(n, normalize(cos_weighted_hemisphere(u), eps=1e-30))
        h = normalize(v + d_dir, eps=1e-30)
        cos_nh = jnp.maximum(0.0, dot(n, h))
        cos_nl = jnp.maximum(0.0, dot(n, d_dir))
        # MtlBlinn_MonteCarloGI.cpp:255-260 estimator weight.
        d_k = (
            mtl.specular * (cos_nl * pow_safe(cos_nh, mtl.glossiness))[:, None]
            + mtl.diffuse
        )
        # The reference's GI loop runs for every front hit with bounces left
        # (no diffuse gate — the estimator weight includes a specular lobe
        # term, MtlBlinn_MonteCarloGI.cpp:258-260).
        spawn_d = front & can_bounce & (
            (luma(mtl.diffuse) > 1e-6) | (luma(mtl.specular) > 1e-6)
        )
    else:
        d_dir = r_dir
        d_k = jnp.zeros_like(p)
        spawn_d = jnp.zeros_like(front)

    # RR among active children, proportional to child luma.
    w_t = jnp.where(spawn_t, jnp.maximum(luma(t_k), 1e-6), 0.0)
    w_r = jnp.where(spawn_r, jnp.maximum(luma(r_k), 1e-6), 0.0)
    w_d = jnp.where(spawn_d, jnp.maximum(luma(d_k), 1e-6), 0.0)
    w_sum = w_t + w_r + w_d
    any_child = w_sum > 0.0
    r = RNG.uniform(RNG.fold(keys, RNG.P_LOBE_SELECT)) * jnp.maximum(w_sum, 1e-30)
    pick_t = any_child & (r < w_t)
    pick_r = any_child & (~pick_t) & (r < w_t + w_r)
    pick_d = any_child & (~pick_t) & (~pick_r)
    prob = jnp.where(
        pick_t, w_t, jnp.where(pick_r, w_r, w_d)
    ) / jnp.maximum(w_sum, 1e-30)

    new_dir = jnp.where(
        pick_t[:, None], t_dir, jnp.where(pick_r[:, None], r_dir, d_dir)
    )
    weight = jnp.where(
        pick_t[:, None], t_k, jnp.where(pick_r[:, None], r_k, d_k)
    ) / jax.lax.stop_gradient(jnp.maximum(prob, 1e-30))[:, None]
    alive = any_child
    pending_absorption = mtl.absorption
    return vertex_color, new_dir, weight, alive, has_diffuse_hit, pending_absorption


def _phong_direct(scene, meta, cfg, p, n, v, mtl, keys):
    """Phong direct lighting (MtlPhong_Basic.cpp:169-183): specular uses
    (V.R)^gloss with R the reflected light direction, no cosNL on the
    specular term, ambient contributes diffuse * I."""
    from qaray_tpu.scene.arrays import LIGHT_AMBIENT

    total = jnp.zeros_like(p)
    for li in range(meta.num_lights):
        if meta.light_kinds[li] == LIGHT_AMBIENT:
            intensity = C.illuminate(scene, meta, cfg, li, p, keys)
            total = total + mtl.diffuse * intensity
            continue
        intensity = C.illuminate(scene, meta, cfg, li, p, keys)
        l_dir = normalize(-C.light_direction(scene, meta, li, p), eps=1e-30)
        r_vec = 2.0 * dot(l_dir, n)[:, None] * n - l_dir
        cos_nl = jnp.maximum(0.0, dot(n, l_dir))
        cos_vr = jnp.maximum(0.0, dot(v, r_vec))
        total = total + mtl.diffuse * intensity * cos_nl[:, None]
        total = total + mtl.specular * intensity * pow_safe(
            cos_vr, mtl.glossiness
        )[:, None]
    return total


def _basic_vertex(*args, **kw):
    return _basic_family_vertex(*args, **kw, phong=False, mcgi=False)


def _phong_vertex(*args, **kw):
    return _basic_family_vertex(*args, **kw, phong=True, mcgi=False)


def _mcgi_vertex(*args, **kw):
    return _basic_family_vertex(*args, **kw, phong=False, mcgi=True)


_VERTEX_FNS = {
    "photonmap": _photonmap_vertex,
    "pathtrace": _pathtrace_vertex,
    "basic": _basic_vertex,
    "whitted": _basic_vertex,
    "phong": _phong_vertex,
    "mcgi": _mcgi_vertex,
}


# ---------------------------------------------------------------------------
# The wavefront loop
# ---------------------------------------------------------------------------


def integrate(scene: SceneArrays, meta: SceneMeta, cfg: IntegratorConfig,
              p, d, ray_keys, screen_uv=None, photon_maps=None, diff=None):
    """Trace B primary rays to full radiance. Returns (radiance [B,3], t0 [B])."""
    vertex_fn = _VERTEX_FNS[cfg.integrator]
    num = p.shape[0]

    radiance = jnp.zeros((num, 3), jnp.float32)
    beta = jnp.ones((num, 3), jnp.float32)
    alive = jnp.ones((num,), bool)
    has_diffuse_hit = jnp.zeros((num,), bool)
    pending_absorption = jnp.zeros((num, 3), jnp.float32)
    t0 = jnp.full((num,), BIGFLOAT, jnp.float32)
    irrad0 = jnp.zeros((num,), bool)
    # MC-GI first-vertex sample count (maxMCSample): >1 widens the wavefront
    # after the primary hit.
    mc_n = cfg.mc_samples if cfg.integrator == "mcgi" else 1
    expanded = False

    # Texture footprints only feed texture filtering — skip the differential
    # hit machinery entirely for untextured scenes (static).
    if not meta.has_mtl_textures:
        diff = None

    for bounce in range(cfg.max_bounce + 1):
        hits = trace_closest(scene, meta, p, d, diff=diff if bounce == 0 else None)
        hit = hits["hit"] & alive
        miss = (~hits["hit"]) & alive

        if bounce == 0:
            t0 = jnp.where(hits["hit"], hits["t"], BIGFLOAT)
            if screen_uv is not None and meta.has_bg_texture:
                bg = sample_background(scene.textures, scene.background, screen_uv)
            else:
                bg = jnp.broadcast_to(scene.background.color, (num, 3))
            radiance = radiance + jnp.where(miss[:, None], beta * bg, 0.0)
        else:
            if meta.has_env_texture:
                env = sample_environment(scene.textures, scene.environment, d)
            else:
                env = jnp.broadcast_to(scene.environment.color, (d.shape[0], 3))
            radiance = radiance + jnp.where(miss[:, None], beta * env, 0.0)

        alive = hit
        # Back-face continuation absorption (ComputeSecondaryRay,
        # MtlBlinn_PhotonMap.cpp:246-249): Beer attenuation with the parent
        # vertex's absorption over the traveled distance.
        att = jnp.exp(-pending_absorption * hits["t"][:, None])
        beta = jnp.where((hit & ~hits["front"])[:, None], beta * att, beta)

        mtl = C.gather_materials(
            scene, hits["mtl"], hits["uvw"], hits["has_texture"],
            duvw=(hits["duvw0"], hits["duvw1"]) if "duvw0" in hits else None,
            textured=meta.has_mtl_textures,
        )
        if bounce == 0 and cfg.integrator == "photonmap" and cfg.use_photon_map:
            # Irradiance-computation debug plane: the primary vertex is a
            # photon-gather (diffuse) surface — IsPhotonSurface semantics
            # (MtlBlinn_PhotonMap.h:74-77, diffuse luma > 0).
            irrad0 = hit & (luma(mtl.diffuse) > 0.0)
        v = -d  # unit: d is normalized
        keys = RNG.fold(ray_keys, 1000 + bounce)
        lanes = p.shape[0]
        bounce_remaining = jnp.full((lanes,), cfg.max_bounce - bounce, jnp.int32)

        if bounce == 0 and mc_n > 1:
            # MC-GI first-vertex expansion (MtlBlinn_MonteCarloGI.cpp:21-22,
            # 176-178: maxMCSample=10 indirect samples at the first bounce,
            # then 1). Direct lighting is evaluated ONCE; the wavefront then
            # widens to mc_n replicas per lane, each drawing an independent
            # continuation, each weighted 1/mc_n. (The reference recurses
            # once into reflection/refraction and N times into GI; the
            # replicas RR over all three lobes, which averages refl/refr
            # N-fold too — identical in expectation, strictly lower
            # variance.)
            dirs, wts, conts, hdhs = [], [], [], []
            for rep in range(mc_n):
                krep = keys if rep == 0 else RNG.fold(keys, 50000 + rep)
                vc, nd, wt, ct, nh, pa = vertex_fn(
                    scene, meta, cfg, hits, mtl, v, krep, has_diffuse_hit,
                    bounce_remaining, photon_maps,
                    direct_lighting=(rep == 0),
                )
                if rep == 0:
                    vertex_color = vc
                    pend_abs = pa
                dirs.append(nd)
                wts.append(wt)
                conts.append(ct)
                hdhs.append(nh)
            radiance = radiance + jnp.where(
                alive[:, None], beta * vertex_color, 0.0
            )
            if bounce == cfg.max_bounce:
                break

            def xrep(x):
                return jnp.concatenate([x] * mc_n, axis=0)

            alive = xrep(alive) & jnp.concatenate(conts, axis=0)
            beta = jnp.where(
                alive[:, None],
                xrep(beta) * jnp.concatenate(wts, axis=0) / mc_n,
                xrep(beta),
            )
            has_diffuse_hit = jnp.where(
                alive, jnp.concatenate(hdhs, axis=0), xrep(has_diffuse_hit)
            )
            pending_absorption = xrep(pend_abs)
            p = xrep(hits["p"])
            d = jax.lax.stop_gradient(
                normalize(jnp.concatenate(dirs, axis=0), eps=1e-30)
            )
            ray_keys = jnp.concatenate(
                [RNG.fold(ray_keys, 777000 + rep) for rep in range(mc_n)],
                axis=0,
            )
            # All later accumulation (env misses, vertex terms) lands in an
            # expanded-width accumulator, folded back at return.
            radiance0 = radiance
            radiance = jnp.zeros((mc_n * num, 3), jnp.float32)
            expanded = True
            continue

        vertex_color, new_dir, weight, cont, new_hdh, pend_abs = vertex_fn(
            scene, meta, cfg, hits, mtl, v, keys, has_diffuse_hit,
            bounce_remaining, photon_maps,
        )
        radiance = radiance + jnp.where(alive[:, None], beta * vertex_color, 0.0)

        if bounce == cfg.max_bounce:
            break
        alive = alive & cont
        beta = jnp.where(alive[:, None], beta * weight, beta)
        has_diffuse_hit = jnp.where(alive, new_hdh, has_diffuse_hit)
        pending_absorption = pend_abs
        p = hits["p"]
        # Detached sampling: continuation directions carry no parameter
        # gradient (reparameterized/detached estimator — the correct gradient
        # of the discrete-lobe expectation keeps BxDF sensitivities and drops
        # direction/PDF sensitivities; see diff.py).
        d = jax.lax.stop_gradient(normalize(new_dir, eps=1e-30))

    if expanded:
        radiance = radiance0 + radiance.reshape(mc_n, num, 3).sum(axis=0)
    return radiance, t0, irrad0


def render_batch_xla_impl(scene: SceneArrays, meta: SceneMeta,
                          cfg: IntegratorConfig, px, py, sample_ids,
                          base_key, photon_maps=None,
                          want_aux: bool = False):
    """Unjitted XLA wavefront path (mega_render's bwd differentiates this
    directly — jax.vjp through a nested pjit inside a custom_vjp bwd rule
    fails to linearize on TPU)."""
    ray_ids = py * meta.img_width + px
    keys = RNG.ray_keys(base_key, ray_ids * 65536 + sample_ids)
    campos, d, tx, ty, diff = generate_camera_rays(
        scene, meta, cfg, px, py, sample_ids, keys
    )
    screen_uv = jnp.stack(
        [tx / meta.img_width, ty / meta.img_height, jnp.zeros_like(tx)], axis=-1
    )
    radiance, t0, irrad0 = integrate(
        scene, meta, cfg, campos, d, keys, screen_uv, photon_maps, diff
    )
    if want_aux:
        return radiance, t0, irrad0
    return radiance, t0


render_batch_xla = partial(jax.jit, static_argnames=("meta", "cfg", "want_aux"))(
    render_batch_xla_impl
)


# Combined photon-table row budget (global + caustics) for in-kernel
# gathering: 32k rows = 2 MB of VMEM photon tables. Reference defaults are
# 10k + 1k; -photon-map-size runs far above this fall back to the exact XLA
# streamed gather.
MEGA_PHOTON_ROW_BUDGET = 32768


def _mega_photon_ok(cfg: IntegratorConfig, photon_maps) -> bool:
    """May the megakernel serve this photon-gathering config?"""
    if not cfg.use_photon_map:
        return True  # no gathering requested: maps are irrelevant
    if cfg.integrator != "photonmap" or photon_maps is None:
        return False
    gmap, cmap = photon_maps[0], photon_maps[1]
    if gmap.ctable is None or cmap.ctable is None:
        return False
    return gmap.ctable.shape[0] + cmap.ctable.shape[0] <= MEGA_PHOTON_ROW_BUDGET


def use_pathtrace_mega(meta: SceneMeta, cfg: IntegratorConfig,
                       photon_maps=None) -> bool:
    """Engagement gate for the fused Pallas pathtrace megakernel
    (ops/pallas_pathtrace.py): pathtrace/photonmap on analytic-only
    untextured scenes; photon-map gathering rides along when the clustered
    maps fit the VMEM table budget (escalation for cap-exceeded lanes is
    the renderer's job).

    Default on TPU; QARAY_MEGAKERNEL=1 forces it elsewhere (interpret mode,
    used by the CPU parity tests); QARAY_NO_MEGAKERNEL disables."""
    import os

    if os.environ.get("QARAY_NO_MEGAKERNEL"):
        return False
    if not jax.config.jax_threefry_partitionable:
        # core/krng.py reimplements the PARTITIONABLE threefry path; with
        # the flag off, the engine's jax.random draws change while the
        # kernel's do not, silently breaking the documented bit-parity
        # (and mega_render's backward would differentiate a different
        # estimator). Conservatively keep everything on the XLA engine.
        return False
    ok = (
        cfg.integrator in ("pathtrace", "photonmap")
        and (meta.num_mesh_instances == 0 or meta.mesh_mega)
        and (meta.num_analytic > 0 or meta.mesh_mega)
        and len(meta.analytic_kinds) == meta.num_analytic
        and len(meta.analytic_mtls) == meta.num_analytic
        and (not meta.has_mtl_textures or meta.mega_tex_ok)
        and not meta.has_bg_texture
        and not meta.has_env_texture
        and _mega_photon_ok(cfg, photon_maps)
    )
    if not ok:
        return False
    if os.environ.get("QARAY_MEGAKERNEL") == "1":
        return True
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnames=("meta", "cfg", "want_aux"))
def render_batch(scene: SceneArrays, meta: SceneMeta, cfg: IntegratorConfig,
                 px, py, sample_ids, base_key, photon_maps=None,
                 want_aux: bool = False):
    """Render one sample for each (px, py) pixel lane.

    Returns (radiance [B,3], depth [B]); with want_aux=True additionally the
    per-lane irradiance-computation flag (the fb debug plane). Deterministic
    in (base_key, pixel coords, sample_ids) — independent of batch split or
    device sharding.

    Pathtrace on analytic untextured scenes routes to the single-dispatch
    Pallas megakernel (bit-parity with the XLA path under threefry keys —
    tests/test_megakernel.py); everything else runs the wavefront engine.
    With photon gathering on the megakernel path, the returned tuple gains
    a final per-lane escalation flag: lanes whose gather saw more than
    GATHER_K in-radius photons need the exact XLA top-k estimate — the
    renderer re-renders exactly those lanes on the wavefront path (same
    threefry draws => same paths).
    """
    if use_pathtrace_mega(meta, cfg, photon_maps):
        from qaray_tpu.ops.pallas_pathtrace import mega_render

        kd = jax.random.key_data(base_key)
        impl = "rbg" if kd.shape[-1] == 4 else "threefry2x32"
        interpret = jax.default_backend() != "tpu"
        if cfg.use_photon_map:
            radiance, t0, irr0, esc = mega_render(
                scene, meta, cfg, impl, interpret, px, py, sample_ids, kd,
                photon_maps,
            )
            if want_aux:
                return radiance, t0, irr0, esc
            return radiance, t0, esc
        radiance, t0 = mega_render(
            scene, meta, cfg, impl, interpret, px, py, sample_ids, kd
        )
        if want_aux:
            # pathtrace never writes the irradiance debug plane.
            return radiance, t0, jnp.zeros(px.shape, bool)
        return radiance, t0
    return render_batch_xla(
        scene, meta, cfg, px, py, sample_ids, base_key, photon_maps,
        want_aux,
    )
