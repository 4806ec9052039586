"""Shared shading machinery: material gather, Fresnel, direct lighting.

The per-vertex math here is a data-driven re-expression of the reference's
material family (materials/MtlBlinn_*.cpp): virtual dispatch becomes table
gathers by material id; scalar branches become masked selects over the ray
megabatch.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from qaray_tpu.core.constants import BIGFLOAT, TOTAL_REFLECTION_THRESHOLD
from qaray_tpu.core import rng as RNG
from qaray_tpu.core.vecmath import cross, dot, normalize, pow_safe, vdot
from qaray_tpu.core.warps import uniform_ball_ref
from qaray_tpu.ops.texture import sample_textured_color
from qaray_tpu.ops.trace import trace_shadow
from qaray_tpu.scene.arrays import (
    LIGHT_AMBIENT,
    LIGHT_DIRECT,
    LIGHT_POINT,
    LIGHT_SPOT,
    NUM_SLOTS,
    SLOT_DIFFUSE,
    SLOT_EMISSION,
    SLOT_REFLECTION,
    SLOT_REFRACTION,
    SLOT_SPECULAR,
    SceneArrays,
)


class MtlSamples(NamedTuple):
    """Per-lane textured material samples at the hit point."""

    diffuse: jnp.ndarray  # [B,3]
    specular: jnp.ndarray
    emission: jnp.ndarray
    reflection: jnp.ndarray
    refraction: jnp.ndarray
    absorption: jnp.ndarray
    glossiness: jnp.ndarray  # [B]
    reflection_glossiness: jnp.ndarray
    refraction_glossiness: jnp.ndarray
    ior: jnp.ndarray


def gather_materials(scene: SceneArrays, mtl_id, uvw, has_texture,
                     duvw=None, textured: bool = True) -> MtlSamples:
    """Gather + texture-sample all material params for B lanes.

    duvw: optional (duvw0, duvw1) texture footprints; when given, textured
    slots use the reference's 32-sample elliptic footprint filter (primary
    hits; core/texture.cpp:32-52).
    textured: static flag (meta.has_mtl_textures) — False skips all texture
    sampling (exact for scenes whose material slots carry no live texture)."""
    mt = scene.materials
    mid = jnp.maximum(mtl_id, 0)

    from qaray_tpu.ops.texture import sample_textured_color_filtered

    def slot(colors, slot_idx):
        if not textured:
            return colors[mid]
        if duvw is not None:
            return sample_textured_color_filtered(
                scene.textures,
                colors[mid],
                mt.tex_id[mid, slot_idx],
                mt.tex_m[mid, slot_idx],
                mt.tex_t[mid, slot_idx],
                uvw,
                duvw[0],
                duvw[1],
                has_texture,
            )
        return sample_textured_color(
            scene.textures,
            colors[mid],
            mt.tex_id[mid, slot_idx],
            mt.tex_m[mid, slot_idx],
            mt.tex_t[mid, slot_idx],
            uvw,
            has_texture,
        )

    return MtlSamples(
        diffuse=slot(mt.diffuse, SLOT_DIFFUSE),
        specular=slot(mt.specular, SLOT_SPECULAR),
        emission=slot(mt.emission, SLOT_EMISSION),
        reflection=slot(mt.reflection, SLOT_REFLECTION),
        refraction=slot(mt.refraction, SLOT_REFRACTION),
        absorption=mt.absorption[mid],
        glossiness=mt.glossiness[mid],
        reflection_glossiness=mt.reflection_glossiness[mid],
        refraction_glossiness=mt.refraction_glossiness[mid],
        ior=mt.ior[mid],
    )


class Fresnel(NamedTuple):
    t_dir: jnp.ndarray  # [B,3] transmission direction
    r_dir: jnp.ndarray  # [B,3] mirror reflection direction
    t_ratio: jnp.ndarray  # [B] transmit coefficient (1 - rC)
    r_ratio: jnp.ndarray  # [B] Schlick reflect coefficient
    total_reflection: jnp.ndarray  # [B] bool
    y_axis: jnp.ndarray  # [B,3] N oriented toward the viewer


def compute_fresnel(n, v, front, ior) -> Fresnel:
    """Port of MtlBlinn_PhotonMap::ComputeFresnel (MtlBlinn_PhotonMap.cpp:65-105).

    n: shading normal, v: unit direction to viewer, front: front-hit flag,
    ior: per-lane index of refraction.
    """
    cos_nv = dot(n, v)
    y = jnp.where((cos_nv > 0.0)[..., None], n, -n)
    z = cross(v, y)
    x = normalize(cross(y, z), eps=1e-30)

    n_ior = jnp.where(front, 1.0 / ior, ior)
    cos_i = cos_nv
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    sin_o = jnp.clip(sin_i * n_ior, 0.0, 1.0)
    cos_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_o * sin_o))
    t_dir = -x * sin_o[..., None] - y * cos_o[..., None]
    r_dir = 2.0 * n * cos_nv[..., None] - v

    total = (n_ior * sin_i) > TOTAL_REFLECTION_THRESHOLD
    c0 = (n_ior - 1.0) ** 2 / (n_ior + 1.0) ** 2
    r_ratio = c0 + (1.0 - c0) * jnp.power(1.0 - jnp.abs(cos_i), 5.0)
    t_ratio = 1.0 - r_ratio
    return Fresnel(t_dir, r_dir, t_ratio, r_ratio, total, y)


def glossy_jitter_dir(center_dir, y_axis, gloss, keys, want_up, attempts=4,
                      ball_attempts=4):
    """Rejection-jitter around a direction with the reference's UniformBall quirk.

    Port of SampleTransmitBxDF / SampleReflectionBxDF glossy paths
    (MtlBlinn_PhotonMap.cpp:152-200): dir = normalize(normalize(center) +
    UniformBall(2 * gloss)), rejected while on the wrong side of `y_axis`
    (want_up False keeps dot(dir, Y) <= 0, True keeps >= 0). Both rejection
    loops (the ball draw and the hemisphere check) become fixed-attempt
    masked selects.
    """
    u = RNG.uniform(keys, (attempts, ball_attempts, 2))  # [B, Ao, Ai, 2]
    balls = uniform_ball_ref(u, 2.0 * gloss[:, None])  # [B, Ao, 3]
    c = normalize(center_dir, eps=1e-30)[:, None, :]
    cand = normalize(c + balls, eps=1e-30)  # [B, A, 3]
    side = jnp.sum(cand * y_axis[:, None, :], axis=-1)
    ok = jnp.where(want_up, side >= 0.0, side <= 0.0)
    num_a = cand.shape[1]
    first = jnp.min(
        jnp.where(ok, jnp.arange(num_a)[None, :], num_a), axis=-1
    )
    any_ok = first < num_a
    first = jnp.minimum(first, num_a - 1)
    pick = jnp.take_along_axis(cand, first[:, None, None], axis=1)[:, 0, :]
    # All attempts on the wrong side: fall back to the mirror/transmit center.
    return jnp.where(any_ok[:, None], pick, normalize(center_dir, eps=1e-30))


def light_direction(scene: SceneArrays, meta, light_idx: int, p):
    """Light::Direction(p): direction FROM light TO point (normalized)."""
    lt = scene.lights
    kind = meta.light_kinds[light_idx]
    if kind == LIGHT_DIRECT:
        return jnp.broadcast_to(lt.direction[light_idx], p.shape)
    # point / spot
    return normalize(p - lt.position[light_idx], eps=1e-30)


def spot_attenuation(scene, light_idx, dir_to_point):
    """SpotLight::GetAttenuation (lights/lights.cpp:128-144)."""
    lt = scene.lights
    cos_t = dot(dir_to_point, jnp.broadcast_to(lt.direction[light_idx], dir_to_point.shape))
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t)) / jnp.maximum(cos_t, 1e-20)
    inner = lt.inner[light_idx]
    outer = lt.outer[light_idx]
    ring = jnp.square((outer - r) / jnp.maximum(outer - inner, 1e-20))
    att = jnp.where(r < inner, 1.0, jnp.where(r > outer, 0.0, ring))
    return jnp.where(cos_t < 0.0, 0.0, att)


def illuminate(scene, meta, cfg, light_idx: int, p, keys):
    """GenLight-family Illuminate: per-lane RGB intensity including shadowing.

    Host-unrolled per light (light count and kinds are static). Replicates:
    - DirectLight: one shadow ray along -direction (lights/lights.h:66-71)
    - PointLight: size > 0.01 -> soft shadows from `shadow_spp` ball samples
      with per-sample inverse-square falloff inside the running mean
      (lights/lights.cpp:50-74); else one shadow ray with falloff
    - SpotLight: point behavior * cone attenuation (lights.cpp:83-109)
    - inverse-square falloff toggled by cfg.inverse_square_falloff, matching
      the reference global that Basic/Phong material ctors disable
      (lights/lights.cpp:18-30).
    """
    lt = scene.lights
    kind = meta.light_kinds[light_idx]
    intensity = lt.intensity[light_idx]
    num = p.shape[0]

    if kind == LIGHT_AMBIENT:
        return jnp.broadcast_to(intensity, (num, 3))

    def falloff(vec):
        if not cfg.inverse_square_falloff:
            return jnp.ones(vec.shape[:-1], vec.dtype)
        d2 = jnp.sum(vec * vec, axis=-1)
        return jnp.minimum(1.0, 1.0 / jnp.maximum(d2, 1e-20))

    if kind == LIGHT_DIRECT:
        d = jnp.broadcast_to(-lt.direction[light_idx], p.shape)
        t_max = jnp.full((num,), BIGFLOAT)
        occluded = trace_shadow(scene, meta, p, normalize(d), t_max)
        vis = 1.0 - occluded.astype(jnp.float32)
        return vis[:, None] * intensity

    # Point / spot core.
    size = lt.size[light_idx]
    pos = lt.position[light_idx]
    soft = meta.light_soft[light_idx]
    if soft:
        # Soft shadows: EXACT port of the reference's adaptive loop
        # (lights/lights.cpp:50-74):
        #     inshadow += (Shadow_s - inshadow) * falloff_s / (s+1)
        #     if 0 < inshadow < 1: spp = shadow_spp_max
        # Note the falloff sits INSIDE the recurrence update, so this is NOT
        # mean(shadow*falloff): for small falloff f it approaches
        # shadow * f * H_n (harmonic growth), and the escalation to
        # shadow_spp_max triggers as soon as the estimate is fractional.
        #
        # Two-phase dispatch: the reference traces the s_min..s_max tail only
        # for lanes whose estimate went fractional during the first s_min
        # samples, so we trace s_min rays for everyone, decide escalation
        # from that (the estimate trajectory over the first s_min samples is
        # identical either way), and trace the tail with a ZEROED t_max
        # budget on non-escalating lanes — their BVH walks terminate on the
        # first iteration, so tail cost tracks the escalated population
        # instead of always being worst-case. Draws come from one
        # [s_max, 2, 2] stream sliced per phase, so sample values (and the
        # final image) are bit-identical to the single-dispatch form.
        s_min = cfg.shadow_spp
        s_max = max(cfg.shadow_spp_max, s_min)
        k = RNG.fold(keys, RNG.P_SHADOW + 101 * light_idx)
        u = RNG.uniform(k, (s_max, 2, 2))  # quirk-ball uniforms per sample
        balls = _quirk_ball(u, size)  # [B, s_max, 3]
        target = pos[None, None, :] + balls
        vec = target - p[:, None, :]  # [B,s_max,3]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(vec * vec, axis=-1), 1e-20))
        dirs = vec / dist[..., None]
        fall = falloff(vec)  # [B, s_max]

        def trace_phase(lo, hi, budget_mask=None):
            """Shadow-trace samples [lo, hi); budget_mask zeroes dead lanes."""
            v_ = vec[:, lo:hi]
            d_ = dist[:, lo:hi]
            if budget_mask is not None:
                d_ = d_ * budget_mask[:, None]
            flat_p = jnp.broadcast_to(p[:, None, :], v_.shape).reshape(-1, 3)
            occ = trace_shadow(
                scene, meta,
                flat_p, dirs[:, lo:hi].reshape(-1, 3), d_.reshape(-1),
            ).reshape(num, hi - lo)
            return 1.0 - occ.astype(jnp.float32)  # x_s

        def recurrence(i0, s0, xs, fs, gate=None):
            """Run the reference update over samples s0..s0+K-1.

            gate: optional [B] mask — lanes with gate False keep i0 (their
            loop already ended). Returns (i, fractional_seen)."""

            def body(carry, args):
                i, s, frac = carry
                x, f = args
                upd = i + (x - i) * f / (s + 1.0)
                if gate is not None:
                    upd = jnp.where(gate, upd, i)
                frac = frac | ((upd > 0.0) & (upd < 1.0))
                return (upd, s + 1.0, frac), None

            init = (i0, jnp.full((num,), float(s0)), jnp.zeros((num,), bool))
            (i, _, frac), _ = jax.lax.scan(body, init, (xs.T, fs.T))
            return i, frac

        shadow1 = trace_phase(0, s_min)
        in_shadow, escalate = recurrence(
            jnp.zeros((num,)), 0, shadow1, fall[:, :s_min]
        )
        if s_max > s_min:
            shadow2 = trace_phase(
                s_min, s_max, budget_mask=escalate.astype(jnp.float32)
            )
            in_shadow2, _ = recurrence(
                in_shadow, s_min, shadow2, fall[:, s_min:], gate=escalate
            )
            in_shadow = jnp.where(escalate, in_shadow2, in_shadow)
        out = in_shadow[:, None] * intensity
    else:
        vec = pos[None, :] - p
        dist = jnp.sqrt(jnp.maximum(jnp.sum(vec * vec, axis=-1), 1e-20))
        occ = trace_shadow(scene, meta, p, vec / dist[:, None], dist)
        vis = 1.0 - occ.astype(jnp.float32)
        out = (vis * falloff(vec))[:, None] * intensity

    if kind == LIGHT_SPOT:
        att = spot_attenuation(
            scene, light_idx, light_direction(scene, meta, light_idx, p)
        )
        out = out * att[:, None]
    return out


def _quirk_ball(u, radius):
    """uniform_ball_ref over an extra sample axis: u [B, S, A, 2] -> [B, S, 3]."""
    return uniform_ball_ref(u, radius)


def blinn_direct(scene, meta, cfg, p, n, v, diffuse, specular, glossiness, keys,
                 skip_ambient: bool, norm_power: int,
                 spec_cos_nl: bool = True):
    """Sum of Blinn direct lighting over all lights.

    norm_power: 0 -> no 1/L normalization (Basic, MtlBlinn_Basic.cpp:168-182),
    1 -> PhotonMap convention (MtlBlinn_PhotonMap.cpp:482-498),
    2 -> PathTracing double-normalization quirk (MtlBlinn_PathTracing.cpp:
    163-175 multiplies normCoefDI into the intensity AND the sum term).
    spec_cos_nl: False -> the MC-GI variant, whose specular term omits the
    cosNL factor (MtlBlinn_MonteCarloGI.cpp:190-196).
    """
    num_lights = meta.num_lights
    total = jnp.zeros_like(p)
    if num_lights == 0:
        return total
    norm = (1.0 / num_lights) ** norm_power
    for li in range(num_lights):
        is_ambient = meta.light_kinds[li] == LIGHT_AMBIENT
        if is_ambient:
            if skip_ambient:
                continue
            intensity = illuminate(scene, meta, cfg, li, p, keys)
            total = total + diffuse * intensity
            continue
        intensity = illuminate(scene, meta, cfg, li, p, keys) * norm
        l_dir = normalize(-light_direction(scene, meta, li, p), eps=1e-30)
        h = normalize(v + l_dir, eps=1e-30)
        cos_nl = jnp.maximum(0.0, dot(n, l_dir))
        cos_nh = jnp.maximum(0.0, dot(n, h))
        spec = specular * pow_safe(cos_nh, glossiness)[:, None]
        if spec_cos_nl:
            total = total + intensity * cos_nl[:, None] * (diffuse + spec)
        else:
            total = total + intensity * (diffuse * cos_nl[:, None] + spec)
    return total
