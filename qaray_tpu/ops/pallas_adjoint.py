"""Pallas adjoint megakernel: fused backward for the differentiable params.

The r04 backward re-ran the XLA wavefront engine under jax.vjp — dozens of
elementwise passes at ~17 GB/s effective, 50x off the fused forward. This
kernel computes the SAME gradients (for the product's differentiable
surface, diff.DiffParams: material colors + glossiness, light intensities,
background/environment — BASELINE.json's "material/light/texture params")
in one fused dispatch.

Why a hand adjoint is tractable here: with detached sampling
(integrators/engine.py stop_gradients on directions and lobe PDFs) and
geometry/ior outside DiffParams, the pathtrace estimator per lane is

    L_c = sum_j beta_{j,c} * c_{j,c} + miss terms,  beta_{j+1} = beta_j*w_j

where every w_j and c_j is multilinear in the parameters with detached
coefficients, plus pow(cosNH, gloss) factors whose gloss-derivative is the
log-weighted same term. The kernel REPLAYS the forward (identical threefry
draws => identical paths), stores the per-bounce hooks, runs the reverse
beta-chain, and reduces per-(material-row, param) masked sums to scalars —
one [rows,128] partial-sum row per grid block, summed in XLA.

Scope (gated in diff.render_with_params): pathtrace integrator, analytic
prims only, untextured, no photon maps, <= 8 material rows and <= 8 lights.
Everything else falls back to the XLA-engine vjp.

Reference: the backward has no reference counterpart (the C++ renderer has
no gradients); semantics follow integrators/engine._pathtrace_vertex.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qaray_tpu.core import rng as RNG
from qaray_tpu.core.constants import TOTAL_REFLECTION_THRESHOLD
from qaray_tpu.core.krng import draw_at, fold2
from qaray_tpu.ops.pallas_pathtrace import (
    BLOCK_ROWS,
    LANES,
    _add3,
    _closest_hit,
    _cross3,
    _dot3,
    _halton,
    _LT_DIR,
    _LT_INNER,
    _LT_INT,
    _LT_OUTER,
    _LT_POS,
    _LT_SIZE,
    _CAM_A,
    _CAM_BG,
    _CAM_DOF,
    _CAM_ENV,
    _CAM_POS,
    _CAM_U,
    _CAM_V,
    _CAM_X,
    _CAM_Y,
    _max3,
    _neg3,
    _norm3,
    _pack_tables,
    _pow_safe,
    _scale3,
    _shadow_occluded,
    _sub3,
    _to_local_frame,
    _v3,
    _where3,
)
from qaray_tpu.scene.arrays import LIGHT_AMBIENT, LIGHT_DIRECT, LIGHT_SPOT


def param_layout(num_materials: int, num_lights: int):
    """Static scalar layout of the partial-sum output row(s).

    Per material row r (16 scalars at r*16): diffuse(3), specular(3),
    emission(3), reflection(3), refraction(3), glossiness(1).
    Then per light l (3 at M*16 + l*3), then bg(3), env(3).
    """
    n = num_materials * 16 + num_lights * 3 + 6
    return n


def adjoint_supported(meta, cfg) -> bool:
    return (
        cfg.integrator == "pathtrace"
        and not cfg.use_photon_map
        and (meta.num_mesh_instances == 0
             or (meta.mesh_mega and not meta.mesh_mega_stream))
        and meta.num_analytic > 0
        and len(meta.analytic_kinds) == meta.num_analytic
        and not meta.has_mtl_textures
        and not meta.has_bg_texture
        and not meta.has_env_texture
        and not meta.has_dof  # lens draws replay is wired but untested
        and meta.num_materials <= 8
        and meta.num_lights <= 8
    )


def _light_factor(kinds, prim_ref, light_ref, li, lkind, soft, cfg, p, kb,
                  mesh=None):
    """Scalar visibility*falloff*spot factor V of light `li` per lane, with
    the same shadow draws as the forward (_illuminate,
    ops/pallas_pathtrace.py). inten_c = V * I_c for non-ambient lights."""
    shape = p[0].shape
    if lkind == LIGHT_DIRECT:
        dvec = _neg3(_v3(light_ref, li, _LT_DIR))
        dn = _norm3(tuple(jnp.full(shape, c) for c in dvec))
        from qaray_tpu.core.constants import BIGFLOAT

        occ = _shadow_occluded(kinds, prim_ref, p, dn,
                               jnp.full(shape, BIGFLOAT), mesh)
        v = 1.0 - occ.astype(jnp.float32)
    else:
        pos = _v3(light_ref, li, _LT_POS)
        if not soft:
            vec = _sub3(tuple(jnp.full(shape, c) for c in pos), p)
            d2 = _dot3(vec, vec)
            dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
            occ = _shadow_occluded(kinds, prim_ref, p,
                                   _scale3(vec, 1.0 / dist), dist, mesh)
            v = (1.0 - occ.astype(jnp.float32)) * jnp.minimum(
                1.0, 1.0 / jnp.maximum(d2, 1e-20)
            )
        else:
            s_min = cfg.shadow_spp
            s_max = max(cfg.shadow_spp_max, s_min)
            size = light_ref[li, _LT_SIZE]
            ks = fold2(kb[0], kb[1],
                       jnp.full(shape, RNG.P_SHADOW + 101 * li, jnp.int32))
            in_shadow = jnp.zeros(shape, jnp.float32)
            frac = jnp.zeros(shape, jnp.bool_)
            escalate = None
            for s in range(s_max):
                u = [draw_at(ks[0], ks[1], 4 * s + j) for j in range(4)]
                cand = []
                for a in range(2):
                    r1 = u[2 * a] * 2.0 - 1.0
                    r2 = u[2 * a + 1] * 2.0 - 1.0
                    cand.append((r1, r2, r2))
                ok0 = jnp.sqrt(_dot3(cand[0], cand[0])) <= 1.0
                pick = _where3(ok0, cand[0], cand[1])
                pn = jnp.sqrt(_dot3(pick, pick))
                scale = jnp.where(pn > 1.0, 1.0 / jnp.maximum(pn, 1e-12),
                                  1.0)
                ball = _scale3(pick, scale * size)
                target = _add3(tuple(jnp.full(shape, c) for c in pos), ball)
                vec = _sub3(target, p)
                d2 = _dot3(vec, vec)
                dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
                occ = _shadow_occluded(
                    kinds, prim_ref, p, _scale3(vec, 1.0 / dist), dist, mesh
                )
                x = 1.0 - occ.astype(jnp.float32)
                fall = jnp.minimum(1.0, 1.0 / jnp.maximum(d2, 1e-20))
                upd = in_shadow + (x - in_shadow) * fall / (s + 1.0)
                if s < s_min:
                    in_shadow = upd
                    frac = frac | ((upd > 0.0) & (upd < 1.0))
                else:
                    if escalate is None:
                        escalate = frac
                    in_shadow = jnp.where(escalate, upd, in_shadow)
            v = in_shadow
        if lkind == LIGHT_SPOT:
            ldir = _v3(light_ref, li, _LT_DIR)
            to_p = _norm3(
                _sub3(p, tuple(jnp.full(shape, c) for c in pos)), eps=1e-30
            )
            cos_t = to_p[0] * ldir[0] + to_p[1] * ldir[1] + to_p[2] * ldir[2]
            r = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t)) \
                / jnp.maximum(cos_t, 1e-20)
            inner = light_ref[li, _LT_INNER]
            outer = light_ref[li, _LT_OUTER]
            ring = jnp.square(
                (outer - r) / jnp.maximum(outer - inner, 1e-20)
            )
            att = jnp.where(r < inner, 1.0, jnp.where(r > outer, 0.0, ring))
            att = jnp.where(cos_t < 0.0, 0.0, att)
            v = v * att
    return v


def _make_adjoint_kernel(meta, cfg, p_rows: int,
                         _n_mclusters: int = 0):
    kinds = meta.analytic_kinds
    mtls = meta.analytic_mtls
    lkinds = meta.light_kinds
    lsoft = meta.light_soft
    width = meta.img_width
    has_dof = meta.has_dof
    has_glossy = meta.has_glossy
    max_bounce = cfg.max_bounce
    num_m = meta.num_materials
    num_l = meta.num_lights
    n_params = param_layout(num_m, num_l)

    has_mesh = meta.mesh_mega
    mesh_mtls = meta.mesh_mega_mtls if has_mesh else ()
    n_mclusters = _n_mclusters

    def kernel(prim_ref, mtl_ref, light_ref, cam_ref, key_ref,
               mc16_ref, mattr_ref, mcb_ref,
               px_ref, py_ref, sid_ref, ctr_ref, ctg_ref, ctb_ref, out_ref):
        mesh = (
            (mc16_ref, mattr_ref, mcb_ref, n_mclusters, None)
            if has_mesh else None
        )
        px = px_ref[:]
        py = py_ref[:]
        sid = sid_ref[:]
        ct = (ctr_ref[:], ctg_ref[:], ctb_ref[:])
        shape = px.shape
        zero = jnp.zeros(shape)

        rid = py * jnp.int32(width) + px
        folddata = rid * jnp.int32(65536) + sid
        b0 = key_ref[0, 0]
        b1 = key_ref[0, 1]
        kr = fold2(jnp.full(shape, b0), jnp.full(shape, b1), folddata)

        jx = _halton(sid, 11)
        jy = _halton(sid, 13)
        tx = px.astype(jnp.float32) + jx
        ty = py.astype(jnp.float32) + jy
        ca = _v3(cam_ref, 0, _CAM_A)
        cu = _v3(cam_ref, 0, _CAM_U)
        cv = _v3(cam_ref, 0, _CAM_V)
        cpos = _v3(cam_ref, 0, _CAM_POS)
        cpt = tuple(ca[k] + tx * cu[k] + ty * cv[k] for k in range(3))
        campos = tuple(jnp.full(shape, cpos[k]) for k in range(3))
        if has_dof:
            kd = fold2(kr[0], kr[1], jnp.full(shape, RNG.P_DOF, jnp.int32))
            u0 = draw_at(kd[0], kd[1], 0)
            u1 = draw_at(kd[0], kd[1], 1)
            lr = cam_ref[0, _CAM_DOF] * jnp.sqrt(u0)
            lt = 2.0 * np.pi * u1
            lx, ly = lr * jnp.cos(lt), lr * jnp.sin(lt)
            cx = _v3(cam_ref, 0, _CAM_X)
            cy = _v3(cam_ref, 0, _CAM_Y)
            campos = tuple(campos[k] + lx * cx[k] + ly * cy[k]
                           for k in range(3))
        d = _norm3(_sub3(cpt, campos))
        p = campos

        bg = _v3(cam_ref, 0, _CAM_BG)
        env = _v3(cam_ref, 0, _CAM_ENV)

        # Parameter accumulators (per-lane tiles, reduced once at the end).
        g_mtl = [
            {
                "diffuse": [zero, zero, zero],
                "specular": [zero, zero, zero],
                "emission": [zero, zero, zero],
                "reflection": [zero, zero, zero],
                "refraction": [zero, zero, zero],
                "gloss": [zero],
            }
            for _ in range(num_m)
        ]
        g_light = [[zero, zero, zero] for _ in range(num_l)]
        g_bg = [zero, zero, zero]
        g_env = [zero, zero, zero]

        beta = (jnp.ones(shape), jnp.ones(shape), jnp.ones(shape))
        alive = jnp.ones(shape, jnp.bool_)
        # Per-bounce storage for the reverse beta-chain sweep.
        store = []

        norm = (1.0 / num_l) ** 2 if num_l else 0.0
        num_lights_on = num_l

        for bounce in range(max_bounce + 1):
            hits = _closest_hit(kinds, mtls, prim_ref, mtl_ref, p, d,
                                mesh=mesh, mesh_mtls=mesh_mtls,
                                want_row=True)
            hit = hits["hit"] & alive
            miss = (~hits["hit"]) & alive
            alive = hit
            mtl = hits["mtl"]
            row = hits["row"]
            n = _norm3(hits["n"], eps=1e-30)
            front = hits["front"]
            v = _neg3(d)
            kb = fold2(kr[0], kr[1],
                       jnp.full(shape, 1000 + bounce, jnp.int32))

            # --- Fresnel (replay of the forward kernel) ---
            cos_nv = _dot3(n, v)
            y = _where3(cos_nv > 0.0, n, _neg3(n))
            z = _cross3(v, y)
            x = _norm3(_cross3(y, z), eps=1e-30)
            ior = mtl["ior"]
            n_ior = jnp.where(front, 1.0 / ior, ior)
            cos_i = cos_nv
            sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
            sin_o = jnp.clip(sin_i * n_ior, 0.0, 1.0)
            cos_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_o * sin_o))
            t_dir = tuple(-x[k] * sin_o - y[k] * cos_o for k in range(3))
            r_dir = tuple(2.0 * n[k] * cos_nv - v[k] for k in range(3))
            total_refl = (n_ior * sin_i) > TOTAL_REFLECTION_THRESHOLD
            c0 = (n_ior - 1.0) ** 2 / (n_ior + 1.0) ** 2
            r_ratio = c0 + (1.0 - c0) * jnp.power(1.0 - jnp.abs(cos_i), 5.0)
            # Detached linear coefficients of the sample colors:
            #   samp_refr_c = tfac * refraction_c
            #   samp_refl_c = reflection_c + rr_eff * refraction_c
            tfac = jnp.where(total_refl, 0.0, 1.0 - r_ratio)
            rr_eff = jnp.where(total_refl, 1.0, r_ratio)
            t_k = mtl["refraction"]
            r_k = mtl["reflection"]
            samp_refr = tuple(tfac * t_k[k] for k in range(3))
            samp_refl = tuple(r_k[k] + rr_eff * t_k[k] for k in range(3))

            ksel = fold2(kb[0], kb[1],
                         jnp.full(shape, RNG.P_LOBE_SELECT, jnp.int32))
            select = draw_at(ksel[0], ksel[1], 0)
            coef_refr = _max3(samp_refr)
            coef_refl = _max3(samp_refl)
            coef_spec = _max3(mtl["specular"])
            coef_diff = _max3(mtl["diffuse"])
            coef_sum = jnp.maximum(
                coef_refr + coef_refl + coef_spec + coef_diff, 1e-20
            )
            c_refr = coef_refr / coef_sum
            c_refl = coef_refl / coef_sum
            c_spec = coef_spec / coef_sum
            c_diff = coef_diff / coef_sum
            sum_refr = c_refr
            sum_refl = sum_refr + c_refl
            sum_spec = sum_refl + c_spec
            sel_refr = (select <= sum_refr) & (c_refr > 1e-6)
            sel_refl = (~sel_refr) & (select < sum_refl) & (c_refl > 1e-6)
            sel_spec = (
                (~sel_refr) & (~sel_refl) & (select < sum_spec)
                & (c_spec > 1e-6)
            )
            sel_diff = (
                (~sel_refr) & (~sel_refl) & (~sel_spec) & (c_diff > 1e-6)
            )

            # --- direct + emission, with immediate c_j gradients ---
            # factor_c = alive * beta_c * ct_c  (the adjoint of c_j).
            af = alive.astype(jnp.float32)
            factor = tuple(af * beta[k] * ct[k] for k in range(3))
            direct = [zero, zero, zero]
            for li in range(num_lights_on):
                lkind = lkinds[li]
                if lkind == LIGHT_AMBIENT:
                    continue
                vfac = _light_factor(kinds, prim_ref, light_ref, li, lkind,
                                     lsoft[li], cfg, hits["hp"], kb, mesh)
                inten = _v3(light_ref, li, _LT_INT)
                if lkind == LIGHT_DIRECT:
                    ld = _neg3(_v3(light_ref, li, _LT_DIR))
                    l_dir = _norm3(tuple(jnp.full(shape, c) for c in ld),
                                   eps=1e-30)
                else:
                    pos = _v3(light_ref, li, _LT_POS)
                    to_p = _norm3(
                        _sub3(hits["hp"],
                              tuple(jnp.full(shape, c) for c in pos)),
                        eps=1e-30,
                    )
                    l_dir = _norm3(_neg3(to_p), eps=1e-30)

                h = _norm3(_add3(v, l_dir), eps=1e-30)
                cos_nl = jnp.maximum(0.0, _dot3(n, l_dir))
                cos_nh = jnp.maximum(0.0, _dot3(n, h))
                sw = _pow_safe(cos_nh, mtl["glossiness"])
                ln_nh = jnp.log(jnp.maximum(cos_nh, 1e-6))
                wgt = norm * vfac * cos_nl
                for k in range(3):
                    direct[k] = direct[k] + wgt * inten[k] * (
                        mtl["diffuse"][k] + mtl["specular"][k] * sw
                    )
                    # d/d I_{l,k}
                    g_light[li][k] = g_light[li][k] + factor[k] * wgt * (
                        mtl["diffuse"][k] + mtl["specular"][k] * sw
                    )
                # Per-material-row masked direct-lighting gradients.
                for r in range(num_m):
                    mrow = jnp.where(row == float(r), 1.0, 0.0)
                    gl = zero
                    for k in range(3):
                        base = factor[k] * wgt * inten[k] * mrow
                        g = g_mtl[r]
                        g["diffuse"][k] = g["diffuse"][k] + base
                        g["specular"][k] = g["specular"][k] + base * sw
                        gl = gl + base * mtl["specular"][k] * sw * ln_nh
                    g_mtl[r]["gloss"][0] = g_mtl[r]["gloss"][0] + gl

            emit = mtl["emission"]
            for r in range(num_m):
                mrow = jnp.where(row == float(r), 1.0, 0.0)
                for k in range(3):
                    g_mtl[r]["emission"][k] = (
                        g_mtl[r]["emission"][k] + factor[k] * mrow
                    )
            c_j = tuple(emit[k] + direct[k] for k in range(3))

            # bg/env adjoint: radiance += miss * beta * m.
            mf = miss.astype(jnp.float32)
            for k in range(3):
                if bounce == 0:
                    g_bg[k] = g_bg[k] + mf * beta[k] * ct[k]
                else:
                    g_env[k] = g_env[k] + mf * beta[k] * ct[k]

            if bounce == max_bounce:
                store.append(dict(miss=mf, alive=af, c=c_j, beta=beta,
                                  w=(zero, zero, zero), alivec=zero,
                                  row=row, lobe=zero, invpdf=zero,
                                  tfac=tfac, rr_eff=rr_eff,
                                  wfac_t=zero, wfac_r=zero,
                                  sw=zero, ln=zero, bounce=bounce))
                break

            # --- continuation replay (MtlBlinn_PathTracing) ---
            kh = fold2(kb[0], kb[1],
                       jnp.full(shape, RNG.P_LOBE_SAMPLE, jnp.int32))
            u0 = draw_at(kh[0], kh[1], 0)
            u1 = draw_at(kh[0], kh[1], 1)
            ctl = jnp.sqrt(u0)
            stl = jnp.sqrt(jnp.maximum(0.0, 1.0 - u0))
            phi = 2.0 * np.pi * u1
            hemi = _norm3((stl * jnp.cos(phi), stl * jnp.sin(phi), ctl),
                          eps=1e-30)
            hemi_world = _to_local_frame(y, hemi)

            refr_glossy = mtl["tgloss"] > 0.0
            refl_glossy = mtl["rgloss"] > 0.0
            refr_dir = _where3(refr_glossy, _neg3(hemi_world), t_dir)
            cos_vh_t = jnp.maximum(0.0, _dot3(v, t_dir))
            wfac_t = jnp.where(
                refr_glossy, _pow_safe(cos_vh_t, mtl["tgloss"]), 1.0
            )
            refl_dir = _where3(refl_glossy, hemi_world, r_dir)
            cos_vh_r = jnp.maximum(0.0, _dot3(v, r_dir))
            wfac_r = jnp.where(
                refl_glossy, _pow_safe(cos_vh_r, mtl["rgloss"]), 1.0
            )
            h = _norm3(_add3(v, _norm3(hemi_world, eps=1e-30)), eps=1e-30)
            cos_nh = jnp.maximum(0.0, _dot3(n, h))
            sw_cont = _pow_safe(cos_nh, mtl["glossiness"])
            ln_cont = jnp.log(jnp.maximum(cos_nh, 1e-6))

            go_refr = sel_refr
            go_refl = sel_refl
            go_spec = sel_spec & front
            go_diff = sel_diff & front
            new_dir = _where3(
                go_refr, refr_dir,
                _where3(go_refl, refl_dir,
                        _where3(go_spec, hemi_world, hemi_world)),
            )
            pdf = jnp.where(
                go_refr, c_refr,
                jnp.where(go_refl, c_refl,
                          jnp.where(go_spec, c_spec, c_diff)),
            )
            invpdf = 1.0 / jnp.maximum(pdf, 1e-20)
            alive_c = alive & (go_refr | go_refl | go_spec | go_diff)
            w_j = tuple(
                jnp.where(
                    go_refr, samp_refr[k] * wfac_t,
                    jnp.where(
                        go_refl, samp_refl[k] * wfac_r,
                        jnp.where(go_spec,
                                  mtl["specular"][k] * sw_cont,
                                  mtl["diffuse"][k]),
                    ),
                ) * invpdf
                for k in range(3)
            )
            lobe = jnp.where(
                go_refr, 1.0,
                jnp.where(go_refl, 2.0,
                          jnp.where(go_spec, 3.0,
                                    jnp.where(go_diff, 4.0, 0.0))),
            )
            store.append(dict(
                miss=mf, alive=af, c=c_j, beta=beta, w=w_j,
                alivec=alive_c.astype(jnp.float32), row=row, lobe=lobe,
                invpdf=invpdf, tfac=tfac, rr_eff=rr_eff,
                wfac_t=wfac_t, wfac_r=wfac_r, sw=sw_cont, ln=ln_cont,
                bounce=bounce,
            ))

            new_beta = tuple(
                jnp.where(alive_c, beta[k] * w_j[k], beta[k])
                for k in range(3)
            )
            beta = new_beta
            alive = alive_c
            p = hits["hp"]
            d = _norm3(new_dir, eps=1e-30)

        # --- reverse beta-chain sweep ---
        # A_{j,c}: adjoint of beta_j. A_last+1 = 0.
        a_beta = [zero, zero, zero]
        for s in reversed(store):
            m_c = bg if s["bounce"] == 0 else env
            ctw = [s["alivec"] * s["beta"][k] * a_beta[k] for k in range(3)]
            # Distribute the continuation-weight adjoint onto parameters.
            is_refr = jnp.where(s["lobe"] == 1.0, 1.0, 0.0)
            is_refl = jnp.where(s["lobe"] == 2.0, 1.0, 0.0)
            is_spec = jnp.where(s["lobe"] == 3.0, 1.0, 0.0)
            is_diff = jnp.where(s["lobe"] == 4.0, 1.0, 0.0)
            ip = s["invpdf"]
            for r in range(num_m):
                mrow = jnp.where(s["row"] == float(r), 1.0, 0.0)
                g = g_mtl[r]
                gl = zero
                for k in range(3):
                    cw = ctw[k] * mrow * ip
                    # refr color feeds BOTH lobes: samp_refr = tfac*refr,
                    # samp_refl = refl + rr_eff*refr.
                    g["refraction"][k] = g["refraction"][k] + cw * (
                        is_refr * s["tfac"] * s["wfac_t"]
                        + is_refl * s["rr_eff"] * s["wfac_r"]
                    )
                    # refl lobe: w = (refl_c + rr_eff*refr_c)*wfac_r / pdf
                    g["reflection"][k] = g["reflection"][k] + cw * (
                        is_refl * s["wfac_r"]
                    )
                    # spec lobe: w = spec_c * sw / pdf
                    g["specular"][k] = g["specular"][k] + cw * (
                        is_spec * s["sw"]
                    )
                    # diff lobe: w = diff_c / pdf
                    g["diffuse"][k] = g["diffuse"][k] + cw * is_diff
                    # gloss via the spec lobe: dw/dgloss = w * ln(cosNH)
                    # (w = spec*sw/pdf, d(sw)/dgloss = sw*ln).
                    gl = gl + ctw[k] * mrow * is_spec * s["w"][k] * s["ln"]
                g_mtl[r]["gloss"][0] = g_mtl[r]["gloss"][0] + gl
            # Step the adjoint: A_j = miss*m*ct + alive*c*ct + alivec*w*A.
            a_beta = [
                s["miss"] * m_c[k] * ct[k]
                + s["alive"] * s["c"][k] * ct[k]
                + s["alivec"] * s["w"][k] * a_beta[k]
                for k in range(3)
            ]

        # --- reduce to the partial-sum row(s) ---
        # Mosaic supports neither scalar stores into VMEM refs nor
        # scatter on register arrays; place each reduced scalar with an
        # iota-mask select and write the tile once.
        out_tile = jnp.zeros((p_rows, LANES), jnp.float32)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (p_rows, LANES), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (p_rows, LANES), 1)

        def put(idx, tile):
            nonlocal out_tile
            m = (row_iota == idx // LANES) & (lane_iota == idx % LANES)
            out_tile = jnp.where(m, jnp.sum(tile), out_tile)

        for r in range(num_m):
            base = r * 16
            g = g_mtl[r]
            for j, name in enumerate(
                ("diffuse", "specular", "emission", "reflection",
                 "refraction")
            ):
                for k in range(3):
                    put(base + 3 * j + k, g[name][k])
            put(base + 15, g["gloss"][0])
        lb = num_m * 16
        for li in range(num_l):
            for k in range(3):
                put(lb + 3 * li + k, g_light[li][k])
        eb = lb + num_l * 3
        for k in range(3):
            put(eb + k, g_bg[k])
            put(eb + 3 + k, g_env[k])
        out_ref[:, :] = out_tile

    return kernel


@partial(jax.jit, static_argnames=("meta", "cfg", "interpret"))
def adjoint_render(scene, meta, cfg, px, py, sample_ids, key_words, ct,
                   interpret: bool = False):
    """Fused parameter-gradient dispatch.

    ct: [B, 3] per-lane radiance cotangent. Returns a flat [n_params]
    gradient vector in param_layout order (summed over all lanes).
    """
    from qaray_tpu.ops.pallas_pathtrace import _fold_words

    num = px.shape[0]
    block = BLOCK_ROWS * LANES
    pad = (-num) % block
    px_p = jnp.pad(px.astype(jnp.int32), (0, pad))
    py_p = jnp.pad(py.astype(jnp.int32), (0, pad))
    sid_p = jnp.pad(sample_ids.astype(jnp.int32), (0, pad))
    ct_p = jnp.pad(ct.astype(jnp.float32), ((0, pad), (0, 0)))
    total = num + pad
    grid = total // block
    rows = total // LANES

    def shape2(a):
        return a.reshape(rows, LANES)

    prim_tab, mtl_tab, light_tab, cam_tab = _pack_tables(scene)
    key2 = _fold_words(key_words).reshape(1, 2).astype(jnp.uint32)
    from qaray_tpu.ops.pallas_pathtrace import MEGA_CLUSTER

    if meta.mesh_mega:
        mc16 = scene.mesh.mega_c16
        mattr = scene.mesh.mega_attr
        mcb = scene.mesh.mega_cbounds
        n_mclusters = mc16.shape[0] // MEGA_CLUSTER
    else:
        mc16 = jnp.zeros((MEGA_CLUSTER, 16), jnp.float32)
        mattr = jnp.zeros((MEGA_CLUSTER, 16), jnp.float32)
        mcb = jnp.zeros((1, 8), jnp.float32)
        n_mclusters = 0

    n_params = param_layout(meta.num_materials, meta.num_lights)
    # Mosaic block shapes need sublane counts divisible by 8.
    p_rows = max(8, ((n_params + LANES - 1) // LANES + 7) // 8 * 8)

    block_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (p_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    partials = pl.pallas_call(
        _make_adjoint_kernel(meta, cfg, p_rows, n_mclusters),
        grid=(grid,),
        in_specs=[small] * 8 + [block_spec] * 6,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((grid * p_rows, LANES), jnp.float32),
        interpret=interpret,
    )(prim_tab, mtl_tab, light_tab, cam_tab, key2, mc16, mattr, mcb,
      shape2(px_p), shape2(py_p), shape2(sid_p),
      shape2(ct_p[:, 0]), shape2(ct_p[:, 1]), shape2(ct_p[:, 2]))

    summed = partials.reshape(grid, p_rows * LANES).sum(axis=0)
    return summed[:n_params]
