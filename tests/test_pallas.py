"""Pallas fused closest-hit kernel vs the XLA reference path (interpret mode
on CPU; the compiled kernel is exercised by bench.py on the TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qaray_tpu.ops.intersect import closest_analytic
from qaray_tpu.ops.pallas_analytic import closest_analytic_pallas
from qaray_tpu.scene.compiler import compile_scene
from qaray_tpu.scene.xml_parser import load_scene


@pytest.fixture(scope="module")
def box_scene(inputs_dir):
    scene, meta = compile_scene(
        load_scene(f"{inputs_dir}/example_project3_box.xml")
    )
    return scene, meta


def test_pallas_matches_xla_interpret(box_scene):
    scene, meta = box_scene
    rs = np.random.RandomState(0)
    num = 2048
    p = jnp.asarray(rs.uniform(-30, 30, (num, 3)).astype(np.float32))
    d = rs.normal(size=(num, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    t_ref, i_ref = closest_analytic(p, d, scene.analytic)
    t_pl, i_pl = closest_analytic_pallas(
        p, d, scene.analytic, meta.analytic_kinds, interpret=True
    )
    t_ref, i_ref, t_pl, i_pl = map(np.asarray, (t_ref, i_ref, t_pl, i_pl))
    # f32 order-of-operations differ (einsum reduction vs scalar FMA chain);
    # grazing hits near discriminant zero amplify the ulps. Allow a small
    # disagreement tail; the bulk must agree tightly.
    hits = (t_ref < 1e29) & (t_pl < 1e29)
    rel = np.abs(t_pl[hits] - t_ref[hits]) / np.maximum(t_ref[hits], 1.0)
    assert np.percentile(rel, 99) < 1e-5
    assert (rel > 1e-3).mean() < 0.005
    assert ((t_ref < 1e29) ^ (t_pl < 1e29)).mean() < 0.005
    same_prim = i_pl[hits] == i_ref[hits]
    assert same_prim.mean() > 0.995


def test_pallas_shadow_matches_xla(box_scene):
    from qaray_tpu.ops.intersect import intersect_analytic_t
    from qaray_tpu.ops.pallas_analytic import shadow_analytic_pallas

    scene, meta = box_scene
    rs = np.random.RandomState(2)
    num = 2048
    p = jnp.asarray(rs.uniform(-30, 30, (num, 3)).astype(np.float32))
    d = rs.normal(size=(num, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_max = jnp.asarray(rs.uniform(1, 60, num).astype(np.float32))

    ref = np.asarray(
        jnp.any(intersect_analytic_t(p, d, scene.analytic) < t_max[:, None], axis=-1)
    )
    pal = np.asarray(
        shadow_analytic_pallas(
            p, d, t_max, scene.analytic, meta.analytic_kinds, interpret=True
        )
    )
    # Grazing-ulps tail only.
    assert (ref != pal).mean() < 0.005


def test_pallas_padding(box_scene):
    """Non-multiple-of-block batch sizes round-trip correctly."""
    scene, meta = box_scene
    rs = np.random.RandomState(1)
    num = 1000  # not a multiple of 1024
    p = jnp.asarray(rs.uniform(-30, 30, (num, 3)).astype(np.float32))
    d = rs.normal(size=(num, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_pl, i_pl = closest_analytic_pallas(
        p, d, scene.analytic, meta.analytic_kinds, interpret=True
    )
    assert t_pl.shape == (num,)
    t_ref, _ = closest_analytic(p, d, scene.analytic)
    t_ref = np.asarray(t_ref)
    t_pl = np.asarray(t_pl)
    hits = (t_ref < 1e29) & (t_pl < 1e29)
    rel = np.abs(t_pl[hits] - t_ref[hits]) / np.maximum(t_ref[hits], 1.0)
    assert np.percentile(rel, 99) < 1e-5


def test_full_kernel_matches_xla_attrs():
    """Fused closest+attrs kernel == closest_analytic + analytic_hit_attrs
    on hit lanes (f32 tolerance), interpret mode."""
    import numpy as np
    import jax.numpy as jnp
    from qaray_tpu.ops.pallas_analytic import closest_analytic_full_pallas
    from qaray_tpu.ops import intersect as I
    from qaray_tpu.scene.arrays import AnalyticPrims

    rng = np.random.default_rng(0)
    P = 6
    kinds = (0, 1, 0, 1, 0, 1)
    m = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1)) \
        + 0.05 * rng.standard_normal((P, 3, 3)).astype(np.float32)
    t = rng.uniform(-2, 2, (P, 3)).astype(np.float32)
    prims = AnalyticPrims(
        kind=jnp.asarray(np.array(kinds), jnp.int32),
        mtl=jnp.asarray(rng.integers(0, 5, P).astype(np.int32)),
        m_w2o=jnp.asarray(m), t_o2w=jnp.asarray(t),
    )
    B = 1024
    p = jnp.asarray(
        np.float32(rng.uniform(-1, 1, (B, 3))) + np.float32([0, 0, 6])
    )
    d = rng.standard_normal((B, 3)).astype(np.float32) * 0.3 \
        + np.float32([0, 0, -1])
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    out = closest_analytic_full_pallas(p, d, prims, kinds, True, True)
    t_x, idx_x = I.closest_analytic(p, d, prims)
    hit = np.asarray(t_x) < 1e29
    t_attr = jnp.where(jnp.asarray(hit), t_x, 1.0)
    ax = I.analytic_hit_attrs(p, d, t_attr, idx_x, prims)
    assert (np.asarray(out["prim_idx"]) == np.asarray(idx_x))[hit].all()
    np.testing.assert_allclose(
        np.asarray(out["t"])[hit], np.asarray(t_x)[hit], atol=1e-4, rtol=1e-5
    )
    for k in ("n", "uvw", "p"):
        np.testing.assert_allclose(
            np.asarray(out[k])[hit], np.asarray(ax[k])[hit], atol=1e-4
        )
    assert (np.asarray(out["front"]) == np.asarray(ax["front"]))[hit].all()
    assert (np.asarray(out["mtl"]) == np.asarray(ax["mtl"]))[hit].all()
