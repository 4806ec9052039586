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
