"""Pallas tiled-mesh kernel (ops/pallas_tiles.py) vs the XLA tiled sweep.

Same cluster tables, same predicate — the kernel must agree with
ops.mesh_tiles.tiled_sweep on closest winners and occlusion, modulo the
kernel's front-to-back early termination (which only skips clusters that
provably cannot improve)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qaray_tpu.core.constants import BIGFLOAT
from qaray_tpu.ops.mesh_tiles import build_tiles, tiled_sweep
from qaray_tpu.ops.pallas_tiles import pack_coeffT, pallas_tiled_sweep


def _scene(F=4096, B=4096, seed=1):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-10, 10, (F, 3)).astype(np.float32)
    v = c[:, None, :] + rng.uniform(-0.5, 0.5, (F, 3, 3)).astype(np.float32)
    p = np.tile(np.array([[0.0, 0.0, 30.0]], np.float32), (B, 1))
    p += rng.uniform(-2, 2, (B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d[:, 2] -= 1.5  # bias toward the cloud
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return v, jnp.asarray(p), jnp.asarray(d)


@pytest.mark.quick
def test_pallas_tiled_closest_matches_xla():
    v, p, d = _scene()
    tiles = build_tiles(v)
    coeffT = jnp.asarray(pack_coeffT(tiles.coeff, tiles.const))
    t_cur = jnp.full((p.shape[0],), BIGFLOAT)
    t_x, r_x, r2_x = tiled_sweep(p, d, t_cur, tiles)
    t_p, r_p, r2_p, _ = pallas_tiled_sweep(
        p, d, t_cur, tiles, coeffT, interpret=True
    )
    t_x, r_x = np.asarray(t_x), np.asarray(r_x)
    t_p, r_p = np.asarray(t_p), np.asarray(r_p)
    assert (r_x == r_p).mean() > 0.999, (r_x != r_p).mean()
    hit = r_x >= 0
    assert np.allclose(t_x[hit], t_p[hit], rtol=1e-5, atol=1e-5)
    # runner-up optional: only used when the exact re-test rejects the
    # winner; require agreement wherever the winner agrees and both report
    agree = (r_x == r_p) & (np.asarray(r2_x) >= 0) & (np.asarray(r2_p) >= 0)
    assert (np.asarray(r2_x)[agree] == np.asarray(r2_p)[agree]).mean() > 0.99


@pytest.mark.quick
def test_pallas_tiled_anyhit_matches_xla():
    v, p, d = _scene(seed=2)
    tiles = build_tiles(v)
    coeffT = jnp.asarray(pack_coeffT(tiles.coeff, tiles.const))
    rng = np.random.default_rng(3)
    t_max = jnp.asarray(rng.uniform(5, 60, p.shape[0]).astype(np.float32))
    occ_x = np.asarray(tiled_sweep(p, d, t_max, tiles, any_hit=True))
    occ_p = np.asarray(
        pallas_tiled_sweep(p, d, t_max, tiles, coeffT, any_hit=True,
                           interpret=True)
    )
    assert (occ_x == occ_p).all()


@pytest.mark.quick
def test_pallas_tiled_budget_zero_lanes():
    """Zero-budget lanes (the occluded-skip discipline) never report hits."""
    v, p, d = _scene(F=1024, B=2048, seed=4)
    tiles = build_tiles(v)
    coeffT = jnp.asarray(pack_coeffT(tiles.coeff, tiles.const))
    t_max = jnp.zeros((p.shape[0],))
    occ = np.asarray(
        pallas_tiled_sweep(p, d, t_max, tiles, coeffT, any_hit=True,
                           interpret=True)
    )
    assert not occ.any()
    t, r, r2, _ = pallas_tiled_sweep(p, d, t_max, tiles, coeffT, interpret=True)
    assert (np.asarray(r) == -1).all()


def test_twophase_matches_single_phase():
    """tiled_closest_twophase (budgeted march + re-pack + finish) returns
    the same winners as the unlimited single-phase sweep."""
    from qaray_tpu.ops.pallas_tiles import tiled_closest_twophase

    v, p, d = _scene(B=512, seed=4)
    tiles = build_tiles(v)
    coeffT = jnp.asarray(pack_coeffT(tiles.coeff, tiles.const))
    t_cur = jnp.full((p.shape[0],), BIGFLOAT)

    t1, r1, _ = tiled_closest_twophase(p, d, t_cur, tiles, coeffT,
                                       budget=0, interpret=True)
    t2, r2, _ = tiled_closest_twophase(p, d, t_cur, tiles, coeffT,
                                       budget=1, interpret=True)
    t3, r3, _ = tiled_closest_twophase(p, d, t_cur, tiles, coeffT,
                                       budget=4, interpret=True)
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    assert np.array_equal(np.asarray(r1), np.asarray(r3))
    np.testing.assert_allclose(np.asarray(t1)[np.asarray(r1) >= 0],
                               np.asarray(t2)[np.asarray(r1) >= 0])
