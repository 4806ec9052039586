"""Sharded execution on the 8-device CPU mesh: forward render and gradient
all-reduce (the psum the reference's MPI layer never needed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from qaray_tpu.diff import extract_params, render_with_params
from qaray_tpu.integrators.engine import IntegratorConfig, render_batch
from qaray_tpu.parallel.mesh import make_render_mesh
from qaray_tpu.scene.compiler import compile_scene
from qaray_tpu.scene.xml_parser import load_scene


@pytest.fixture(scope="module")
def setup(inputs_dir):
    scene_desc = load_scene(f"{inputs_dir}/example_project2_blinn.xml")
    scene_desc.camera.img_width = 32
    scene_desc.camera.img_height = 32
    scene, meta = compile_scene(scene_desc)
    cfg = IntegratorConfig(integrator="pathtrace", max_bounce=2, shadow_spp=4)
    n = 32 * 32
    ids = np.arange(n, dtype=np.int32)
    px = jnp.asarray(ids % 32)
    py = jnp.asarray(ids // 32)
    sids = jnp.zeros((n,), jnp.int32)
    key = jax.random.PRNGKey(7)
    return scene, meta, cfg, px, py, sids, key


def test_sharded_forward_matches_single(setup):
    scene, meta, cfg, px, py, sids, key = setup
    r_single, _ = render_batch(scene, meta, cfg, px, py, sids, key)

    mesh = make_render_mesh(jax.devices()[:8])
    sharded = NamedSharding(mesh, P("rays"))
    replicated = NamedSharding(mesh, P())
    r_shard, _ = render_batch(
        jax.device_put(scene, replicated),
        meta,
        cfg,
        jax.device_put(px, sharded),
        jax.device_put(py, sharded),
        jax.device_put(sids, sharded),
        jax.device_put(key, replicated),
    )
    np.testing.assert_allclose(
        np.asarray(r_single), np.asarray(r_shard), atol=1e-5
    )


def test_sharded_gradient_matches_single(setup):
    """Parameter gradients under a sharded batch equal the single-device
    gradients — XLA inserts the cross-device psum over the replicated
    parameter cotangents (ICI on real hardware)."""
    scene, meta, cfg, px, py, sids, key = setup
    params = extract_params(scene)

    def loss(p, scene, px, py, sids, key):
        r = render_with_params(scene, meta, cfg, p, px, py, sids, key)
        return jnp.mean(r)

    g_single = jax.grad(loss)(params, scene, px, py, sids, key)

    mesh = make_render_mesh(jax.devices()[:8])
    sharded = NamedSharding(mesh, P("rays"))
    replicated = NamedSharding(mesh, P())
    g_shard = jax.grad(loss)(
        jax.device_put(params, replicated),
        jax.device_put(scene, replicated),
        jax.device_put(px, sharded),
        jax.device_put(py, sharded),
        jax.device_put(sids, sharded),
        jax.device_put(key, replicated),
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_single), jax.tree_util.tree_leaves(g_shard)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
