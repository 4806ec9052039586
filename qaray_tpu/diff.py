"""Differentiable rendering: gradients of radiance w.r.t. scene parameters.

The reference has no backward pass at all; this is the framework's
north-star extension. The whole wavefront engine is pure jnp, so `jax.grad`
flows through shading math automatically; what makes the estimator correct
is *detached sampling* (stop_gradient on sampled continuation directions and
RR selection probabilities, applied inside the engine):

    E[L] = sum_lobes p_i * (BxDF_i / p_i) * L_i = sum_i BxDF_i * L_i
    dE/dtheta = sum_i d(BxDF_i)/dtheta * L_i   (+ light/texture terms)

so dropping the sensitivity of p_i and of the sampled directions yields
exactly the gradient of the expectation for material/light/texture
parameters (geometry edge terms are out of scope, matching the BASELINE
north star: gradients w.r.t. material, light and texture parameters).

Gradients are taken w.r.t. a `DiffParams` bundle spliced into the scene, so
callers get a small, well-typed gradient pytree instead of a full
SceneArrays cotangent. Works under jit/shard_map; gradients across a device
mesh are summed by XLA (the psum the reference never needed).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from qaray_tpu.integrators.engine import IntegratorConfig, render_batch
from qaray_tpu.scene.arrays import SceneArrays


class DiffParams(NamedTuple):
    """The differentiable parameter bundle (a sub-pytree of SceneArrays)."""

    mtl_diffuse: jnp.ndarray  # [M, 3]
    mtl_specular: jnp.ndarray  # [M, 3]
    mtl_emission: jnp.ndarray  # [M, 3]
    mtl_reflection: jnp.ndarray  # [M, 3]
    mtl_refraction: jnp.ndarray  # [M, 3]
    mtl_glossiness: jnp.ndarray  # [M]
    light_intensity: jnp.ndarray  # [L, 3]
    texture_texels: jnp.ndarray  # [T, 3]
    background: jnp.ndarray  # [3]
    environment: jnp.ndarray  # [3]


def extract_params(scene: SceneArrays) -> DiffParams:
    return DiffParams(
        mtl_diffuse=scene.materials.diffuse,
        mtl_specular=scene.materials.specular,
        mtl_emission=scene.materials.emission,
        mtl_reflection=scene.materials.reflection,
        mtl_refraction=scene.materials.refraction,
        mtl_glossiness=scene.materials.glossiness,
        light_intensity=scene.lights.intensity,
        texture_texels=scene.textures.texels,
        background=scene.background.color,
        environment=scene.environment.color,
    )


def splice_params(scene: SceneArrays, params: DiffParams) -> SceneArrays:
    return scene._replace(
        materials=scene.materials._replace(
            diffuse=params.mtl_diffuse,
            specular=params.mtl_specular,
            emission=params.mtl_emission,
            reflection=params.mtl_reflection,
            refraction=params.mtl_refraction,
            glossiness=params.mtl_glossiness,
        ),
        lights=scene.lights._replace(intensity=params.light_intensity),
        textures=scene.textures._replace(texels=params.texture_texels),
        background=scene.background._replace(color=params.background),
        environment=scene.environment._replace(color=params.environment),
    )


def render_with_params(scene, meta, cfg, params: DiffParams, px, py,
                       sample_ids, key):
    """Radiance [B,3] as a function of the differentiable bundle.

    Drives the XLA wavefront engine directly: under value_and_grad the
    megakernel's custom_vjp would re-run the XLA forward anyway for its
    residuals (double work); going straight to the engine keeps the Pallas
    closest-hit custom_vjp fast path and halves the joint fwd+bwd cost.
    render_batch (and its megakernel) stays differentiable for callers who
    grad through it themselves."""
    from qaray_tpu.integrators.engine import render_batch_xla

    radiance, _ = render_batch_xla(
        splice_params(scene, params), meta, cfg, px, py, sample_ids, key
    )
    return radiance


def _unpack_adjoint(flat, meta, scene) -> DiffParams:
    """ops/pallas_adjoint.param_layout flat vector -> DiffParams pytree."""
    m = meta.num_materials
    ll = meta.num_lights
    mt = flat[: m * 16].reshape(m, 16)
    lb = m * 16
    return DiffParams(
        mtl_diffuse=mt[:, 0:3],
        mtl_specular=mt[:, 3:6],
        mtl_emission=mt[:, 6:9],
        mtl_reflection=mt[:, 9:12],
        mtl_refraction=mt[:, 12:15],
        mtl_glossiness=mt[:, 15],
        light_intensity=flat[lb : lb + ll * 3].reshape(ll, 3),
        texture_texels=jnp.zeros_like(scene.textures.texels),
        background=flat[lb + ll * 3 : lb + ll * 3 + 3],
        environment=flat[lb + ll * 3 + 3 : lb + ll * 3 + 6],
    )


@partial(jax.jit, static_argnames=("meta", "cfg"))
def render_value_and_grad(scene, meta, cfg, px, py, sample_ids, key,
                          target=None):
    """(loss, DiffParams gradients) for one sample round.

    loss = mean(radiance) when target is None, else mean((radiance-target)^2)
    — the latter is the inverse-rendering objective.

    Fast path: on megakernel-eligible pathtrace scenes the gradient comes
    from the fused Pallas adjoint kernel (ops/pallas_adjoint.py) — forward
    megakernel + one adjoint dispatch, instead of the XLA engine's
    elementwise vjp (r04: ~50x off the forward). The adjoint replays the
    forward's threefry draws, so it is the exact gradient of the same
    estimator; equivalence vs the XLA vjp is tested to ~1e-4
    (tests/test_grad.py).
    """
    from qaray_tpu.integrators.engine import use_pathtrace_mega
    from qaray_tpu.ops.pallas_adjoint import adjoint_render, adjoint_supported

    if adjoint_supported(meta, cfg) and use_pathtrace_mega(meta, cfg):
        from qaray_tpu.ops.pallas_pathtrace import mega_render

        kd = jax.random.key_data(key)
        impl = "rbg" if kd.shape[-1] == 4 else "threefry2x32"
        interpret = jax.default_backend() != "tpu"
        radiance, _ = mega_render(
            scene, meta, cfg, impl, interpret, px, py, sample_ids, kd
        )
        n = radiance.size
        if target is None:
            loss = jnp.mean(radiance)
            ct = jnp.full_like(radiance, 1.0 / n)
        else:
            loss = jnp.mean((radiance - target) ** 2)
            ct = 2.0 * (radiance - target) / n
        flat = adjoint_render(scene, meta, cfg, px, py, sample_ids, kd, ct,
                              interpret)
        return loss, _unpack_adjoint(flat, meta, scene)

    params = extract_params(scene)

    def loss_fn(p):
        radiance = render_with_params(scene, meta, cfg, p, px, py, sample_ids, key)
        if target is None:
            return jnp.mean(radiance)
        return jnp.mean((radiance - target) ** 2)

    return jax.value_and_grad(loss_fn)(params)
