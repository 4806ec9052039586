"""Device-side texture sampling from the flat atlas.

Batched port of the reference's texture stack: bilinear tiled file sampling
with v-flip (textures/texture.cpp:97-125), procedural checker
(texture.cpp:129-137), uvw TextureMap transforms (core/texture.cpp:67-82),
TexturedColor = color * map (core/texture.cpp:95-105), and the lat-ish
environment mapping (core/texture.cpp:107-114).

The reference's 32-sample stochastic footprint filter (core/texture.cpp:32-52)
is implemented in `sample_textured_color_filtered`, driven by primary-ray
differentials (see ops/trace.py); secondary hits point-sample, exactly like
the reference's default material (its secondary DiffRays carry
hasDiffRay=false).
"""

import jax.numpy as jnp

from qaray_tpu.scene.arrays import TEX_CHECKER, TextureAtlas


def _tile_clamp(u):
    """Wrap to [0,1) (Texture::TileClamp, core/texture.cpp:53-63)."""
    return u - jnp.floor(u)


def sample_file_texture(atlas: TextureAtlas, tex_id, uvw):
    """Bilinear tiled sample of file textures. tex_id [B], uvw [B,3] -> [B,3]."""
    tid = jnp.maximum(tex_id, 0)
    w = atlas.width[tid]
    h = atlas.height[tid]
    off = atlas.offset[tid]
    # v-flip then tile (TextureFile::Sample).
    u = _tile_clamp(uvw[..., 0])
    v = _tile_clamp(1.0 - uvw[..., 1])
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    x = wf * u
    y = hf * v
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    fx = x - ix.astype(jnp.float32)
    fy = y - iy.astype(jnp.float32)
    w_safe = jnp.maximum(w, 1)
    h_safe = jnp.maximum(h, 1)
    ix = jnp.clip(ix, 0, w_safe - 1)
    iy = jnp.clip(iy, 0, h_safe - 1)
    ixp = jnp.where(ix + 1 >= w_safe, 0, ix + 1)
    iyp = jnp.where(iy + 1 >= h_safe, 0, iy + 1)

    def texel(yy, xx):
        return atlas.texels[off + yy * w_safe + xx]

    c00 = texel(iy, ix)
    c10 = texel(iy, ixp)
    c01 = texel(iyp, ix)
    c11 = texel(iyp, ixp)
    fx = fx[..., None]
    fy = fy[..., None]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )


def sample_checker(atlas: TextureAtlas, tex_id, uvw):
    """TextureChecker::Sample (textures/texture.cpp:129-137)."""
    tid = jnp.maximum(tex_id, 0)
    u = _tile_clamp(uvw[..., 0])
    v = _tile_clamp(uvw[..., 1])
    take1 = (u <= 0.5) == (v <= 0.5)
    return jnp.where(take1[..., None], atlas.color1[tid], atlas.color2[tid])


def sample_texture(atlas: TextureAtlas, tex_id, uvw):
    """Dispatch by texture kind; tex_id -1 lanes return 0 (caller masks)."""
    tid = jnp.maximum(tex_id, 0)
    is_checker = atlas.kind[tid] == TEX_CHECKER
    c = jnp.where(
        is_checker[..., None],
        sample_checker(atlas, tex_id, uvw),
        sample_file_texture(atlas, tex_id, uvw),
    )
    return jnp.where((tex_id >= 0)[..., None], c, jnp.zeros_like(c))


def sample_textured_color(atlas, color, tex_id, tex_m, tex_t, uvw, has_texture):
    """TexturedColor::Sample: color * map.Sample(TransformTo(uvw)).

    color [B,3], tex_id [B], tex_m [B,3,3], tex_t [B,3], uvw [B,3].
    Lanes without a hit texture coordinate (has_texture False) or without a
    map return the flat color (core/texture.cpp:95-105).
    """
    u = jnp.einsum("bij,bj->bi", tex_m, uvw - tex_t, precision="highest")
    tex = sample_texture(atlas, tex_id, u)
    use_tex = (tex_id >= 0) & has_texture
    return jnp.where(use_tex[..., None], color * tex, color)


def _elliptic_offsets():
    """Static Halton(2,3) elliptic footprint offsets (core/texture.cpp:38-44,
    TEXTURE_SAMPLE_COUNT=32; i=0 is the center sample handled separately)."""
    import numpy as np

    from qaray_tpu.core.halton import halton_np

    i = np.arange(1, 32)
    hx = halton_np(i, 2)
    hy = halton_np(i, 3)
    r = np.sqrt(hx) * 0.5
    x = r * np.sin(hy * 2.0 * np.pi)
    y = r * np.cos(hy * 2.0 * np.pi)
    return jnp.asarray(x.astype("float32")), jnp.asarray(y.astype("float32"))


def sample_textured_color_filtered(atlas, color, tex_id, tex_m, tex_t, uvw,
                                   duvw0, duvw1, has_texture):
    """TexturedColor::Sample with the stochastic elliptic footprint filter
    (core/texture.cpp:32-52 + TextureMap duvw transform at :67-82).

    duvw0/duvw1: d(uvw)/d(pixel) in pre-transform uv space, [B, 3]. Lanes
    with zero footprint reduce to the point sample (reference early-out)."""
    u = jnp.einsum("bij,bj->bi", tex_m, uvw - tex_t, precision="highest")
    d0 = jnp.einsum("bij,bj->bi", tex_m, duvw0, precision="highest")
    d1 = jnp.einsum("bij,bj->bi", tex_m, duvw1, precision="highest")

    xs, ys = _elliptic_offsets()
    # [B, 31, 3] footprint sample positions.
    pos = (
        u[:, None, :]
        + xs[None, :, None] * d0[:, None, :]
        + ys[None, :, None] * d1[:, None, :]
    )
    num = u.shape[0]
    flat = pos.reshape(num * 31, 3)
    tex_rep = jnp.repeat(tex_id, 31)
    samples = sample_texture(atlas, tex_rep, flat).reshape(num, 31, 3)
    center = sample_texture(atlas, tex_id, u)
    filtered = (center + jnp.sum(samples, axis=1)) / 32.0

    zero_fp = (
        jnp.sum(d0 * d0, axis=-1) + jnp.sum(d1 * d1, axis=-1)
    ) == 0.0
    tex = jnp.where(zero_fp[:, None], center, filtered)
    use_tex = (tex_id >= 0) & has_texture
    return jnp.where(use_tex[:, None], color * tex, color)


def sample_environment(atlas, env, d):
    """TexturedColor::SampleEnvironment (core/texture.cpp:107-114).

    env: EnvColor; d [B,3] (normalized ray direction). Returns [B,3].
    """
    z = jnp.arcsin(jnp.clip(-d[..., 2], -1.0, 1.0)) / jnp.pi + 0.5
    denom = jnp.abs(d[..., 0]) + jnp.abs(d[..., 1])
    denom = jnp.where(denom < 1e-20, 1e-20, denom)
    x = d[..., 0] / denom
    y = d[..., 1] / denom
    u = 0.5 + z * (x * 0.5 - y * 0.5)
    v = 0.5 + z * (x * 0.5 + y * 0.5)
    uvw = jnp.stack([u, v, jnp.zeros_like(u)], axis=-1)
    return _env_sample_at(atlas, env, uvw)


def sample_background(atlas, env, uvw):
    """Background sampled with screen-space uv (renderer.cpp:335-339)."""
    return _env_sample_at(atlas, env, uvw)


def _env_sample_at(atlas, env, uvw):
    num = uvw.shape[0]
    tex_id = jnp.broadcast_to(env.tex_id, (num,))
    tex_m = jnp.broadcast_to(env.tex_m, (num, 3, 3))
    tex_t = jnp.broadcast_to(env.tex_t, (num, 3))
    color = jnp.broadcast_to(env.color, (num, 3))
    has = jnp.ones((num,), bool)
    return sample_textured_color(atlas, color, tex_id, tex_m, tex_t, uvw, has)
