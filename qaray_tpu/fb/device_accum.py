"""Device-resident framebuffer accumulation.

The reference accumulates per-pixel Welford state in host memory as each
TBB task finishes (scene/scene.cpp:113-123 via renderer.cpp:302-366). The
r04 renderer did the same with numpy — which meant every render round
pulled the full radiance batch through the tunneled runtime's ~25 MB/s
device->host link: ~1 s/round against a ~0.2 s dispatch, a 5-7x
end-to-end tax (the xmas 787 s-projected vs 1068 s-measured gap of
BASELINE.md).

Here the accumulator planes LIVE ON DEVICE: each round's radiance feeds a
jitted scatter update (same exact recurrence), and only scalars
(escalation counts) cross the link per round. The host FrameBuffer
becomes a mirror, synced on demand (checkpoints, previews, convergence
reads, final image).

State rows are N+1: row N is a dump row for padding lanes, so scatter
updates need no active-lane masking against real pixels.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def init_state(fb, want_irr: bool = False):
    """Host FrameBuffer -> device accumulator state (resume-compatible)."""
    n = fb.width * fb.height
    state = {
        "mean": jnp.asarray(np.pad(fb.mean, ((0, 1), (0, 0)))),
        "std": jnp.asarray(np.pad(fb.color_std, ((0, 1), (0, 0)))),
        "count": jnp.asarray(np.pad(fb.count, (0, 1))),
    }
    if want_irr:
        state["irr"] = jnp.asarray(
            np.pad(fb.irrad.astype(np.float32) / 255.0, (0, 1))
        )
    return state


@jax.jit
def accumulate_round(state, pixel_ids, colors, skip=None, irr=None):
    """One new sample per pixel id (ids unique within a call; padding lanes
    carry id == N, the dump row).

    Exact port of FrameBuffer.accumulate / SuperSamplerHalton::Accumulate
    (scene/scene.cpp:113-123):
        dc   = (x - mean) / (s + 1)
        mean += dc
        std  += s > 0 ? dc^2 * (s+1) - std / s : 0

    skip: optional bool [B] — lanes NOT folded this call (gather-escalated
    lanes whose radiance will be corrected and folded by a follow-up call).
    irr: optional bool [B] — max-folds the irradiance debug plane.
    Returns (new_state, num_skipped).
    """
    ids = pixel_ids.astype(jnp.int32)
    if skip is not None:
        # Skipped lanes write to the dump row instead of their pixel.
        dump = jnp.int32(state["mean"].shape[0] - 1)
        ids = jnp.where(skip, dump, ids)
        n_skip = jnp.sum(skip.astype(jnp.int32))
    else:
        n_skip = jnp.int32(0)
    s = state["count"][ids].astype(jnp.float32)[:, None]
    m = state["mean"][ids]
    dc = (colors - m) / (s + 1.0)
    new_mean = m + dc
    stdv = state["std"][ids]
    upd = dc * dc * (s + 1.0) - stdv / jnp.maximum(s, 1.0)
    new_std = stdv + jnp.where(s > 0, upd, 0.0)
    out = {
        "mean": state["mean"].at[ids].set(new_mean),
        "std": state["std"].at[ids].set(new_std),
        "count": state["count"].at[ids].set(state["count"][ids] + 1),
    }
    if "irr" in state:
        plane = state["irr"]
        if irr is not None:
            plane = plane.at[ids].max(irr.astype(jnp.float32))
        out["irr"] = plane
    return out, n_skip


@jax.jit
def accumulate_contig(state, start, colors, skip=None, irr=None):
    """accumulate_round for a CONTIGUOUS pixel-id range [start, start+B).

    Phase-1 rounds sweep the image in contiguous chunks, which turns the
    gather/scatter update into dynamic slices — measured 23x cheaper on
    this runtime (8.7 ms vs 197 ms for a 1.08M-pixel round). Skipped
    (gather-escalated) lanes keep their old row values and count.
    """
    b = colors.shape[0]
    start = jnp.asarray(start, jnp.int32)

    def upd(plane, new, old):
        return jax.lax.dynamic_update_slice_in_dim(plane, new, start, 0)

    s_i = jax.lax.dynamic_slice_in_dim(state["count"], start, b)
    s = s_i.astype(jnp.float32)[:, None]
    m = jax.lax.dynamic_slice_in_dim(state["mean"], start, b)
    dc = (colors - m) / (s + 1.0)
    new_mean = m + dc
    stdv = jax.lax.dynamic_slice_in_dim(state["std"], start, b)
    updv = dc * dc * (s + 1.0) - stdv / jnp.maximum(s, 1.0)
    new_std = stdv + jnp.where(s > 0, updv, 0.0)
    new_count = s_i + 1
    if skip is not None:
        keep = skip[:, None]
        new_mean = jnp.where(keep, m, new_mean)
        new_std = jnp.where(keep, stdv, new_std)
        new_count = jnp.where(skip, s_i, new_count)
        n_skip = jnp.sum(skip.astype(jnp.int32))
    else:
        n_skip = jnp.int32(0)
    out = {
        "mean": upd(state["mean"], new_mean, m),
        "std": upd(state["std"], new_std, stdv),
        "count": upd(state["count"], new_count, s_i),
    }
    if "irr" in state:
        plane = state["irr"]
        if irr is not None:
            cur = jax.lax.dynamic_slice_in_dim(plane, start, b)
            plane = jax.lax.dynamic_update_slice_in_dim(
                plane, jnp.maximum(cur, irr.astype(jnp.float32)), start, 0
            )
        out["irr"] = plane
    return out, n_skip


@partial(jax.jit, static_argnames=("channels",))
def _unconverged(state, threshold, spp, channels: int = 3):
    """Pixels still over the adaptive threshold at exactly `spp` samples
    (FrameBuffer.converged negated + the renderer's count == s guard)."""
    over = jnp.any(state["std"][:-1] > threshold[None, :], axis=-1)
    return over & (state["count"][:-1] == spp)


def unconverged_ids(state, threshold, spp) -> np.ndarray:
    """Host-side active-pixel compaction input: fetches one bool plane."""
    mask = np.asarray(
        _unconverged(state, jnp.asarray(threshold, jnp.float32), spp)
    )
    return np.nonzero(mask)[0].astype(np.int32)


def sync_to_fb(state, fb):
    """Pull the device planes into the host FrameBuffer mirror."""
    fb.mean = np.asarray(state["mean"][:-1])
    fb.color_std = np.asarray(state["std"][:-1])
    fb.count = np.asarray(state["count"][:-1])
    if "irr" in state:
        fb.irrad = (np.asarray(state["irr"][:-1]) * 255.0).astype(np.uint8)
    return fb
