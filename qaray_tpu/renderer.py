"""Renderer: adaptive-supersampling render loop over sample rounds.

The reference renders 4x4 pixel tiles with TBB threads, each pixel running
its own adaptive sample loop (renderer.cpp:302-423). The TPU-native shape is
inverted: ALL active pixels advance one sample per device dispatch
(vectorization replaces threading), and adaptive sampling becomes host-side
*active-pixel compaction* between rounds — converged pixels leave the batch,
matching SuperSamplerHalton's stopping rule exactly
(scene/scene.cpp:92-98: stop when s >= sppMin and channel std <= threshold,
hard stop at sppMax).

Cooperative cancellation (reference tasking signal_start/stop) maps to a
host-checked `stop_flag` between dispatches; progress accounting mirrors
FrameBuffer::IncrementNumRenderPixel.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import numpy as np

from qaray_tpu.core.constants import BIGFLOAT, SPP_THRESHOLD
from qaray_tpu.fb.framebuffer import FrameBuffer
from qaray_tpu.integrators.engine import IntegratorConfig, render_batch
from qaray_tpu.scene.compiler import compile_scene


@dataclasses.dataclass
class RendererParam:
    """Mirrors the reference RendererParam defaults (renderer.h:47-68)."""

    use_srgb: bool = True
    spp_max: int = 8
    spp_min: int = 4
    max_bounce: int = 5
    integrator: str = "photonmap"
    use_photon_map: bool = False
    photon_map_size: int = 10000
    photon_map_bounce: int = 20
    photon_map_radius: float = 0.2
    caustics_map_size: int = 1000
    caustics_map_bounce: int = 20
    caustics_map_radius: float = 1.0
    shadow_spp: int = 16  # GenLight::shadow_spp_min (lights.cpp:16)
    shadow_spp_max: int = 64  # GenLight::shadow_spp_max (lights.cpp:17)
    mc_samples: int = 10  # MtlBlinn_MonteCarloGI maxMCSample (mcgi only)
    threshold: tuple = SPP_THRESHOLD
    seed: int = 0
    # 'rbg': fast TPU RngBitGenerator, ~1.4x end-to-end, deterministic for a
    # fixed dispatch layout but draws change if the batch layout changes
    # (packing/compaction/resume). 'threefry2x32': bit-stable per
    # (pixel, sample) at any layout or device count.
    rng_impl: str = "rbg"
    round_spp: int = 1  # samples per adaptive round after spp_min
    batch_pixels: int = 1 << 20  # max pixel-lanes per device dispatch
    num_devices: int = 0  # 0/1 = single device; >1 = shard over a mesh
    progressive_every: int = 0  # save colorBuffer every N spp (0 = off)
    progressive_prefix: str = ""
    # Multihost observability (-rank-debug): track which pixels' lanes were
    # computed by THIS process's shards (the per-rank pre-gather debug PNGs
    # of Renderer_MPI.cpp:134-138).
    rank_debug: bool = False
    checkpoint_every: int = 0  # save resume state every N spp (0 = off)
    checkpoint_path: str = "render_checkpoint.npz"


def _pad_to_bucket(n: int, minimum: int = 256) -> int:
    """Round up to a power of two to bound recompilations under compaction."""
    b = minimum
    while b < n:
        b <<= 1
    return b


def _is_contig(ids: np.ndarray) -> bool:
    """Consecutive ascending pixel ids (phase-1 chunks; sorted producers)."""
    return ids.size > 0 and bool(np.all(np.diff(ids) == 1))


class Renderer:
    def __init__(self, param: Optional[RendererParam] = None):
        self.param = param or RendererParam()
        self.stop_flag = False
        self.scene_arrays = None
        self.meta = None
        self.fb: Optional[FrameBuffer] = None
        self.photon_maps = None
        self._progress_cb: Optional[Callable] = None
        self._render_fn = render_batch
        self._mesh = None
        if self.param.num_devices > 1:
            from qaray_tpu.parallel.mesh import make_render_mesh, shard_render_batch

            mesh = make_render_mesh(jax.devices()[: self.param.num_devices])
            self._render_fn = shard_render_batch(mesh)
            self._mesh = mesh

    # -- lifecycle (reference Renderer::Init/ComputeScene/Render) -------------

    def compute_scene(self, scene_desc, world_bvh: bool = True):
        self.scene_arrays, self.meta = compile_scene(scene_desc, world_bvh=world_bvh)
        self.fb = FrameBuffer(self.meta.img_width, self.meta.img_height)
        if self.param.use_photon_map:
            from qaray_tpu.photon.build import build_photon_maps, save_photon_map
            from qaray_tpu.photon.cluster import cluster_photon_map

            gmap, cmap = build_photon_maps(
                self.scene_arrays, self.meta, self.param
            )
            # Morton-clustered device tables for the in-kernel Pallas gather
            # (ops/pallas_photon.py); the exact XLA paths ignore them.
            self.photon_maps = (cluster_photon_map(gmap),
                                cluster_photon_map(cmap))
            # Reference dumps both maps for the viz tool
            # (renderer.cpp:204-209, 284-289); same files, same layout.
            save_photon_map(self.photon_maps[0], "photonmap.dat")
            save_photon_map(self.photon_maps[1], "caustics.dat")
        if self._mesh is not None:
            # Replicate the scene over the device mesh ONCE (the MPI analog:
            # every rank loads the full scene, Renderer_MPI.cpp:54). The
            # per-dispatch device_put in the shard wrapper then sees
            # identically-placed committed arrays and is a no-op, instead of
            # a per-round host->ICI broadcast of the whole scene.
            from qaray_tpu.parallel.mesh import device_put_replicated

            self.scene_arrays = device_put_replicated(self.scene_arrays, self._mesh)
            if self.photon_maps is not None:
                self.photon_maps = device_put_replicated(
                    self.photon_maps, self._mesh
                )
        return self.scene_arrays, self.meta

    def _effective_batch(self) -> int:
        """Device batch in pixel-lanes; the MC-GI expansion widens the
        wavefront mc_samples-fold after the first bounce, so its dispatches
        start proportionally smaller."""
        p = self.param
        if p.integrator == "mcgi" and p.mc_samples > 1:
            return max(1, p.batch_pixels // p.mc_samples)
        return p.batch_pixels

    def _want_aux(self) -> bool:
        """Request the irradiance-computation debug plane from the engine
        (only meaningful for the photon-map integrator)."""
        return self.param.integrator == "photonmap" and self.param.use_photon_map

    def signal_stop(self):
        self.stop_flag = True

    def set_progress_callback(self, cb):
        self._progress_cb = cb

    # -- config ---------------------------------------------------------------

    def integrator_config(self) -> IntegratorConfig:
        p = self.param
        inv_sq = p.integrator in ("photonmap", "pathtrace", "mcgi")
        return IntegratorConfig(
            integrator=p.integrator,
            max_bounce=p.max_bounce,
            shadow_spp=p.shadow_spp,
            shadow_spp_max=p.shadow_spp_max,
            mc_samples=p.mc_samples,
            inverse_square_falloff=inv_sq,
            use_photon_map=p.use_photon_map,
        )

    # -- render loop -----------------------------------------------------------

    def render(self) -> FrameBuffer:
        assert self.scene_arrays is not None, "call compute_scene() first"
        p = self.param
        meta = self.meta
        cfg = self.integrator_config()
        fb = self.fb
        w, h = meta.img_width, meta.img_height
        num_pixels = w * h
        base_key = jax.random.key(p.seed, impl=p.rng_impl)
        self._base_key = base_key
        # Photon-gathering megakernel dispatches append a per-lane
        # escalation flag (gather saw > GATHER_K in-radius photons); those
        # lanes are re-rendered on the exact XLA top-k path at retire time.
        from qaray_tpu.integrators.engine import use_pathtrace_mega

        self._mega_photon = bool(
            cfg.use_photon_map
            and use_pathtrace_mega(meta, cfg, self.photon_maps)
        )
        # Accumulation planes live ON DEVICE (fb/device_accum.py): render
        # rounds feed a jitted scatter update and only scalars cross the
        # device->host link per round; the host FrameBuffer is a mirror
        # synced at checkpoints/previews/end.
        from qaray_tpu.fb.device_accum import init_state

        self._accum = init_state(fb, want_irr=self._want_aux())
        self._rank_mask = (
            np.zeros(num_pixels, np.int32)
            if (p.rank_debug and self._mesh is not None)
            else None
        )

        all_ids = np.arange(num_pixels, dtype=np.int32)
        start = time.time()

        # Phase 1: spp_min samples for every pixel. Pack several sample
        # indices into one dispatch when the image alone underfills the
        # device batch (small images hit peak throughput only at ~0.5M
        # lanes) — lanes = pixels x samples.
        # Resume support: continue from the smallest per-pixel sample count
        # (a loaded checkpoint has uniform counts at round boundaries).
        s_start = int(fb.count.min())

        if num_pixels <= self._effective_batch():
            pack = max(1, self._effective_batch() // max(num_pixels, 1))
            s = s_start
            while s < p.spp_min:
                if self.stop_flag:
                    self.sync_fb()
                    return fb
                k = min(pack, p.spp_min - s)
                self._render_packed(cfg, all_ids, list(range(s, s + k)),
                                    base_key, record_depth=(s == 0))
                s += k
                self._report(s)
                self._maybe_checkpoint(s)
        else:
            for s in range(s_start, p.spp_min):
                if self.stop_flag:
                    self.sync_fb()
                    return fb
                self._render_round(cfg, all_ids, s, base_key,
                                   record_depth=(s == 0))
                self._report(s + 1)
                self._maybe_checkpoint(s + 1)

        # Phase 2: adaptive refinement until spp_max / convergence,
        # compacting to the unconverged active set each round. The
        # convergence mask is computed on device and fetched as one bool
        # plane; escalation fixes require the pipeline retired first.
        from qaray_tpu.fb.device_accum import unconverged_ids

        s = p.spp_min
        while s < p.spp_max:
            self._flush()
            active = unconverged_ids(self._accum, p.threshold, s)
            if active.size == 0 or self.stop_flag:
                break
            for _ in range(min(p.round_spp, p.spp_max - s)):
                self._render_round(cfg, active, s, base_key, record_depth=False)
                s += 1
                if s >= p.spp_max:
                    break
            self._report(s)

        self.sync_fb()
        elapsed = time.time() - start
        self._last_elapsed = elapsed
        fb.finalize(p.use_srgb, p.spp_max)
        return fb

    def _mark_ownership(self, ids_p: np.ndarray):
        """-rank-debug: record which pixels this PROCESS's shards computed.

        The 1-D ray mesh splits the padded lane axis evenly over devices in
        mesh order; lanes on local devices are ours (the per-rank ownership
        of Renderer_MPI's static round-robin, Renderer_MPI.cpp:134-138)."""
        if getattr(self, "_rank_mask", None) is None:
            return
        devs = list(self._mesh.devices.flatten())
        shard = ids_p.size // len(devs)
        npx = self._rank_mask.size
        for i, d in enumerate(devs):
            if d.process_index == jax.process_index():
                sl = ids_p[i * shard : (i + 1) * shard]
                np.add.at(self._rank_mask, sl[sl < npx], 1)

    def save_rank_debug(self, prefix: str, rank: int):
        """Write this process's pre-gather ownership + spp planes
        (Renderer_MPI.cpp:134-138 per-rank PNG analog)."""
        if getattr(self, "_rank_mask", None) is None:
            return
        fb = self.fb
        # Raw per-pixel owned-sample counts: the ranks' planes sum to the
        # per-pixel spp (lane decomposition replaces the reference's
        # pixel-tile round-robin, so per-pixel ownership is fractional).
        fb.save_png(f"{prefix}rank{rank}_maskBuffer.png",
                    np.clip(self._rank_mask, 0, 255).astype(np.uint8))
        spp = getattr(fb, "sample_count_u8", None)
        if spp is None:
            fb.finalize(self.param.use_srgb, self.param.spp_max)
            spp = fb.sample_count_u8
        fb.save_png(f"{prefix}rank{rank}_sampleBuffer.png",
                    np.where(self._rank_mask > 0, spp, 0).astype(np.uint8))


    def sync_fb(self):
        """Retire in-flight work and mirror the device accumulator into the
        host FrameBuffer (checkpoints, previews, probes, final image)."""
        self._flush()
        if getattr(self, "_accum", None) is not None:
            from qaray_tpu.fb.device_accum import sync_to_fb

            sync_to_fb(self._accum, self.fb)
        return self.fb

    def _render_packed(self, cfg, pixel_ids: np.ndarray, sample_indices,
                       base_key, record_depth: bool):
        """Dispatch len(sample_indices) samples per pixel in one batch, then
        fold them into the device accumulator in sample order (the Welford
        recurrence is order-sensitive; order matches the reference loop)."""
        from qaray_tpu.fb.device_accum import accumulate_round

        meta = self.meta
        w = meta.img_width
        num_pixels = pixel_ids.size
        num_samples = len(sample_indices)
        ids_tiled = np.tile(pixel_ids, num_samples)
        sids = np.repeat(np.asarray(sample_indices, np.int32), num_pixels)
        n = ids_tiled.size
        padded = _pad_to_bucket(n)
        dump_row = meta.img_width * meta.img_height
        ids_p = np.full(padded, dump_row, np.int32)
        ids_p[:n] = ids_tiled
        sids_p = np.zeros(padded, np.int32)
        sids_p[:n] = sids
        self._mark_ownership(ids_p)
        out = self._render_fn(
            self.scene_arrays, meta, cfg,
            jax.numpy.asarray(ids_p % w), jax.numpy.asarray(ids_p // w),
            jax.numpy.asarray(sids_p), base_key, self.photon_maps,
            want_aux=self._want_aux(),
        )
        radiance = out[0]
        esc = out[-1] if self._mega_photon else None
        irr = out[2] if (self._want_aux() and len(out) > 2) else None
        contig = _is_contig(pixel_ids)
        from qaray_tpu.fb.device_accum import accumulate_contig

        dev_ids = None if contig else jax.numpy.asarray(pixel_ids)
        n_skips = []
        for k in range(num_samples):
            lo, hi = k * num_pixels, (k + 1) * num_pixels
            if contig:
                res = accumulate_contig(
                    self._accum, int(pixel_ids[0]), radiance[lo:hi],
                    skip=esc[lo:hi] if esc is not None else None,
                    irr=irr[lo:hi] if irr is not None else None,
                )
            else:
                res = accumulate_round(
                    self._accum, dev_ids, radiance[lo:hi],
                    skip=esc[lo:hi] if esc is not None else None,
                    irr=irr[lo:hi] if irr is not None else None,
                )
            self._accum, n_skip = res
            n_skips.append(n_skip)
        if record_depth:
            self.fb.set_depth(pixel_ids, np.asarray(out[1])[:num_pixels])
        # Escalated lanes (rare): fold their exact-XLA radiance per sample,
        # in sample order.
        for k in range(num_samples):
            if int(n_skips[k]) == 0:
                continue
            lo = k * num_pixels
            mask = np.asarray(esc[lo : lo + num_pixels])
            self._accumulate_escalated(
                pixel_ids, np.full(num_pixels, sample_indices[k], np.int32),
                mask,
            )

    def _render_round(self, cfg, pixel_ids: np.ndarray, sample_idx: int,
                      base_key, record_depth: bool):
        """One sample for each pixel id, chunked to the device batch size.

        The render dispatch feeds the device accumulator directly (a data
        dependency — no host transfer); dispatches stay PIPELINED one deep,
        and the only per-round host read is the previous chunk's skipped-
        lane count (one scalar). `_retire_inflight` performs the rare
        escalation fix-ups; callers that need the host framebuffer current
        sync via `sync_fb`."""
        from qaray_tpu.fb.device_accum import (
            accumulate_contig,
            accumulate_round,
        )

        meta = self.meta
        w = meta.img_width
        dump_row = meta.img_width * meta.img_height
        chunk = self._effective_batch()
        for lo in range(0, pixel_ids.size, chunk):
            ids = pixel_ids[lo : lo + chunk]
            n = ids.size
            padded = _pad_to_bucket(n)
            ids_p = np.full(padded, dump_row, np.int32)
            ids_p[:n] = ids
            self._mark_ownership(ids_p)
            px = jax.numpy.asarray(ids_p % w)
            py = jax.numpy.asarray(ids_p // w)
            sample_ids = jax.numpy.full((padded,), sample_idx, jax.numpy.int32)
            out = self._render_fn(
                self.scene_arrays, meta, cfg, px, py, sample_ids, base_key,
                self.photon_maps, want_aux=self._want_aux(),
            )
            esc = out[-1] if self._mega_photon else None
            irr = out[2] if (self._want_aux() and len(out) > 2) else None
            if _is_contig(ids):
                # Phase-1 chunks sweep contiguous pixel ranges: the
                # dynamic-slice update is ~23x cheaper than the scatter.
                self._accum, n_skip = accumulate_contig(
                    self._accum, int(ids[0]), out[0][:n],
                    skip=esc[:n] if esc is not None else None,
                    irr=irr[:n] if irr is not None else None,
                )
            else:
                dev_ids = jax.numpy.asarray(ids_p)
                self._accum, n_skip = accumulate_round(
                    self._accum, dev_ids, out[0], skip=esc, irr=irr
                )
            pending = (ids, sample_idx, out, n_skip, record_depth)
            self._retire_inflight()
            self._inflight = pending

    def _accumulate_escalated(self, pixel_ids, sids, esc_mask):
        """Re-render gather-escalated lanes on the exact XLA path and fold
        their radiance into the accumulator.

        The megakernel gathers with r_eff = radius, exact while at most
        GATHER_K photons lie in radius (photon/cluster.py); lanes over the
        cap carry the reference's radius-shrink semantics instead
        (EstimateIrradiance<100>) — recompute exactly those lanes with the
        wavefront engine (same threefry draws => same paths). Their samples
        were skipped by the main accumulate (dump row), so the fold here
        keeps per-pixel counts exact.
        """
        from qaray_tpu.fb.device_accum import accumulate_round
        from qaray_tpu.integrators.engine import render_batch_xla

        idx = np.nonzero(esc_mask[: pixel_ids.size])[0]
        if idx.size == 0:
            return
        w = self.meta.img_width
        dump_row = self.meta.img_width * self.meta.img_height
        n = idx.size
        padded = _pad_to_bucket(n)
        eids = np.full(padded, dump_row, np.int32)
        eids[:n] = pixel_ids[idx]
        esid = np.zeros(padded, np.int32)
        esid[:n] = sids[idx]
        fix = render_batch_xla(
            self.scene_arrays, self.meta, self.integrator_config(),
            jax.numpy.asarray(eids % w), jax.numpy.asarray(eids // w),
            jax.numpy.asarray(esid), self._base_key, self.photon_maps,
        )
        self._accum, _ = accumulate_round(
            self._accum, jax.numpy.asarray(eids), fix[0]
        )

    def _retire_inflight(self):
        """Retire the one in-flight dispatch: read its skipped-lane count
        (one scalar — the round's only host transfer) and fix up any
        gather-escalated lanes; fetch the depth plane on the first round."""
        if getattr(self, "_inflight", None) is None:
            return
        ids, sample_idx, out, n_skip, record_depth = self._inflight
        self._inflight = None
        n = ids.size
        if record_depth:
            self.fb.set_depth(ids, np.asarray(out[1])[:n])
        # Pace the pipeline one deep: a scalar read that depends on the
        # retired round's output (block_until_ready can return at enqueue
        # on this runtime; a transfer cannot).
        float(out[0][0, 0])
        if n_skip is not None and int(n_skip) > 0:
            mask = np.asarray(out[-1])[:n]
            self._accumulate_escalated(
                ids, np.full(n, sample_idx, np.int32), mask
            )

    _flush = _retire_inflight

    def load_checkpoint(self, path: str):
        """Resume a render from a saved framebuffer state."""
        self.fb = FrameBuffer.load_state(path)
        assert (self.fb.width, self.fb.height) == (
            self.meta.img_width, self.meta.img_height,
        ), "checkpoint resolution mismatch"

    def _maybe_checkpoint(self, spp_done: int):
        ce = self.param.checkpoint_every
        if ce and spp_done % ce == 0:
            self.sync_fb()
            self.fb.save_state(self.param.checkpoint_path)

    def _report(self, spp_done: int):
        if self._progress_cb is not None:
            # Retire the in-flight dispatch so the accumulator state is at
            # a consistent round boundary; observers that read pixel data
            # (the preview server, probes) additionally call sync_fb — a
            # full-plane fetch is too expensive to pay every round here.
            self._flush()
            self._progress_cb(spp_done, self.param.spp_max)
        pe = self.param.progressive_every
        if pe and spp_done % pe == 0 and spp_done < self.param.spp_max:
            # Progressive preview (the GUI renderer's live-view equivalent).
            self.sync_fb()
            fb = self.fb
            import copy

            snapshot = copy.deepcopy(fb)
            snapshot.finalize(self.param.use_srgb, self.param.spp_max)
            snapshot.save_image(
                f"{self.param.progressive_prefix}colorBuffer_{spp_done:04d}spp.png"
            )
