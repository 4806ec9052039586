"""CLI entry point, flag-compatible with the reference (src/main.cpp:8-61).

    python -m qaray_tpu.cli scene.xml -batch -spp 8 -bounce 5 -srgb 1

Differences from the reference: no GLUT GUI mode (`-batch` is implied; the
flag is accepted for compatibility), plus TPU-native extras:
    -integrator {photonmap,pathtrace,basic,phong,mcgi}
    -seed N           deterministic RNG seed
    -out PREFIX       output file prefix
    -devices N        shard the render over N devices
    -multihost        jax.distributed pod-slice mode (launch once per host)
    -coordinator A,N,P  explicit coordinator addr, process count, process id
    -probe X,Y        print RGB+z at a pixel after the render
    -shadow-spp N / -shadow-spp-max N   soft-shadow sample budget
    -progressive N    save a preview PNG every N spp
    -res WxH          resolution override
    -platform cpu     force a backend
    -profile DIR      jax.profiler trace
"""

from __future__ import annotations

import sys
import time

from qaray_tpu.renderer import Renderer, RendererParam
from qaray_tpu.scene.xml_parser import load_scene


def parse_args(argv):
    param = RendererParam()
    scene_file = None
    out_prefix = ""
    devices = 0
    overrides = {}
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-batch":
            pass  # batch is the only mode
        elif a == "-spp":
            i += 1
            param.spp_max = param.spp_min = int(argv[i])
        elif a == "-sppMin":
            i += 1
            param.spp_min = int(argv[i])
        elif a == "-sppMax":
            # NOTE: reference main.cpp:34 actually writes sppMin here (bug);
            # we implement the intent.
            i += 1
            param.spp_max = int(argv[i])
        elif a == "-bounce":
            i += 1
            param.max_bounce = int(argv[i])
        elif a == "-srgb":
            i += 1
            param.use_srgb = int(argv[i]) != 0
        elif a == "-threads":
            i += 1  # accepted for compatibility; TPU lanes replace threads
        elif a == "-use-photon-map":
            param.use_photon_map = True
        elif a == "-photon-map-size":
            i += 1
            param.photon_map_size = int(argv[i])
        elif a == "-caustics-map-size":
            i += 1
            param.caustics_map_size = int(argv[i])
        elif a == "-integrator":
            i += 1
            param.integrator = argv[i]
        elif a == "-seed":
            i += 1
            param.seed = int(argv[i])
        elif a == "-out":
            i += 1
            out_prefix = argv[i]
        elif a == "-devices":
            i += 1
            devices = int(argv[i])
            param.num_devices = devices
        elif a == "-multihost":
            # Multi-host pod-slice mode: jax.distributed init (env-driven on
            # TPU pods; -coordinator overrides), then shard over every chip
            # the slice exposes. The reference analog is mpirun'ing the
            # binary per node (Renderer_MPI.cpp:35-53); here the same CLI is
            # launched once per host.
            overrides["multihost"] = True
        elif a == "-rank-debug":
            # Per-process pre-gather debug planes in multihost mode
            # (Renderer_MPI.cpp:134-138 per-rank PNG saves).
            param.rank_debug = True
        elif a == "-coordinator":
            i += 1
            addr, rest = argv[i].split(",", 1)
            nproc, pid = rest.split(",")
            overrides["coordinator"] = (addr, int(nproc), int(pid))
        elif a == "-platform":
            # e.g. `-platform cpu` to force CPU when a TPU plugin is
            # registered (the sitecustomize here pins JAX_PLATFORMS=axon,
            # so a plain env override is not enough).
            i += 1
            import jax

            jax.config.update("jax_platforms", argv[i])
        elif a == "-res":
            # TPU-native extra: override render resolution WxH.
            i += 1
            w, h = argv[i].lower().split("x")
            overrides["res"] = (int(w), int(h))
        elif a == "-progressive":
            i += 1
            param.progressive_every = int(argv[i])
        elif a == "-shadow-spp":
            i += 1
            param.shadow_spp = int(argv[i])
        elif a == "-shadow-spp-max":
            i += 1
            param.shadow_spp_max = int(argv[i])
        elif a == "-probe":
            # Pixel probe: print RGB + z at x,y after the render (the GUI
            # left-click PrintPixelData, viewport.cpp:516-527).
            i += 1
            x, y = argv[i].split(",")
            overrides.setdefault("probe", []).append((int(x), int(y)))
        elif a == "-profile":
            i += 1
            overrides["profile"] = argv[i]
        elif a == "-serve":
            # Interactive preview server (the GUI viewport replacement,
            # qaray_tpu/viz/serve.py): live progressive frames, probe,
            # restart, parameter edits, camera orbit over localhost HTTP.
            i += 1
            overrides["serve"] = int(argv[i])
        else:
            scene_file = a
        i += 1
    return param, scene_file, out_prefix, devices, overrides


def main(argv=None):
    from qaray_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    argv = argv if argv is not None else sys.argv[1:]
    param, scene_file, out_prefix, devices, overrides = parse_args(argv)
    if scene_file is None:
        print("Error: insufficient input", file=sys.stderr)
        return -1

    if overrides.get("multihost"):
        from qaray_tpu.parallel.distributed import init_distributed, is_primary

        coord = overrides.get("coordinator")
        if coord is not None:
            rank, nprocs = init_distributed(*coord)
        else:
            rank, nprocs = init_distributed()
        import jax

        param.num_devices = len(jax.devices())
        print(f"multihost: process {rank}/{nprocs}, "
              f"{param.num_devices} devices", flush=True)

    try:
        scene = load_scene(scene_file)
    except (OSError, ValueError) as e:
        # Reference prints 'Failed to load the file "..."' (xmlload.cpp:75).
        print(f'Failed to load the file "{scene_file}": {e}', file=sys.stderr)
        return -1
    if "res" in overrides:
        scene.camera.img_width, scene.camera.img_height = overrides["res"]
    renderer = Renderer(param)

    if "serve" in overrides:
        from qaray_tpu.viz.serve import RenderServer

        RenderServer(renderer, scene, overrides["serve"]).serve(block=True)
        return 0

    renderer.compute_scene(scene)

    def progress(done, total):
        print(f"progress: {done}/{total} spp", flush=True)

    renderer.set_progress_callback(progress)
    param.progressive_prefix = out_prefix

    from qaray_tpu.utils.timing import FrameTimer, profile

    timer = FrameTimer()
    timer.start()
    with profile(overrides.get("profile")):
        fb = renderer.render()
    timer.stop()

    if overrides.get("multihost"):
        # Per-rank pre-gather debug planes BEFORE the primary-only gate
        # (Renderer_MPI.cpp:134-138 saves each rank's buffers before the
        # MPI composite).
        if param.rank_debug:
            import jax

            renderer.save_rank_debug(out_prefix, jax.process_index())
        # Only the primary writes images (reference: rank 0 composites and
        # saves, Renderer_MPI.cpp:142-207; every process here already holds
        # the full gathered framebuffer).
        from qaray_tpu.parallel.distributed import is_primary

        if not is_primary():
            return 0

    # Output names follow Renderer_GUI::CleanRender (Renderer_GUI.cpp:65-73).
    fb.save_image(out_prefix + "colorBuffer.png")
    fb.save_z_image(out_prefix + "depthBuffer.png")
    fb.save_sample_count_image(out_prefix + "sampleBuffer.png")
    if param.use_photon_map:
        fb.save_irradiance_image(out_prefix + "irradianceBuffer.png")
    for x, y in overrides.get("probe", []):
        try:
            r, g, b, z = fb.probe(x, y)
            # PrintPixelData format (viewport.cpp:522-523).
            print(f"Pixel [ {x}, {y} ] Color3c: {r}, {g}, {b}   Z: {z:f}")
        except IndexError as e:
            print(str(e))
    return 0


if __name__ == "__main__":
    sys.exit(main())
