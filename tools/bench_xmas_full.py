"""Full-length flagship render: trc_scene_xmas @ 1024 spp on the real TPU.

BASELINE.json configs[4]. Forced-completion timing (the renderer's
accumulator feeds device-side; the final sync pulls every plane to host),
plus a per-round wall-clock trace to attribute end-to-end vs steady-state
gaps. Writes xmas_1024spp.{json,png}.

Usage: python tools/bench_xmas_full.py [--spp 1024]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=1024)
    args = ap.parse_args()

    from qaray_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    import numpy as np

    from qaray_tpu.renderer import Renderer, RendererParam
    from qaray_tpu.scene.xml_parser import load_scene

    scene = load_scene("/root/reference/inputs/trc_scene_xmas.xml")
    p = RendererParam(spp_min=args.spp, spp_max=args.spp,
                      integrator="photonmap", max_bounce=5)
    r = Renderer(p)
    t0 = time.perf_counter()
    r.compute_scene(scene)
    build_s = time.perf_counter() - t0

    rounds = []
    last = [None]

    def cb(done, total):
        now = time.perf_counter()
        if last[0] is not None:
            rounds.append(round(now - last[0], 4))
        last[0] = now

    r.set_progress_callback(cb)
    t0 = time.perf_counter()
    last[0] = t0
    fb = r.render()
    wall = time.perf_counter() - t0
    n = fb.width * fb.height
    rr = np.array(rounds) if rounds else np.array([wall])
    out = {
        "scene": "trc_scene_xmas.xml",
        "resolution": [fb.width, fb.height],
        "spp": args.spp,
        "wall_s": wall,
        "samples_per_s": n * args.spp / wall,
        "scene_build_s": build_s,
        "round_wall_s_first": float(rr[0]),
        "round_wall_s_median": float(np.median(rr[1:])) if len(rr) > 1 else None,
        "round_wall_s_p99": float(np.percentile(rr[1:], 99)) if len(rr) > 1 else None,
        "timing": "forced_completion (device accumulator synced at end)",
        "device": "TPU v5 lite",
    }
    fb.save_image("xmas_1024spp.png")
    with open("xmas_1024spp.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
