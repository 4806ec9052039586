"""Photon-cloud visualizer: replacement for the reference's PhotonMapViz
GLUT executable (src/exe/PhotonMapViz.cpp) — reads the same raw binary
photon dump and writes orthographic scatter projections as PNGs instead of
an interactive GL window (no display on a TPU host).

Usage:
    python -m qaray_tpu.viz.photon_viz photonmap.dat out.png [--power]
"""

from __future__ import annotations

import struct
import sys

import numpy as np


def read_photon_dump(path: str):
    """Parse the 28-byte cyPhotonMap::Photon records (cyPhotonMap.h:50-70)."""
    data = open(path, "rb").read()
    n = len(data) // 28
    pos = np.zeros((n, 3), np.float32)
    power = np.zeros((n,), np.float32)
    color = np.zeros((n, 3), np.float32)
    for i in range(n):
        rec = data[i * 28 : (i + 1) * 28]
        x, y, z, p = struct.unpack_from("<ffff", rec, 0)
        r, g, b, _plane = struct.unpack_from("<BBBB", rec, 16)
        pos[i] = (x, y, z)
        power[i] = p
        color[i] = (r / 255.0, g / 255.0, b / 255.0)
    return pos, power, color


def render_scatter(pos, color, out_path: str, size: int = 800):
    """Three axis-aligned orthographic projections, side by side."""
    img = np.zeros((size, 3 * size, 3), np.float32)
    lo = pos.min(axis=0)
    hi = pos.max(axis=0)
    span = np.maximum(hi - lo, 1e-6)
    views = [(0, 1), (0, 2), (1, 2)]
    for v, (ax, ay) in enumerate(views):
        px = ((pos[:, ax] - lo[ax]) / span[ax] * (size - 1)).astype(int)
        py = ((pos[:, ay] - lo[ay]) / span[ay] * (size - 1)).astype(int)
        np.maximum.at(img, (size - 1 - py, v * size + px), color)
    from qaray_tpu.fb.png import write_png

    write_png(out_path, (np.clip(img, 0, 1) * 255).astype(np.uint8))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 1
    pos, power, color = read_photon_dump(argv[0])
    if "--power" in argv:
        color = np.clip(power[:, None] * np.ones((1, 3)), 0, 1)
    print(f"{pos.shape[0]} photons, bbox {pos.min(0)} .. {pos.max(0)}")
    render_scatter(pos, color, argv[1])
    return 0


if __name__ == "__main__":
    sys.exit(main())
