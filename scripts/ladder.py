"""Measure the BASELINE.json config ladder on the current device.

Covers the configs perf_ab does not: 1080p frame (config 2/3, full post
chain included), batched fly-through (config 4), and dataset generation
throughput (config 5, single-chip datum). Prints one line per config.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ladder.py
"""

from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import gamer_tpu
    from gamer_tpu.scene import gax

    galaxy = gax.load("/root/reference/publish/data/galaxies/Spiral.gax")

    def scene(size, ray_step=0.025):
        return gamer_tpu.Scene(
            camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                          up=(0, 1, 0), fov=90.0),
            instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
            config=gamer_tpu.RenderConfig(size=size, ray_step=ray_step),
        )

    # config 2+3: 1080p frame through the FULL pipeline (render + star-free
    # post chain), best of 3
    from gamer_tpu.engine.pallas_render import render_scene_pallas

    sc = scene(1080)
    render_scene_pallas(sc)  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        render_scene_pallas(sc)
        ts.append(time.perf_counter() - t0)
    print(f"1080p full pipeline: best {min(ts):.3f}s  median {sorted(ts)[1]:.3f}s",
          flush=True)

    # config 4: 16-frame orbit fly-through as ONE batched kernel launch
    from gamer_tpu.engine.batch import render_flythrough
    from gamer_tpu.scene.cameracontrols import orbit_path

    sc256 = scene(256)
    cams = orbit_path(sc256.camera, 16, horizontal_deg=180.0)
    render_flythrough(sc256, cams)  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        frames = render_flythrough(sc256, cams)
        ts.append(time.perf_counter() - t0)
    print(f"16-frame 256^2 fly-through: best {min(ts):.3f}s "
          f"({16 / min(ts):.1f} frames/s), shape {frames.shape}", flush=True)

    # config 5: dataset generation throughput (single chip datum): 32 views
    # at 128^2 via the batched kernel (the dataset job's unit of work)
    scb = scene(128)
    cams32 = orbit_path(scb.camera, 32, horizontal_deg=360.0)
    render_flythrough(scb, cams32)
    t0 = time.perf_counter()
    render_flythrough(scb, cams32)
    dt = time.perf_counter() - t0
    print(f"32-view 128^2 dataset batch: {dt:.3f}s ({32 / dt:.1f} views/s)",
          flush=True)


if __name__ == "__main__":
    main()
