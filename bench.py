"""Headline benchmark: ray-march throughput of the TPU engine.

Prints ONE JSON line:
  {"metric": "ray_march_msamples_per_sec_per_chip", "value": ..., "unit":
   "Msamples/s", "vs_baseline": ...}

The workload is the reference's canonical batch preset (singleGalaxy.sh:1 /
tools/galaxy_repro.py defaults): Spiral.gax, camera (0.5,0,0), fov 90,
rayStep 0.025, at the largest frame the device sustains (preferring 512 px —
the singleGalaxy.sh production size). "Samples" are component-march samples
(pixels x steps x active components), the unit of work of the hot loop
(rasterizer.cpp:447-475); the per-pixel sample count is measured by the
spec-exact CPU oracle at a smaller size (scale-invariant for a fixed camera).

vs_baseline is the speedup over the spec-exact CPU oracle on this host —
the reference publishes no numbers (BASELINE.md), so the measured oracle is
the baseline datum.
"""

from __future__ import annotations

import contextlib
import json
import signal
import sys
import time


@contextlib.contextmanager
def _deadline(seconds: int):
    """SIGALRM watchdog: device tunnels can hang a compile indefinitely."""

    def _raise(signum, frame):
        raise TimeoutError(f"exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main() -> None:
    import numpy as np

    import gamer_tpu
    from gamer_tpu.engine.render import render_scene
    from gamer_tpu.oracle.reference import render_oracle
    from gamer_tpu.scene import gax

    galaxy = gax.load("/root/reference/publish/data/galaxies/Spiral.gax")

    def scene(size):
        return gamer_tpu.Scene(
            camera=gamer_tpu.CameraParams(
                camera=(0.5, 0, 0), target=(0, 0, 0), up=(0, 1, 0), fov=90.0
            ),
            instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
            config=gamer_tpu.RenderConfig(size=size, ray_step=0.025),
        )

    # Oracle datum: per-pixel sample count + CPU Msamples/s.
    _, otim = render_oracle(scene(48))
    samples_per_px = otim.samples / otim.pixels
    oracle_msps = otim.msamples_per_sec

    # Engine: largest sustainable frame, cached-executable timing.
    value = None
    for size in (512, 256, 128, 64):
        try:
            with _deadline(420):
                render_scene(scene(size))  # compile + warm
            with _deadline(180):
                t0 = time.perf_counter()
                render_scene(scene(size))
                dt = time.perf_counter() - t0
            est_samples = samples_per_px * size * size
            value = est_samples / dt / 1e6
            break
        except Exception as e:  # noqa: BLE001 — device flakiness: try smaller
            print(f"bench: size {size} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    if value is None:
        print(json.dumps({
            "metric": "ray_march_msamples_per_sec_per_chip",
            "value": 0.0, "unit": "Msamples/s", "vs_baseline": 0.0,
            "error": "all sizes failed",
        }))
        return

    print(json.dumps({
        "metric": "ray_march_msamples_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(value / oracle_msps, 3),
        "frame_px": size,
        "frame_time_s": round(dt, 4),
        "oracle_msamples_per_sec": round(oracle_msps, 3),
    }))


if __name__ == "__main__":
    main()
