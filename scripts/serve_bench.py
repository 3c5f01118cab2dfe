"""Serving throughput: cross-request batching vs sequential rendering.

Submits B concurrent scene-dict requests (same structure, distinct orbit
cameras — the realistic multi-client shape) to an in-process RenderService
twice: once with the worker paused until all B are queued (they drain into
ONE padded batched launch) and once strictly sequentially (one request at a
time, the no-batching baseline). Prints frames/s for both and the speedup.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_bench.py \
      [size=256] [requests=16]
"""

from __future__ import annotations

import dataclasses
import sys
import time


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import gamer_tpu
    from gamer_tpu.scene import gax
    from gamer_tpu.scene.cameracontrols import orbit_path
    from gamer_tpu.serve import RenderService

    galaxy = gax.load("/root/reference/publish/data/galaxies/Spiral.gax")
    scene = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
        config=gamer_tpu.RenderConfig(size=size, ray_step=0.025),
    )
    cams = orbit_path(scene.camera, n_req, horizontal_deg=180.0)
    scenes = [dataclasses.replace(scene, camera=c) for c in cams]

    # warm both compiled paths (batched bucket + single progressive bands)
    warm = RenderService(autostart=False)
    for s in scenes:
        warm.submit(s)
    warm.start()
    for jid in list(warm.jobs):
        assert warm.wait(jid, 1800).state == "done", warm.jobs[jid].error
    warm.stop()
    single_warm = RenderService()
    assert single_warm.wait(single_warm.submit(scenes[0]), 1800).state == "done"
    single_warm.stop()

    # interleaved A/B (the CLAUDE.md measurement rule: tunnel drift is
    # +-2x between runs, so alternate the variants and compare MINs)
    reps = 4
    t_batched, t_seq = [], []
    for _ in range(reps):
        svc = RenderService(autostart=False)  # all B queued -> ONE launch
        jids = [svc.submit(s) for s in scenes]
        t0 = time.perf_counter()
        svc.start()
        for jid in jids:
            assert svc.wait(jid, 1800).state == "done"
        t_batched.append(time.perf_counter() - t0)
        assert svc.metrics["batches"] == 1, svc.metrics
        svc.stop()

        svc = RenderService()  # strictly sequential requests
        t0 = time.perf_counter()
        for s in scenes:
            assert svc.wait(svc.submit(s), 1800).state == "done"
        t_seq.append(time.perf_counter() - t0)
        svc.stop()

    tb, ts = min(t_batched), min(t_seq)
    print(f"\n{n_req} requests at {size}^2 (min over {reps} interleaved reps):")
    print(f"  batched    {tb:.3f}s  ({n_req / tb:.1f} frames/s, one padded launch)")
    print(f"  sequential {ts:.3f}s  ({n_req / ts:.1f} frames/s)")
    print(f"  speedup    {ts / tb:.2f}x")


if __name__ == "__main__":
    main()
