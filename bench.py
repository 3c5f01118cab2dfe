"""Headline benchmark: ray-march throughput of the TPU engine.

Prints ONE JSON line:
  {"metric": "ray_march_msamples_per_sec_per_chip", "value": ..., "unit":
   "Msamples/s", "vs_baseline": ...}

The workload is the reference's canonical batch preset (singleGalaxy.sh:1 /
tools/galaxy_repro.py defaults): Spiral.gax, camera (0.5,0,0), fov 90,
rayStep 0.025, at the largest frame the device sustains — larger frames
amortize the fixed per-dispatch link overhead (the tunneled device link
costs ~30 ms latency + ~23 MB/s both ways, which is measurement noise a
production-attached TPU would not pay), so the biggest sustained frame is
the most faithful throughput reading. "Samples" are component-march samples
(pixels x steps x active components), the unit of work of the hot loop
(rasterizer.cpp:447-475); the per-pixel sample count is measured by the
spec-exact CPU oracle at a smaller size (scale-invariant for a fixed camera).

vs_baseline is the speedup over the spec-exact CPU oracle on this host —
the reference publishes no numbers (BASELINE.md), so the measured oracle is
the baseline datum.

Each frame size runs in a fresh subprocess: a TPU-runtime crash (the tunnel
is occasionally unstable) poisons the whole client process, so in-process
retries at smaller sizes would always fail.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_CHILD_SNIPPET = r"""
import json, sys, time
size = int(sys.argv[1])
kernel = sys.argv[2]
import gamer_tpu
from gamer_tpu.scene import gax

galaxy = gax.load("/root/reference/publish/data/galaxies/Spiral.gax")
scene = gamer_tpu.Scene(
    camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                  up=(0, 1, 0), fov=90.0),
    instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
    config=gamer_tpu.RenderConfig(size=size, ray_step=0.025),
)
if kernel == "pallas":
    import jax.numpy as jnp
    from gamer_tpu.engine.pallas_render import render_scene_pallas

    # Device-side timing (the repo's timing convention, BASELINE.md):
    # the frame stays on device and completion is forced by a scalar
    # readback (jax.block_until_ready can return EARLY over the dev
    # tunnel). The dev tunnel downloads at ~2-23 MB/s — link cost a
    # production-attached host does not pay, so it is excluded from the
    # per-frame time; the checksum download below happens once, untimed.
    def render(s):
        img = render_scene_pallas(s, device_out=True)
        float(jnp.sum(img.astype(jnp.float32)))  # force completion
        return img
else:
    from gamer_tpu.engine.render import render_scene as render
render(scene)  # compile + warm
dt = float("inf")
for _ in range(3):  # best-of-3: the tunneled link adds +-50% noise per call
    t0 = time.perf_counter()
    img = render(scene)
    dt = min(dt, time.perf_counter() - t0)
import numpy as np
print(json.dumps({"ok": True, "size": size, "dt": dt,
                  "checksum": int(np.asarray(img).astype("int64").sum())}))
"""


_PROBE_SNIPPET = r"""
import json
import jax
print(json.dumps({"platform": jax.devices()[0].platform,
                  "n": len(jax.devices())}))
"""

_CPU_CHILD_PREFIX = r"""
import jax
jax.config.update("jax_platforms", "cpu")
"""


def _probe_devices(timeout_s: int = 180):
    """Which backend will the children get? Over the axon tunnel a dead
    link HANGS device init rather than failing, so probe it in a bounded
    subprocess before spending the full ladder's timeouts on it."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SNIPPET],
            capture_output=True, text=True, timeout=timeout_s,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue  # diagnostic noise from the tunnel plugin
    except (subprocess.TimeoutExpired, OSError):
        # a flaky tunnel can also kill the child mid-write — any unusable
        # probe means CPU fallback, not a bench crash
        pass
    return None


def _try_size(size: int, kernel: str, timeout_s: int, force_cpu: bool = False):
    snippet = (_CPU_CHILD_PREFIX if force_cpu else "") + _CHILD_SNIPPET
    try:
        proc = subprocess.run(
            [sys.executable, "-c", snippet, str(size), kernel],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        print(f"bench: size {size} ({kernel}) timed out", file=sys.stderr)
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue  # diagnostic noise from the tunnel plugin
    err = (proc.stderr or "").strip().splitlines()
    print(f"bench: size {size} ({kernel}) failed: "
          f"{err[-1] if err else 'no output'}", file=sys.stderr)
    return None


def main() -> None:
    from gamer_tpu.oracle.reference import render_oracle
    from gamer_tpu.scene import gax

    import gamer_tpu

    galaxy = gax.load("/root/reference/publish/data/galaxies/Spiral.gax")
    oracle_scene = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
        config=gamer_tpu.RenderConfig(size=48, ray_step=0.025),
    )
    _, otim = render_oracle(oracle_scene)
    samples_per_px = otim.samples / otim.pixels
    oracle_msps = otim.msamples_per_sec

    # A dead tunnel HANGS device init in every child; detect it up front
    # and fall back to a CPU-forced measurement instead of spending the
    # whole ladder's timeouts discovering it (the tunnel has been observed
    # down for hours at a stretch).
    probe = _probe_devices()
    force_cpu = probe is None
    if force_cpu:
        print("bench: device init unresponsive (tunnel down?); "
              "falling back to the CPU backend", file=sys.stderr)
    ladder = ((4096, 580), (2048, 540), (1024, 420), (512, 360),
              (256, 300), (128, 240), (64, 210))
    if force_cpu or (probe or {}).get("platform") == "cpu":
        # CPU interpret mode: the big rungs would only burn their timeouts
        ladder = ((128, 420), (64, 300), (32, 240))

    best = None
    for kernel in ("pallas", "xla"):
        successes = 0
        for size, budget in ladder:
            r = _try_size(size, kernel, budget, force_cpu=force_cpu)
            if r and r.get("ok"):
                msps = samples_per_px * size * size / r["dt"] / 1e6
                if best is None or msps > best["msps"]:
                    best = {"msps": msps, "size": size, "dt": r["dt"],
                            "kernel": kernel}
                successes += 1
                # Sample the two largest working sizes and keep the best
                # throughput: bigger frames amortize fixed dispatch cost,
                # but on a slow tunnel hour the largest can also time out
                # or compile slowly — two rungs covers both regimes.
                if successes >= 2:
                    break
        if best is not None:
            break  # pallas worked; the xla fallback can't beat it and its
            # large-frame attempts can destabilize the device runtime

    if best is None:
        print(json.dumps({
            "metric": "ray_march_msamples_per_sec_per_chip",
            "value": 0.0, "unit": "Msamples/s", "vs_baseline": 0.0,
            "error": "all sizes failed",
        }))
        return

    print(json.dumps({
        "metric": "ray_march_msamples_per_sec_per_chip",
        "value": round(best["msps"], 3),
        "unit": "Msamples/s",
        "vs_baseline": round(best["msps"] / oracle_msps, 3),
        "frame_px": best["size"],
        "frame_time_s": round(best["dt"], 4),
        "kernel": best["kernel"],
        "backend": "cpu-fallback" if force_cpu else
                   (probe or {}).get("platform", "unknown"),
        "oracle_msamples_per_sec": round(oracle_msps, 3),
    }))


if __name__ == "__main__":
    main()
