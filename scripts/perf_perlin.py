"""Interleaved A/B of the alt-noise backends on the production kernel.

VERDICT r4 weak-item 2: perlin on the Pallas kernel measured 2.8x simplex
at 512^2, but across tunnel hours — this harness compiles ALL variants in
ONE process and interleaves timed trials (the house discipline from
scripts/perf_ab.py), so the ratio is trustworthy. Variants:

  simplex       — production default (noise_kind="simplex")
  perlin        — packed-table perlin (ops/pallas_noise.perlin_raw_3d)
  perlin-nogath — perlin with ABLATE_GATHERS (chunked gathers replaced by
                  same-shape arithmetic): isolates the gather+select share
                  of the perlin eval, i.e. the headroom a better table
                  layout could recover. NOT value-correct (excluded from
                  checksum comparison).
  iq            — closed-form value noise (no tables at all)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_perlin.py [size] [reps]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    import jax
    import jax.numpy as jnp

    import gamer_tpu
    from gamer_tpu.engine import pallas_render as pr
    from gamer_tpu.engine.scene_prep import flatten_scene
    from gamer_tpu.ops import camera as cam_ops
    from gamer_tpu.ops import pallas_noise as pn
    from gamer_tpu.scene import gax
    from gamer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    galaxy = gax.load("/root/reference/publish/data/galaxies/Spiral.gax")

    def build(kind: str, ablate_gathers: int = 0):
        scene = gamer_tpu.Scene(
            camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0),
                                          target=(0, 0, 0),
                                          up=(0, 1, 0), fov=90.0),
            instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
            config=gamer_tpu.RenderConfig(size=size, ray_step=0.025,
                                          noise_kind=kind),
        )
        static, params = flatten_scene(scene, jnp.float32)
        camera = np.asarray(scene.camera.camera, np.float32)
        inv_vp = cam_ops.inv_view_projection_host(
            camera, scene.camera.target, scene.camera.up, scene.camera.fov)
        cfg = scene.config
        pn.ABLATE_GATHERS = ablate_gathers
        pr._compiled.cache_clear()
        lay, run, *_ = pr._compiled(static, size, 1)
        sp = pr._pack_scalars(static, lay, params, camera, inv_vp,
                              np.float32(cfg.ray_step),
                              np.float32(cfg.min_ray_step))
        t0 = time.perf_counter()
        out = run(sp)
        # force a readback: block_until_ready can return early over the
        # tunnel (CLAUDE.md)
        ck = float(np.abs(np.asarray(out)).sum())
        pn.ABLATE_GATHERS = 0
        return {"run": run, "sp": sp, "checksum": ck,
                "compile_s": time.perf_counter() - t0, "times": []}

    variants = {}
    for name, kind, abl in (("simplex", "simplex", 0),
                            ("perlin", "perlin", 0),
                            ("perlin-nogath", "perlin", 1),
                            ("iq", "iq", 0)):
        variants[name] = build(kind, abl)
        print(f"[{name}] compiled+first in {variants[name]['compile_s']:.1f}s "
              f"checksum {variants[name]['checksum']:.6g}", flush=True)

    for rep in range(reps):
        for name, v in variants.items():
            t0 = time.perf_counter()
            out = v["run"](v["sp"])
            float(jnp.sum(out))  # readback forces completion
            v["times"].append(time.perf_counter() - t0)
        print(f"rep {rep}: " + "  ".join(
            f"{n}={v['times'][-1]:.3f}s" for n, v in variants.items()),
            flush=True)

    print("\n== results (min over interleaved reps) ==")
    mins = {n: min(v["times"]) for n, v in variants.items()}
    for n, t in mins.items():
        print(f"{n:>14}: {t:.3f}s  ({t / mins['simplex']:.2f}x simplex)")
    gshare = 1.0 - mins["perlin-nogath"] / mins["perlin"]
    print(f"\nperlin chunked-gather share of frame: {gshare * 100:.1f}%")


if __name__ == "__main__":
    main()
