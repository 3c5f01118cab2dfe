"""Interleaved A/B benchmark for Pallas kernel variants on the real TPU.

The axon tunnel's process-to-process timing noise is ~±2x, so comparing
kernel variants across separate runs is meaningless. This harness compiles
every variant in ONE process, then interleaves timed trials round-robin
(A, B, A, B, ...) so drift hits all variants equally; the per-variant MIN is
the comparison statistic. Checksums are cross-checked: every variant must
produce the identical image (the optimizations are bit-exactness-preserving).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_ab.py \
      [size] [reps] [name=attr:val[,attr:val...]] ...

  e.g. python scripts/perf_ab.py 512 6 base=UNROLL:1 unroll4=UNROLL:4
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    specs = []
    for arg in sys.argv[3:]:
        name, _, rest = arg.partition("=")
        attrs = {}
        for kv in rest.split(","):
            if not kv:
                continue
            k, _, v = kv.partition(":")
            try:
                attrs[k] = int(v)
            except ValueError:
                try:
                    attrs[k] = float(v)
                except ValueError:
                    attrs[k] = v
        specs.append((name, attrs))
    if not specs:
        specs = [("base", {"UNROLL": 1}), ("unroll4", {"UNROLL": 4})]

    import gamer_tpu
    from gamer_tpu.engine import pallas_render as pr
    from gamer_tpu.ops import camera as cam_ops
    from gamer_tpu.ops import pallas_noise as pn
    from gamer_tpu.scene import gax

    # attrs live on pallas_render by default; "pn.NAME" targets pallas_noise
    mods = {"": pr, "pn": pn}

    def resolve(attr):
        m, _, a = attr.rpartition(".")
        return mods[m], a

    galaxy = gax.load("/root/reference/publish/data/galaxies/Spiral.gax")
    scene = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
        config=gamer_tpu.RenderConfig(size=size, ray_step=0.025),
    )
    from gamer_tpu.engine.scene_prep import flatten_scene

    static, params = flatten_scene(scene, jnp.float32)
    camera = np.asarray(scene.camera.camera, np.float32)
    inv_vp = cam_ops.inv_view_projection_host(
        camera, scene.camera.target, scene.camera.up, scene.camera.fov)
    cfg = scene.config

    defaults = {k: getattr(*resolve(k)) for k in
                {a for _, attrs in specs for a in attrs}}
    variants = []
    for name, attrs in specs:
        for k, v in {**defaults, **attrs}.items():
            m, a = resolve(k)
            setattr(m, a, v)
        pr._compiled.cache_clear()
        lay, run, *_ = pr._compiled(static, size, 1)
        sp = pr._pack_scalars(static, lay, params, camera, inv_vp,
                              np.float32(cfg.ray_step),
                              np.float32(cfg.min_ray_step))
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(sp))
        print(f"[{name}] compiled+first-run in "
              f"{time.perf_counter() - t0:.1f}s  attrs={attrs}", flush=True)
        variants.append({"name": name, "run": run, "sp": sp,
                         "checksum": float(np.abs(np.asarray(out)).sum()),
                         "times": []})
    for k, v in defaults.items():
        m, a = resolve(k)
        setattr(m, a, v)

    base_ck = variants[0]["checksum"]
    for v in variants[1:]:
        rel = abs(v["checksum"] - base_ck) / max(abs(base_ck), 1e-9)
        tag = "OK" if rel < 1e-6 else f"MISMATCH rel={rel:.3e}"
        print(f"checksum {v['name']} vs {variants[0]['name']}: {tag}",
              flush=True)

    for rep in range(reps):
        for v in variants:
            t0 = time.perf_counter()
            jax.block_until_ready(v["run"](v["sp"]))
            v["times"].append(time.perf_counter() - t0)
        print(f"rep {rep}: " + "  ".join(
            f"{v['name']}={v['times'][-1]:.3f}s" for v in variants),
            flush=True)

    print("\n== results (min / median over interleaved reps) ==")
    for v in variants:
        ts = sorted(v["times"])
        print(f"{v['name']:>12}: min {ts[0]:.3f}s  "
              f"median {ts[len(ts) // 2]:.3f}s")


if __name__ == "__main__":
    main()
