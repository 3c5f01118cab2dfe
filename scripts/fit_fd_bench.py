"""Perturb-and-recover benchmark for fit_scene_fd on hardware.

VERDICT r4 item 3's done-criterion: the chaotic, spiral-defining fields
(winding_b / per-component scale — galaxycomponent.h:156-165 territory,
exactly the set the differentiable marches handle worst) perturbed and
recovered through central differences on the PRODUCTION kernel at 128^2
full quality. Prints one JSON line for BASELINE.md.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fit_fd_bench.py \
      [steps] [lr] [size]
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else 2e-2
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    pool = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    eps = float(sys.argv[5]) if len(sys.argv) > 5 else 0.05
    fields = tuple((sys.argv[6] if len(sys.argv) > 6
                    else "winding_b,scale").split(","))
    sweep = int(sys.argv[7]) if len(sys.argv) > 7 else 17

    import gamer_tpu
    from gamer_tpu.engine.fit import fit_scene_fd
    from gamer_tpu.engine.pallas_render import render_scene_pallas
    from gamer_tpu.scene import gax
    from gamer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    g = gax.load("/root/reference/publish/data/galaxies/Spiral.gax")

    def scene_of(galaxy):
        return gamer_tpu.Scene(
            camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                          up=(0, 1, 0), fov=90.0),
            instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
            config=gamer_tpu.RenderConfig(size=size, ray_step=0.025),
        )

    truth = scene_of(g)
    target = np.asarray(render_scene_pallas(truth))

    wb_true = float(g.params.winding_b)
    scales_true = np.array([c.scale for c in g.components if c.active == 1])
    g_pert = dataclasses.replace(
        g,
        params=dataclasses.replace(
            g.params,
            winding_b=wb_true * (1.3 if "winding_b" in fields else 1.0)),
        components=[dataclasses.replace(c, scale=c.scale * 1.2)
                    if c.active == 1 and "scale" in fields else c
                    for c in g.components],
    )
    start = scene_of(g_pert)

    t0 = time.perf_counter()

    def on_step(i, loss):
        if i % 10 == 0:
            print(f"[step {i}] loss {loss:.6f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)

    groups = None
    if "winding_b" in fields and "scale" in fields:
        groups = (("winding_b",), ("scale",))  # the measured deceptive pair
    res = fit_scene_fd(start, target, fields,
                       steps=steps, lr=lr, pool=pool, eps=eps, sweep=sweep,
                       sweep_groups=groups, on_step=on_step)
    wall = time.perf_counter() - t0

    fitted = res.scene.instances[0].galaxy
    wb_fit = float(fitted.params.winding_b)
    scales_fit = np.array([c.scale for c in fitted.components
                           if c.active == 1])
    wb_err = abs(wb_fit - wb_true) / wb_true
    names = [c.class_name for c in fitted.components if c.active == 1]
    print("per-comp scale fit/true:",
          [(n, round(float(f), 3), float(t))
           for n, f, t in zip(names, scales_fit, scales_true)], flush=True)
    sc_err = float(np.abs(scales_fit - scales_true).max()
                   / np.abs(scales_true).max())
    sc_rel = float(np.mean(np.abs(scales_fit - scales_true)
                           / np.maximum(np.abs(scales_true), 0.1)))
    print(json.dumps({
        "bench": "fit_scene_fd", "fixture": "Spiral", "size": size,
        "fields": ",".join(fields), "steps": steps, "lr": lr,
        "pool": pool, "eps": eps,
        "wall_s": round(wall, 1),
        "loss0": res.losses[0], "loss_best": min(res.losses),
        "wb_start_rel_err": 0.3, "wb_rel_err": round(wb_err, 5),
        "scale_start_rel_err": 0.2, "scale_mean_rel_err": round(sc_rel, 5),
        "scale_max_err_over_max": round(sc_err, 5),
    }), flush=True)


if __name__ == "__main__":
    main()
