"""Multi-view joint fit benchmark (VERDICT r4 item 8's done-criterion).

4 views of Spiral at 128^2, ALL cameras perturbed by 0.05 and the
emitting-component strengths x1.8; fit_joint_multiview must recover
per-view position error < 0.005 and relative strength error < 0.05.
Prints one JSON line for BASELINE.md.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fit_joint_multiview_bench.py \
      [rounds] [pose_steps] [scene_steps] [size]
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3  # BASELINE config
    pose_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    scene_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    size = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    import gamer_tpu
    from gamer_tpu.engine.fit import fit_joint_multiview
    from gamer_tpu.engine.pallas_render import render_scene_pallas
    from gamer_tpu.scene import gax
    from gamer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    g = gax.load("/root/reference/publish/data/galaxies/Spiral.gax")

    true_cams = [
        gamer_tpu.CameraParams(camera=c, target=(0, 0, 0), up=(0, 1, 0),
                               fov=90.0)
        for c in ((0.5, 0, 0), (0, 0.12, 0.48), (-0.45, -0.1, 0.2),
                  (0.3, 0.25, -0.35))
    ]

    def scene_of(galaxy, cam):
        return gamer_tpu.Scene(
            camera=cam,
            instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
            config=gamer_tpu.RenderConfig(size=size, ray_step=0.025),
        )

    targets = np.stack([
        np.asarray(render_scene_pallas(scene_of(g, c))) for c in true_cams])

    rng = np.random.default_rng(3)
    start_cams = []
    for c in true_cams:
        d = rng.normal(size=3)
        d = 0.05 * d / np.linalg.norm(d)
        start_cams.append(dataclasses.replace(
            c, camera=tuple(np.asarray(c.camera) + d)))
    g_pert = dataclasses.replace(
        g, components=[dataclasses.replace(c, strength=c.strength * 1.8)
                       if c.active == 1 and c.class_name in
                       ("bulge", "disk", "stars") else c
                       for c in g.components])
    start = scene_of(g_pert, true_cams[0])

    strengths_true = np.array([c.strength for c in g.components
                               if c.active == 1])
    t0 = time.perf_counter()

    def on_step(i, loss):
        if i % 20 == 0:
            print(f"[step {i}] loss {loss:.6f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)

    res = fit_joint_multiview(
        start, targets, start_cams, ("strength",), rounds=rounds,
        pose_steps=pose_steps, scene_steps=scene_steps)
    wall = time.perf_counter() - t0

    pos_errs = [float(np.linalg.norm(np.asarray(fc.camera)
                                     - np.asarray(tc.camera)))
                for fc, tc in zip(res.cameras, true_cams)]
    strengths_fit = np.array([c.strength for c in
                              res.scene.instances[0].galaxy.components
                              if c.active == 1])
    s_err = float(np.mean(np.abs(strengths_fit - strengths_true)
                          / strengths_true))
    print(json.dumps({
        "bench": "fit_joint_multiview", "fixture": "Spiral", "size": size,
        "views": len(true_cams), "rounds": rounds,
        "pose_steps": pose_steps, "scene_steps": scene_steps,
        "wall_s": round(wall, 1),
        "pos_err_start": 0.05,
        "pos_err_max": round(max(pos_errs), 5),
        "pos_errs": [round(e, 5) for e in pos_errs],
        "strength_start_rel_err": 0.8,
        "strength_rel_err": round(s_err, 5),
    }), flush=True)


if __name__ == "__main__":
    main()
