"""fit_joint wall-time benchmark — the BASELINE joint-fit case.

Reproduces the round-3 measurement exactly (128^2 full quality, Spiral,
camera offset +0.055 on x, disk/dust strengths x1.8) and times fit_joint
end-to-end, reporting wall time, camera position error and relative
strength error so pose-block variants can be compared at equal quality.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fit_joint_bench.py \
      [pose=fd|multiscale] [rounds=2] [posesteps=30] [scenesteps=60]

The round-3 BASELINE row (pose=multiscale, 2 rounds): 50.5 min,
pos err 0.0028, strength err 0.143. VERDICT r3 #6 target: < 20 min at
pos err < 0.003 / strength err < 0.15.
"""

from __future__ import annotations

import copy
import sys
import time


def main() -> None:
    kw = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    pose_method = kw.get("pose", "fd")
    rounds = int(kw.get("rounds", 2))
    pose_steps = int(kw.get("posesteps", 30))
    scene_steps = int(kw.get("scenesteps", 60))

    import numpy as np

    import gamer_tpu
    from gamer_tpu.engine.fit import fit_joint
    from gamer_tpu.engine.pallas_render import render_scene_pallas
    from gamer_tpu.scene import gax
    from gamer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    galaxy = gax.load("/root/reference/publish/data/galaxies/Spiral.gax")
    true_cam = (0.5, 0.0, 0.0)
    scene_true = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=true_cam, target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
        config=gamer_tpu.RenderConfig(size=128, ray_step=0.025),
    )
    target = np.asarray(render_scene_pallas(scene_true))

    # the perturbed start: camera +0.055 on x, strengths x1.8 (BASELINE 6)
    start = copy.deepcopy(scene_true)
    start = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.555, 0.0, 0.0),
                                      target=(0, 0, 0), up=(0, 1, 0),
                                      fov=90.0),
        instances=start.instances, config=start.config,
        spectra=start.spectra,
    )
    true_strengths = np.array(
        [c.strength for c in galaxy.components if c.active == 1])
    for inst in start.instances:
        inst.galaxy = copy.deepcopy(inst.galaxy)
        for c in inst.galaxy.components:
            c.strength *= 1.8

    print(f"fit_joint bench: pose={pose_method} rounds={rounds} "
          f"posesteps={pose_steps} scenesteps={scene_steps}", flush=True)
    t0 = time.perf_counter()

    def on_step(i, loss):
        if i % 10 == 0:
            print(f"  step {i}: loss {loss:.6f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)

    res = fit_joint(start, target, ("strength",), rounds=rounds,
                    pose_steps=pose_steps, scene_steps=scene_steps,
                    pose_method=pose_method, on_step=on_step)
    wall = time.perf_counter() - t0

    cam = np.asarray(res.scene.camera.camera)
    pos_err = float(np.linalg.norm(cam - np.asarray(true_cam)))
    fit_strengths = np.array(
        [c.strength for c in res.scene.instances[0].galaxy.components
         if c.active == 1])
    s_err = float(np.max(np.abs(fit_strengths / true_strengths - 1.0)))
    print(f"\nwall {wall / 60.0:.1f} min  loss {res.losses[0]:.6f} -> "
          f"{min(res.losses):.6f}")
    print(f"camera pos err {pos_err:.5f} (target < 0.003)")
    print(f"relative strength err {s_err:.4f} (target < 0.15)")
    print(f"RESULT {{\"pose\": \"{pose_method}\", \"rounds\": {rounds}, "
          f"\"wall_min\": {wall / 60.0:.2f}, \"pos_err\": {pos_err:.5f}, "
          f"\"strength_err\": {s_err:.4f}}}")


if __name__ == "__main__":
    main()
