"""Generate the inverse-rendering demo strip for the README gallery.

Perturbs Spiral.gax (strengths x1.8, disk r0 x0.7), fits strength+r0 back
to the unperturbed render with engine/fit, and writes
docs/images/fit_demo.png: [ perturbed start | fitted | target ].

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/fit_demo.py
(CPU: the differentiable scan path is the XLA path's twin and runs
anywhere; the demo is sized to finish in a few minutes.)
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np
from PIL import Image

OUT = Path(__file__).resolve().parent.parent / "docs" / "images"
SPIRAL = Path("/root/reference/publish/data/galaxies/Spiral.gax")
SIZE = 48
UPSCALE = 4


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import gamer_tpu
    from gamer_tpu.engine.fit import fit_scene
    from gamer_tpu.engine.render import render_scene
    from gamer_tpu.scene import gax

    def scene_for(galaxy):
        return gamer_tpu.Scene(
            camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                          up=(0, 1, 0), fov=90.0),
            instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
            config=gamer_tpu.RenderConfig(size=SIZE, ray_step=0.025,
                                          is_preview=True),
        )

    truth = gax.load(SPIRAL)
    target = render_scene(scene_for(truth))

    start = gax.load(SPIRAL)
    for comp in start.components:
        comp.strength *= 1.8
        if comp.class_name == "disk":
            comp.r0 *= 0.7
    before = render_scene(scene_for(start))

    t0 = time.perf_counter()
    result = fit_scene(
        scene_for(start), target, fit_fields=("strength", "r0"),
        steps=40, lr=5e-2,
        on_step=lambda i, l: print(f"step {i + 1}: loss {l:.6f}"),
    )
    print(f"loss {result.losses[0]:.6f} -> {result.losses[-1]:.6f} "
          f"in {time.perf_counter() - t0:.1f}s")
    after = render_scene(result.scene)

    def up(img):
        return np.asarray(
            Image.fromarray(img).resize(
                (SIZE * UPSCALE, SIZE * UPSCALE), Image.NEAREST
            )
        )

    gap = np.full((SIZE * UPSCALE, 6, 3), 32, np.uint8)
    strip = np.concatenate(
        [up(before), gap, up(after), gap, up(target)], axis=1
    )
    OUT.mkdir(parents=True, exist_ok=True)
    Image.fromarray(strip).save(OUT / "fit_demo.png")
    mse_before = float(((before.astype(np.float32) - target) ** 2).mean())
    mse_after = float(((after.astype(np.float32) - target) ** 2).mean())
    print(f"wrote {OUT / 'fit_demo.png'}  MSE {mse_before:.1f} -> {mse_after:.1f}")


if __name__ == "__main__":
    main()
