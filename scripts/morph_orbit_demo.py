"""Combined morph + orbit demo: the galaxy transforms WHILE the camera
orbits — every frame differs in both camera and galaxy parameters, and the
whole animation is still ONE batched kernel launch (each batch element's
packed scalar row carries its own camera matrix AND galaxy values).

Writes docs/images/morph_orbit.gif.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/morph_orbit_demo.py
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path

from PIL import Image

OUT = Path(__file__).resolve().parent.parent / "docs" / "images"
FIXTURES = Path("/root/reference/publish/data/galaxies")
FRAMES = 24
SIZE = 192


def main() -> None:
    import gamer_tpu
    from gamer_tpu.engine.batch import render_batch
    from gamer_tpu.scene import gax
    from gamer_tpu.scene.cameracontrols import orbit_path
    from gamer_tpu.scene.morph import morph_scenes

    scene = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(
            galaxy=gax.load(FIXTURES / "SB0.gax"))],
        config=gamer_tpu.RenderConfig(size=SIZE, ray_step=0.025),
    )
    morphs = morph_scenes(scene, gax.load(FIXTURES / "Spiral.gax"), FRAMES)
    cams = orbit_path(scene.camera, FRAMES, horizontal_deg=180.0)
    scenes = [dataclasses.replace(m, camera=c) for m, c in zip(morphs, cams)]

    render_batch(scenes)  # compile
    t0 = time.perf_counter()
    imgs = render_batch(scenes)
    print(f"{FRAMES}-frame morph+orbit at {SIZE}^2: "
          f"{time.perf_counter() - t0:.2f}s warm, one launch")

    OUT.mkdir(parents=True, exist_ok=True)
    frames = [Image.fromarray(f) for f in imgs]
    frames[0].save(OUT / "morph_orbit.gif", save_all=True, duration=100,
                   loop=0, append_images=frames[1:] + frames[-2::-1])
    print(f"wrote {OUT / 'morph_orbit.gif'}")


if __name__ == "__main__":
    main()
