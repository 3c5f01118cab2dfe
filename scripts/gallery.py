"""Regenerate the README gallery images with the production Pallas engine.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/gallery.py
Writes docs/images/{fixtures_256,tonsofarms_512,flythrough_256}.png and
prints the render time of each piece.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np
from PIL import Image

OUT = Path(__file__).resolve().parent.parent / "docs" / "images"
FIXTURES = Path("/root/reference/publish/data/galaxies")


def main() -> None:
    import gamer_tpu
    from gamer_tpu.engine.batch import render_flythrough
    from gamer_tpu.engine.pallas_render import render_scene_pallas
    from gamer_tpu.scene import gax
    from gamer_tpu.scene.cameracontrols import orbit_path

    OUT.mkdir(parents=True, exist_ok=True)

    def milky_way_scene(galaxy, size, ray_step=0.025):
        return gamer_tpu.Scene(
            camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                          up=(0, 1, 0), fov=90.0),
            instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
            config=gamer_tpu.RenderConfig(size=size, ray_step=ray_step),
        )

    # 1. six distinctive fixtures, inside-the-galaxy view, 2x3 grid at 256^2
    names = ["Spiral", "Sombrero", "Irregular", "RedBar", "TonsOfArms",
             "VortexCloud"]
    tiles = []
    t0 = time.perf_counter()
    for n in names:
        sc = milky_way_scene(gax.load(FIXTURES / f"{n}.gax"), 256)
        tiles.append(render_scene_pallas(sc))
    dt = time.perf_counter() - t0
    grid = np.concatenate(
        [np.concatenate(tiles[:3], axis=1), np.concatenate(tiles[3:], axis=1)],
        axis=0)
    Image.fromarray(grid).save(OUT / "fixtures_256.png")
    print(f"fixtures_256.png: 6 renders in {dt:.2f}s", flush=True)

    # 2. TonsOfArms face-on at 512^2, fine ray step
    g = gax.load(FIXTURES / "TonsOfArms.gax")
    face_on = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0, 1.2, 0), target=(0, 0, 0),
                                      up=(0, 0, 1), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=g)],
        config=gamer_tpu.RenderConfig(size=512, ray_step=0.01),
    )
    render_scene_pallas(face_on)  # compile
    t0 = time.perf_counter()
    img = render_scene_pallas(face_on)
    dt = time.perf_counter() - t0
    Image.fromarray(img).save(OUT / "tonsofarms_512.png")
    print(f"tonsofarms_512.png: {dt:.2f}s warm", flush=True)

    # 3. 8-frame orbit fly-through of Spiral at 256^2, one batched launch
    sc = milky_way_scene(gax.load(FIXTURES / "Spiral.gax"), 256)
    cams = orbit_path(sc.camera, 8, horizontal_deg=150.0, vertical_deg=25.0)
    render_flythrough(sc, cams)  # compile
    t0 = time.perf_counter()
    frames = render_flythrough(sc, cams)
    dt = time.perf_counter() - t0
    strip = np.concatenate(list(frames), axis=1)
    Image.fromarray(strip).save(OUT / "flythrough_256.png")
    print(f"flythrough_256.png: 8 frames in {dt:.2f}s (one launch)",
          flush=True)


if __name__ == "__main__":
    main()
