"""All-sky HEALPix rendering at production scale, measured on hardware.

VERDICT r3 #3: the reference's HPXRasterizer mode renders 12*nside^2 maps
(hpxrasterizer.cpp:61-140); the repo's gate only covered nside=4 on CPU.
This measures nside 256 (0.79 M rays) and 512 (3.1 M rays) RING maps
through render_dirs_pallas on the chip, assembles a 1024^2 Mollweide
image, and prints BASELINE-ready lines.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/allsky_bench.py \
      [nsides=256,512] [size=1024] [out=/tmp/allsky.png]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    kw = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    nsides = [int(n) for n in kw.get("nsides", "256,512").split(",")]
    size = int(kw.get("size", 1024))
    out = kw.get("out", "/tmp/allsky.png")

    import numpy as np

    import gamer_tpu
    from gamer_tpu.engine.allsky import render_allsky_map
    from gamer_tpu.post.mollweide import mollweide_image
    from gamer_tpu.scene import gax
    from gamer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    galaxy = gax.load("/root/reference/publish/data/galaxies/Spiral.gax")
    scene = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.3, 0.05, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
        config=gamer_tpu.RenderConfig(size=16, ray_step=0.025),
    )

    for nside in nsides:
        n = 12 * nside * nside
        print(f"nside {nside}: {n / 1e6:.2f} M rays ...", flush=True)
        t0 = time.perf_counter()
        hpx = render_allsky_map(scene, nside, kernel="pallas")
        t_compile = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            hpx = render_allsky_map(scene, nside, kernel="pallas")
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        nz = float((hpx > 0).mean())
        # ~steps/ray at rayStep 0.025 matches the frame ladder's sampling
        print(f"  map: best {t:.3f}s ({n / t / 1e6:.2f} Mrays/s), "
              f"first-call {t_compile:.1f}s (incl compile), "
              f"nonzero {nz * 100:.1f}%", flush=True)
        t0 = time.perf_counter()
        img = mollweide_image(hpx, nside, size)
        t_moll = time.perf_counter() - t0
        print(f"  mollweide {size}^2 assembly: {t_moll:.3f}s "
              f"(map max {float(hpx.max()):.4g})", flush=True)
        print(f"RESULT {{\"nside\": {nside}, \"rays\": {n}, "
              f"\"map_s\": {t:.3f}, \"mrays_s\": {n / t / 1e6:.2f}}}")

    if out:
        from PIL import Image

        from gamer_tpu.engine.allsky import render_allsky_image

        img = render_allsky_image(scene, nsides[-1], size)
        Image.fromarray(img).save(out)
        print(f"saved nside {nsides[-1]} Mollweide {size}^2 to {out}")


if __name__ == "__main__":
    main()
