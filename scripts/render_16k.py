"""Memory-bounded giant-frame render: the scaling story past 8K.

Renders an N^2 (default 16384^2) Spiral frame on one chip through
render_progressive_pallas — the streamed row-band mode: each band is one
device dispatch whose HBM footprint is (band_rows x N) f32 planes, and
each band leaves the device as finished uint8 rows, so device memory is
bounded by the BAND, not the frame (a fused 16K^2 launch would want
3x16K^2 f32 = 3.2 GB of output planes plus scratch; the band mode needs
~1/16th of that). Host memory holds the uint8 frame (16K^2 x 3 = 768 MB).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/render_16k.py \
      [size=16384] [bands=16] [out=/tmp/render16k.png]

Prints per-band wall times (compile happens inside band 0's timing; bands
1+ reuse the executable — report their sum as the steady-state number)
and a BASELINE-ready summary line.
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    kw = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    size = int(kw.get("size", 16384))
    bands = int(kw.get("bands", 16))
    out = kw.get("out", "")

    import numpy as np

    import gamer_tpu
    from gamer_tpu.engine.pallas_render import render_progressive_pallas
    from gamer_tpu.scene import gax
    from gamer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    galaxy = gax.load("/root/reference/publish/data/galaxies/Spiral.gax")
    scene = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
        config=gamer_tpu.RenderConfig(size=size, ray_step=0.025),
    )

    band_t = [time.perf_counter()]

    def on_progress(frac, _partial):
        band_t.append(time.perf_counter())
        print(f"  band {len(band_t) - 1}: {frac * 100:5.1f}% "
              f"(+{band_t[-1] - band_t[-2]:.2f}s, "
              f"total {band_t[-1] - band_t[0]:.1f}s)", flush=True)
        return True

    print(f"rendering {size}^2 in {bands} bands ...", flush=True)
    t0 = time.perf_counter()
    img = render_progressive_pallas(scene, bands=bands,
                                    on_progress=on_progress)
    wall = time.perf_counter() - t0
    steady = band_t[-1] - band_t[1]  # bands 2..N (band 1 paid the compile)
    n_steady = len(band_t) - 2
    est_nocompile = steady * (n_steady + 1) / max(n_steady, 1)
    # samples/s at the canonical rayStep (~590 samples/ray on this chord)
    px = size * size
    print(f"\n{size}^2: wall {wall:.1f}s (incl band-0 compile), "
          f"steady-state estimate {est_nocompile:.1f}s, "
          f"{px / est_nocompile / 1e6:.1f} Mpixel/s")
    print(f"nonzero pixels: {(img.max(-1) > 0).mean() * 100:.1f}%  "
          f"sum {int(img.sum())}")
    if out:
        from PIL import Image

        # save a 2048^2 preview next to the full frame (a 16K PNG is slow)
        prev = img[::size // 2048, ::size // 2048]
        Image.fromarray(prev).save(out)
        print(f"saved {prev.shape[0]}^2 preview to {out}")
    print(f"RESULT {{\"size\": {size}, \"wall_s\": {wall:.1f}, "
          f"\"steady_s\": {est_nocompile:.1f}}}")


if __name__ == "__main__":
    main()
