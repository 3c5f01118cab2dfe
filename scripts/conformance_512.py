"""Production-size conformance: 512^2 TPU Pallas frame vs the spec oracle.

Closes the round-4 VERDICT item 1: every prior hardware gate topped out at
128^2 (the XLA bridge path crashes the TPU worker at >=256^2 frames), so all
512^2+ headline numbers rested on transitive small-size gates plus the
band/shard bit-exactness contracts.  This harness diffs the PRODUCTION Pallas
kernel's 512^2 TPU frame directly against the spec-exact CPU oracle at 512^2
— the same size-parity discipline as the reference's own harness
(/root/reference/tools/galaxy_repro.py:988-1005, which gates at the render
size, not a proxy size).

Usage (each mode is a fresh process so a TPU-worker crash can't poison the
oracle leg, and vice versa — CLAUDE.md tunnel discipline):

  python scripts/conformance_512.py oracle  Spiral 512 /tmp/conf/Spiral.oracle.npz
  python scripts/conformance_512.py tpu     Spiral 512 /tmp/conf/Spiral.tpu.npz
  python scripts/conformance_512.py diff    /tmp/conf/Spiral.oracle.npz /tmp/conf/Spiral.tpu.npz
  python scripts/conformance_512.py all     Spiral TonsOfArms Irregular   # orchestrates

The oracle leg is pure numpy (~0.8 Msamples/s => ~6-10 min per 512^2
fixture on this box).  `diff` prints one JSON line:
  {"fixture": ..., "size": ..., "max_lsb": N, "mean_abs": x,
   "mismatch_px": M, "mismatch_frac": f}
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
FIXTURES = Path("/root/reference/publish/data/galaxies")
OUTDIR = Path(os.environ.get("CONF_OUTDIR", "/tmp/conf512"))
DEFAULT_SIZE = 512


def _scene(fixture: str, size: int):
    import gamer_tpu
    from gamer_tpu.scene import gax

    g = gax.load(FIXTURES / f"{fixture}.gax")
    # singleGalaxy.sh canonical preset (consolerenderer.cpp:52-62 arg order):
    # camera (0.5,0,0) target origin up (0,1,0) fov 90, post all 1, step 0.025.
    return gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=g)],
        config=gamer_tpu.RenderConfig(size=size, ray_step=0.025),
    )


def cmd_oracle(fixture: str, size: int, out: Path) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")  # axon overrides the env var
    import numpy as np

    from gamer_tpu.oracle.reference import render_oracle

    scene = _scene(fixture, size)
    t0 = time.perf_counter()
    img, timings = render_oracle(scene)
    dt = time.perf_counter() - t0
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, img=img, fixture=fixture, size=size,
                        seconds=dt, samples=timings.samples)
    print(f"[oracle] {fixture} {size}^2: {dt:.1f}s "
          f"({timings.samples/dt/1e6:.2f} Msamples/s)", flush=True)


def cmd_tpu(fixture: str, size: int, out: Path) -> None:
    import numpy as np

    from gamer_tpu.engine.pallas_render import render_scene_pallas

    scene = _scene(fixture, size)
    t0 = time.perf_counter()
    img = render_scene_pallas(scene)
    dt = time.perf_counter() - t0
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, img=img, fixture=fixture, size=size, seconds=dt)
    print(f"[tpu] {fixture} {size}^2: {dt:.1f}s (incl. compile)", flush=True)


def cmd_diff(a: Path, b: Path) -> dict:
    import numpy as np

    da, db = np.load(a), np.load(b)
    ia, ib = da["img"], db["img"]
    assert ia.shape == ib.shape, (ia.shape, ib.shape)
    d = np.abs(ia.astype(np.int16) - ib.astype(np.int16))
    px = d.max(-1)
    rec = {
        "fixture": str(da["fixture"]),
        "size": int(da["size"]),
        "max_lsb": int(d.max()),
        "mean_abs": float(d.mean()),
        "mismatch_px": int((px > 0).sum()),
        "mismatch_frac": float((px > 0).mean()),
        "gt1_px": int((px > 1).sum()),
        "gt2_px": int((px > 2).sum()),
    }
    print(json.dumps(rec), flush=True)
    return rec


def _run(mode: str, fixture: str, size: int, out: Path, timeout: int) -> bool:
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    try:
        r = subprocess.run(
            [sys.executable, __file__, mode, fixture, str(size), str(out)],
            env=env, timeout=timeout)
        return r.returncode == 0 and out.exists()
    except subprocess.TimeoutExpired:
        print(f"[all] {mode} {fixture} timed out", flush=True)
        return False


def cmd_all(fixtures: list[str], size: int) -> None:
    """Orchestrate: per fixture, a TPU child then an oracle child, then diff.

    TPU leg first (minutes incl. compile) so a tunnel outage surfaces before
    sinking ~10 CPU-minutes into the oracle leg.
    """
    OUTDIR.mkdir(parents=True, exist_ok=True)
    rows = []
    for fx in fixtures:
        tp = OUTDIR / f"{fx}.{size}.tpu.npz"
        op = OUTDIR / f"{fx}.{size}.oracle.npz"
        if not tp.exists() and not _run("tpu", fx, size, tp, timeout=1800):
            print(f"[all] {fx}: TPU leg failed; skipping", flush=True)
            continue
        if not op.exists() and not _run("oracle", fx, size, op, timeout=7200):
            print(f"[all] {fx}: oracle leg failed; skipping", flush=True)
            continue
        rows.append(cmd_diff(op, tp))
    (OUTDIR / "summary.json").write_text(json.dumps(rows, indent=1))
    print(f"[all] {len(rows)}/{len(fixtures)} fixtures diffed -> "
          f"{OUTDIR}/summary.json", flush=True)


def main() -> None:
    mode = sys.argv[1]
    if mode == "oracle":
        cmd_oracle(sys.argv[2], int(sys.argv[3]), Path(sys.argv[4]))
    elif mode == "tpu":
        cmd_tpu(sys.argv[2], int(sys.argv[3]), Path(sys.argv[4]))
    elif mode == "diff":
        cmd_diff(Path(sys.argv[2]), Path(sys.argv[3]))
    elif mode == "all":
        fixtures = sys.argv[2:] or ["Spiral", "TonsOfArms", "Irregular"]
        cmd_all(fixtures, int(os.environ.get("CONF_SIZE", DEFAULT_SIZE)))
    else:
        raise SystemExit(__doc__)


if __name__ == "__main__":
    main()
