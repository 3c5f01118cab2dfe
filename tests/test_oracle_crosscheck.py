"""Differential validation of gamer_tpu's numpy oracle against the
reference's own in-tree Python oracle (/root/reference/tools/galaxy_repro.py),
run via the PySide6 shim in tests/_pyside6_shim.

The in-tree oracle is pixel-exact against the reference C++ binary by its own
harness (galaxy_repro.py:988-995), so agreement here transfers spec-exactness
to gamer_tpu.oracle.reference (modulo Qt float minutiae shared by the shim and
gamer_tpu.oracle.qtmath — see the shim docstring).
"""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

import numpy as np
import pytest

SHIM = Path(__file__).resolve().parent / "_pyside6_shim"


@pytest.fixture(scope="module")
def repro(reference_tools_dir):
    if "PySide6" not in sys.modules:
        sys.path.insert(0, str(SHIM))
    sys.path.insert(0, str(reference_tools_dir))
    try:
        mod = importlib.import_module("galaxy_repro")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference oracle: {e}")
    # Force the pure-python noise path: numba jit of the shim types won't work
    # and we want the exact float semantics.
    mod.SimplexNoise.USE_NUMBA = False
    return mod


def test_noise_scalars_match(repro):
    """raw simplex / octave / ridged-MF agree to the last float64 bit."""
    from gamer_tpu.oracle import noise as onoise

    rng = np.random.default_rng(42)
    pts = rng.uniform(-3.0, 3.0, size=(200, 3))
    pts = np.concatenate([pts, [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [-1.0, -2.0, 3.0]]])

    ours_raw = onoise.raw_noise_3d(pts[:, 0], pts[:, 1], pts[:, 2])
    ours_oct = onoise.octave_noise_3d(10, 0.7, 0.35, pts[:, 0], pts[:, 1], pts[:, 2])
    ours_rmf = onoise.ridged_mf(pts[:, 0], pts[:, 1], pts[:, 2], 1.3, 9, 2.5, 1.0, 0.8)

    for i, (x, y, z) in enumerate(pts):
        assert repro.SimplexNoise.raw_noise_3d(x, y, z) == ours_raw[i]
        assert repro.SimplexNoise.octave_noise_3d(10, 0.7, 0.35, x, y, z) == ours_oct[i]

    QVector3D = sys.modules["PySide6.QtGui"].QVector3D
    for i, (x, y, z) in enumerate(pts[:50]):
        theirs = repro.SimplexNoise.get_ridged_mf(QVector3D(x, y, z), 1.3, 9, 2.5, 1.0, 0.8)
        # the shim QVector3D rounds to f32; feed the same rounded coords
        x32, y32, z32 = np.float32(x), np.float32(y), np.float32(z)
        ours = onoise.ridged_mf(
            np.float64(x32), np.float64(y32), np.float64(z32), 1.3, 9, 2.5, 1.0, 0.8
        )
        assert theirs == ours


def test_camera_rays_match(repro):
    """coord2ray agrees bit-exactly over a pixel grid."""
    from gamer_tpu.oracle import qtmath as qm

    QVector3D = sys.modules["PySide6.QtGui"].QVector3D
    cam = repro.GamerCamera(
        QVector3D(0.5, 0.0, 0.0), QVector3D(0, 0, 0), QVector3D(0, 1, 0), 90.0
    )
    size = 16
    inv_vp = qm.inv_view_projection((0.5, 0, 0), (0, 0, 0), (0, 1, 0), 90.0)
    ii, jj = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    ours = qm.coord2ray(ii.ravel().astype(np.float64), jj.ravel().astype(np.float64),
                        float(size), inv_vp)
    k = 0
    for i in range(size):
        for j in range(size):
            d = cam.coord2ray(float(i), float(j), float(size))
            np.testing.assert_array_equal(
                np.array([d.x(), d.y(), d.z()], np.float32), ours[k]
            )
            k += 1


def test_gax_loading_matches(repro, fixtures_dir):
    from gamer_tpu.scene import gax

    for path in sorted(fixtures_dir.glob("*.gax")):
        theirs = repro.load_galaxy(path)
        ours = gax.load(path)
        assert theirs.display_name == ours.display_name
        tp, op = theirs.params, ours.params
        assert tp.name == op.name
        # shim QVector3D stores f32; our loader keeps the stream's f64
        np.testing.assert_allclose(
            [tp.axis.x(), tp.axis.y(), tp.axis.z()], np.float32(op.axis), rtol=0, atol=0
        )
        for attr in ("bulge_dust", "winding_b", "winding_n", "no_arms", "arm1",
                     "arm2", "arm3", "arm4", "inner_twirl"):
            assert getattr(tp, attr) == getattr(op, attr), attr
        assert len(theirs.components) == len(ours.components)
        for tc, oc in zip(theirs.components, ours.components):
            assert tc.class_name == oc.class_name
            assert tc.spectrum == oc.spectrum
            for attr in ("strength", "arm", "z0", "r0", "active", "delta",
                         "winding", "scale", "noise_offset", "noise_tilt", "ks", "inner"):
                assert getattr(tc, attr) == getattr(oc, attr), attr


@pytest.mark.parametrize("fixture", ["VortexCloud", "Spiral"])
def test_small_render_exact(repro, fixtures_dir, fixture):
    """Full 16x16 render agrees with the in-tree oracle pixel-exactly."""
    from gamer_tpu.oracle.reference import render_oracle
    from gamer_tpu.scene import gax
    from gamer_tpu.scene.schema import (CameraParams, GalaxyInstance,
                                        RenderConfig, Scene)

    QVector3D = sys.modules["PySide6.QtGui"].QVector3D
    size = 16
    theirs_gal = repro.load_galaxy(fixtures_dir / f"{fixture}.gax")
    cfg = repro.RenderConfig(
        camera=QVector3D(0.5, 0.0, 0.0),
        target=QVector3D(0.0, 0.0, 0.0),
        up=QVector3D(0.0, 1.0, 0.0),
        fov=90.0,
        exposure=1.0,
        gamma=1.0,
        saturation=1.0,
        ray_step=0.025,
        size=size,
    )
    theirs = repro.render_python(theirs_gal, cfg)

    scene = Scene(
        camera=CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0), up=(0, 1, 0), fov=90.0),
        instances=[GalaxyInstance(galaxy=gax.load(fixtures_dir / f"{fixture}.gax"))],
        config=RenderConfig(size=size, ray_step=0.025),
    )
    ours, _ = render_oracle(scene)

    diff = np.abs(theirs.astype(np.int16) - ours.astype(np.int16))
    assert diff.max() == 0, (
        f"{fixture}: {int((diff > 0).sum())} mismatching channel values, max {diff.max()}"
    )
