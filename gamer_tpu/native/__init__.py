"""ctypes bindings for the C++ native runtime (native/gamer_native.cpp).

The library is optional: every entry point has a pure-Python twin
(scene/gax.py, io/fits.py, post/stars.py). `available()` reports whether
the shared library was found (auto-built copies live next to this package
or in <repo>/native/); set GAMER_TPU_NO_NATIVE=1 to force the Python paths.

The .gax and FITS codecs are byte-exact equals of their Python twins
(tested); the star splatter is a distinct seeded backend (std::mt19937_64
vs numpy MT19937 — same statistics, different streams).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional

_GX_MAX_COMPS = 64
_GX_NFIELDS = 13


class GxGalaxy(ctypes.Structure):
    _fields_ = [
        ("display_name", ctypes.c_char * 128),
        ("galaxy_name", ctypes.c_char * 128),
        ("axis", ctypes.c_double * 3),
        ("bulge_dust", ctypes.c_double),
        ("bulge_axis", ctypes.c_double * 3),
        ("winding_b", ctypes.c_double),
        ("winding_n", ctypes.c_double),
        ("no_arms", ctypes.c_double),
        ("arm", ctypes.c_double * 4),
        ("inner_twirl", ctypes.c_double),
        ("warp_amplitude", ctypes.c_double),
        ("warp_scale", ctypes.c_double),
        ("n_comps", ctypes.c_int32),
        ("fields", (ctypes.c_double * _GX_NFIELDS) * _GX_MAX_COMPS),
        ("class_name", (ctypes.c_char * 32) * _GX_MAX_COMPS),
        ("spectrum", (ctypes.c_char * 32) * _GX_MAX_COMPS),
        ("comp_name", (ctypes.c_char * 64) * _GX_MAX_COMPS),
    ]


_lib = None
_tried = False


def _find_library() -> Optional[Path]:
    here = Path(__file__).resolve()
    candidates = [
        here.parent / "libgamer_native.so",
        here.parent.parent.parent / "native" / "libgamer_native.so",
    ]
    for c in candidates:
        if c.exists():
            return c
    # auto-build from source if a toolchain is around (one-time, ~1s)
    src_dir = here.parent.parent.parent / "native"
    if (src_dir / "gamer_native.cpp").exists():
        import subprocess

        try:
            subprocess.run(["make", "-C", str(src_dir)], capture_output=True,
                           timeout=120, check=True)
        except Exception:  # noqa: BLE001 — fall back to the Python twins
            return None
        lib = src_dir / "libgamer_native.so"
        if lib.exists():
            return lib
    return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("GAMER_TPU_NO_NATIVE"):
        return None
    path = _find_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    lib.gx_parse.argtypes = [ctypes.c_char_p, ctypes.c_long,
                             ctypes.POINTER(GxGalaxy)]
    lib.gx_parse.restype = ctypes.c_int
    lib.gx_write.argtypes = [ctypes.POINTER(GxGalaxy),
                             ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.gx_write.restype = ctypes.c_long
    lib.fits_write_f64.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_double),
                                   ctypes.c_int, ctypes.c_int]
    lib.fits_write_f64.restype = ctypes.c_int
    lib.stars_splat.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                                ctypes.c_int, ctypes.c_double, ctypes.c_double,
                                ctypes.c_double, ctypes.c_uint64]
    lib.stars_splat.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------


def gax_loads(data: bytes):
    """Parse .gax bytes with the native codec -> GalaxyData (or None if the
    library is unavailable)."""
    lib = _load()
    if lib is None:
        return None
    from ..scene.schema import ComponentParams, GalaxyData, GalaxyParams

    g = GxGalaxy()
    rc = lib.gx_parse(data, len(data), ctypes.byref(g))
    if rc != 0:
        raise ValueError(f"native gx_parse failed with code {rc}")
    comps = []
    for c in range(g.n_comps):
        f = g.fields[c]
        comps.append(ComponentParams(
            class_name=g.class_name[c].value.decode("utf-8"),
            strength=f[0],
            spectrum=g.spectrum[c].value.decode("utf-8"),
            arm=f[1], z0=f[2], r0=f[3], active=f[4], delta=f[5],
            winding=f[6], scale=f[7], noise_offset=f[8], noise_tilt=f[9],
            ks=f[10], inner=f[11],
            name=g.comp_name[c].value.decode("utf-8"),
        ))
    return GalaxyData(
        display_name=g.display_name.decode("utf-8"),
        params=GalaxyParams(
            name=g.galaxy_name.decode("utf-8"),
            axis=tuple(g.axis),
            bulge_dust=g.bulge_dust,
            bulge_axis=tuple(g.bulge_axis),
            winding_b=g.winding_b,
            winding_n=g.winding_n,
            no_arms=g.no_arms,
            arm1=g.arm[0], arm2=g.arm[1], arm3=g.arm[2], arm4=g.arm[3],
            inner_twirl=g.inner_twirl,
            warp_amplitude=g.warp_amplitude,
            warp_scale=g.warp_scale,
        ),
        components=comps,
    )


def gax_dumps(galaxy) -> Optional[bytes]:
    """Serialize GalaxyData with the native codec (None if unavailable)."""
    lib = _load()
    if lib is None:
        return None
    g = GxGalaxy()
    g.display_name = galaxy.display_name.encode("utf-8")
    gp = galaxy.params
    g.galaxy_name = gp.name.encode("utf-8")
    g.axis[:] = gp.axis
    g.bulge_dust = gp.bulge_dust
    g.bulge_axis[:] = gp.bulge_axis
    g.winding_b = gp.winding_b
    g.winding_n = gp.winding_n
    g.no_arms = gp.no_arms
    g.arm[:] = (gp.arm1, gp.arm2, gp.arm3, gp.arm4)
    g.inner_twirl = gp.inner_twirl
    g.warp_amplitude = gp.warp_amplitude
    g.warp_scale = gp.warp_scale
    g.n_comps = len(galaxy.components)
    for c, cp in enumerate(galaxy.components):
        g.class_name[c].value = cp.class_name.encode("utf-8")
        g.spectrum[c].value = cp.spectrum.encode("utf-8")
        g.comp_name[c].value = cp.name.encode("utf-8")
        f = (cp.strength, cp.arm, cp.z0, cp.r0, cp.active, cp.delta,
             cp.winding, cp.scale, cp.noise_offset, cp.noise_tilt, cp.ks,
             cp.inner, 0.0)
        for k, v in enumerate(f):
            g.fields[c][k] = v
    cap = 1 << 20
    buf = (ctypes.c_uint8 * cap)()
    n = lib.gx_write(ctypes.byref(g), buf, cap)
    if n < 0:
        raise ValueError("native gx_write: buffer too small")
    return bytes(buf[:n])


def fits_write(path, image) -> bool:
    """Write a 2-D float64 FITS image natively; False if unavailable."""
    lib = _load()
    if lib is None:
        return False
    import numpy as np

    img = np.ascontiguousarray(np.asarray(image, np.float64))
    if img.ndim != 2:
        raise ValueError("expected 2-D image")
    lib.fits_write_f64(
        str(path).encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        img.shape[1], img.shape[0])
    return True


def stars_splat(size: int, n_stars: int, base_size: float, size_spread: float,
                strength: float, seed: int):
    """Native star-field overlay -> (size, size, 3) float32, or None."""
    lib = _load()
    if lib is None:
        return None
    import numpy as np

    buf = np.zeros((size, size, 3), np.float32)
    lib.stars_splat(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    size, n_stars, base_size, size_spread, strength,
                    seed if seed else 5489)
    return buf
