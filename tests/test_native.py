"""C++ native runtime tests (auto-built from native/gamer_native.cpp)."""

from __future__ import annotations

import numpy as np
import pytest

from gamer_tpu import native
from gamer_tpu.scene import gax


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable (no g++?)")


def test_gax_codec_byte_exact(fixtures_dir):
    """Native parse == python parse and native serialize == original bytes
    for every fixture."""
    for p in sorted(fixtures_dir.glob("*.gax")):
        raw = p.read_bytes()
        py = gax.loads(raw)
        nat = native.gax_loads(raw)
        assert nat == py, p.name
        assert native.gax_dumps(py) == raw, p.name


def test_gax_load_uses_native_transparently(fixtures_dir):
    import os

    p = fixtures_dir / "Spiral.gax"
    g1 = gax.load(p)
    os.environ["GAMER_TPU_NO_NATIVE"] = "1"
    try:
        # _load is cached; parse directly through the python path instead
        g2 = gax.loads(p.read_bytes())
    finally:
        del os.environ["GAMER_TPU_NO_NATIVE"]
    assert g1 == g2


def test_fits_byte_exact(tmp_path):
    from gamer_tpu.io.fits import write_fits_image

    img = np.random.default_rng(5).uniform(0, 9, (24, 40))
    py_p = tmp_path / "py.fits"
    nat_p = tmp_path / "nat.fits"
    write_fits_image(py_p, img)
    assert native.fits_write(nat_p, img)
    assert py_p.read_bytes() == nat_p.read_bytes()


def test_stars_splat_deterministic():
    a = native.stars_splat(256, 40, 8.0, 2.0, 1.0, 7)
    b = native.stars_splat(256, 40, 8.0, 2.0, 1.0, 7)
    c = native.stars_splat(256, 40, 8.0, 2.0, 1.0, 8)
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()
    assert a.sum() > 0 and (a >= 0).all()


def test_gax_parse_rejects_garbage():
    with pytest.raises(ValueError):
        native.gax_loads(b"\xff\xff\xff\xfe" + b"junk" * 10)
