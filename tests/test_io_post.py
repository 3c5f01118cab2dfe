"""IO (FITS, RenderParams.dat) and post (HEALPix, Mollweide, stars) tests."""

from __future__ import annotations

import numpy as np
import pytest

from gamer_tpu.io.fits import read_fits_image, write_fits_channels, write_fits_image
from gamer_tpu.io.renderparams import RenderParamsFile
from gamer_tpu.post.healpix import ang2pix_ring, npix, pix2ang_ring, pix2vec_ring
from gamer_tpu.post.mollweide import mollweide_image, mollweide_lookup
from gamer_tpu.post.stars import render_star_field


@pytest.mark.parametrize("nside", [1, 2, 8, 32])
def test_healpix_roundtrip(nside):
    ip = np.arange(npix(nside))
    th, ph = pix2ang_ring(nside, ip)
    assert (ang2pix_ring(nside, th, ph) == ip).all()
    v = pix2vec_ring(nside, ip)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-12)
    # area uniformity: z histogram of the vectors is flat-ish
    assert abs(float(v[:, 2].mean())) < 1e-9


def test_mollweide_mask_and_lookup():
    size = 64
    theta, phi, valid = mollweide_lookup(size)
    # the projection fills an ellipse: more than a third, less than all
    frac = valid.mean()
    assert 0.3 < frac < 1.0
    assert theta.shape == (size, size)
    m = np.arange(npix(8), dtype=np.float64)
    img = mollweide_image(m, 8, size)
    assert img.shape == (size, size, 3)
    assert (img[~valid] == 0).all()
    assert img[valid].max() > 0


def test_fits_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(0, 9, (24, 24))
    p = tmp_path / "x.fits"
    write_fits_image(p, img)
    raw = p.read_bytes()
    assert len(raw) % 2880 == 0
    assert raw[:6] == b"SIMPLE"
    back = read_fits_image(p)
    np.testing.assert_array_equal(back, img[::-1])

    paths = write_fits_channels(tmp_path / "chan", np.zeros((8, 8, 3)))
    assert [p.name for p in paths] == ["chan_r.fits", "chan_g.fits", "chan_b.fits"]


def test_renderparams_sample_and_roundtrip(fixtures_dir):
    sample = fixtures_dir.parent / "RenderParams.dat"
    rp = RenderParamsFile.load(sample)
    assert rp.size == 384
    assert rp.camera.fov == 90.0
    assert "Green" in rp.spectra  # the sample carries a user-added spectrum
    rt = RenderParamsFile.loads(rp.dumps())
    assert rt.dumps() == rp.dumps()
    cfg = rp.to_render_config(size=64)
    assert cfg.size == 64 and cfg.ray_step == rp.ray_step


def test_star_field_deterministic_and_bounded():
    # star splat width = int(int(sz*size)/245) (buffer2d.cpp:156) — tiny
    # frames/sizes yield zero-width splats exactly like the reference, so
    # test with a size/star_size combination that actually draws
    a = render_star_field(256, 40, 8.0, 2.0, 1.0, seed=7)
    b = render_star_field(256, 40, 8.0, 2.0, 1.0, seed=7)
    c = render_star_field(256, 40, 8.0, 2.0, 1.0, seed=8)
    np.testing.assert_array_equal(a, b)
    assert a.sum() > 0, "stars should be visible at this size"
    assert (a != c).any()
    assert a.shape == (256, 256, 3) and (a >= 0).all()
    assert render_star_field(32, 0, 1, 1, 1).sum() == 0
    # sub-splat-width config draws nothing (reference quirk, kept)
    assert render_star_field(64, 30, 1.0, 1.0, 1.0, seed=7).sum() == 0


def test_star_field_device_matches_host():
    """star_field_device (the fused on-device overlay) reproduces the host
    splatter from identical star_params draws; starred frames keep the
    single-dispatch contract (VERDICT round 1, weak #8)."""
    import numpy as np

    from gamer_tpu.post.stars import (render_star_field, star_field_device,
                                      star_params)

    host = render_star_field(64, 50, 10.0, 2.0, 1.5, seed=7)
    p = star_params(64, 50, 10.0, 2.0, 1.5, seed=7)
    assert p.shape[0] > 10  # real splats at this size
    dev = np.asarray(star_field_device(p, 64))
    np.testing.assert_allclose(dev, host, rtol=0, atol=1e-6)
    # empty field stays empty (and w<2 stars are dropped like the reference)
    assert np.asarray(star_field_device(star_params(64, 0, 1, 1, 1), 64)).sum() == 0


def test_pad_star_rows_bucketed_noop():
    """pad_star_rows pads to power-of-two buckets with numerically inert
    rows, so star count/seed edits reuse the compiled splatter (parameter
    changes must never recompile)."""
    import numpy as np

    from gamer_tpu.post.stars import (pad_star_rows, star_field_device,
                                      star_params)

    p = star_params(64, 50, 10.0, 2.0, 1.5, seed=7)
    padded = pad_star_rows(p)
    assert padded.shape[0] in (64, 128, 256) and padded.shape[0] >= p.shape[0]
    np.testing.assert_array_equal(
        np.asarray(star_field_device(padded, 64)),
        np.asarray(star_field_device(p, 64)))
    # nearby star counts land in the SAME bucket -> same jit shape
    p2 = star_params(64, 45, 10.0, 2.0, 1.5, seed=9)
    assert pad_star_rows(p2).shape[0] == padded.shape[0]
    assert pad_star_rows(np.zeros((0, 6), np.float32)).shape[0] == 0
