"""2-D gaussian star-field overlay — Buffer2D::RenderStars/RenderGaussian
parity (source/util/buffer2d.cpp:140-173, 224-243).

Per star: a uniform position, a warm-biased color (each channel
min(U+0.6, ...) with the green channel capped by red), a gaussian size
(floored at base/3), a strength sz*|N(strength, strength)|, splatted as
exp(-d^2/0.01) and max-combined into the buffer. The reference draws from
unseeded libc rand(); this implementation is seeded (RenderConfig.star_seed)
— the determinism the in-tree oracle obtains by omitting the overlay
(galaxy_repro.py harness renders without stars), kept off by default
(no_stars == 0).
"""

from __future__ import annotations

import numpy as np

from ..utils.rng import Rng


def render_star_field(size: int, no_stars: int, star_size: float,
                      star_size_spread: float, strength: float,
                      seed: int = 0) -> np.ndarray:
    """(size, size, 3) float32 star overlay, added to the radiance buffer at
    assembly time (rasterizer.cpp:320-321)."""
    buf = np.zeros((size, size, 3), dtype=np.float32)
    if no_stars <= 0:
        return buf
    rng = Rng(seed if seed else 5489)
    for _ in range(int(no_stars)):
        x = rng.next_int(0, size - 1)
        y = rng.next_int(0, size - 1)
        cx = min(rng.next_double() + 0.6, 1.0)
        cy = min(rng.next_double() + 0.6, cx)
        cz = min(rng.next_double() + 0.6, 1.0)
        sz = max(rng.next_gaussian(star_size, star_size_spread), star_size / 3.0)
        w = int(int(sz * size) / 245.0)
        ss = sz * abs(rng.next_gaussian(strength, strength))
        if w < 2:
            continue
        _splat_gaussian(buf, x, y, w, np.array([cx, cy, cz], np.float32) * ss)
    return buf


def _splat_gaussian(buf: np.ndarray, i: int, j: int, w: int, cs: np.ndarray) -> None:
    """Max-combine a gaussian splat of width w at (i, j) — vectorized
    equivalent of the reference's per-texel loop (buffer2d.cpp:224-243)."""
    size = buf.shape[0]
    xs = np.arange(-(w // 2), w // 2)
    if xs.size == 0:
        return
    dx = xs / float(w)
    d2 = dx[:, None] ** 2 + dx[None, :] ** 2
    v = np.exp(-d2 / 0.01).astype(np.float32)
    xi = i + xs
    yj = j + xs
    mx = (xi >= 0) & (xi < size)
    my = (yj >= 0) & (yj < size)
    # buffer is indexed [y, x] (row-major image); Set(xx, yy) = [yy, xx]
    sub = buf[np.ix_(yj[my], xi[mx])]
    splat = v[np.ix_(my.nonzero()[0], mx.nonzero()[0])][..., None] * cs
    # reference loops x (cols) outer, y (rows) inner with v indexed [dx, dy];
    # v is symmetric in (dx, dy) so orientation doesn't matter
    buf[np.ix_(yj[my], xi[mx])] = np.maximum(sub, splat.astype(np.float32))
