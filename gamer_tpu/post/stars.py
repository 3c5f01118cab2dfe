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


def star_params(size: int, no_stars: int, star_size: float,
                star_size_spread: float, strength: float,
                seed: int = 0) -> np.ndarray:
    """The seeded per-star draws as a (K, 6) float32 array of
    [x, y, w, cs_r, cs_g, cs_b] rows (w < 2 stars already dropped, like the
    reference's skip) — the tiny host side of the overlay. The splatting
    itself can then run on host (render_star_field) or fused on device
    (star_field_device), from identical parameters."""
    rows = []
    if no_stars > 0:
        rng = Rng(seed if seed else 5489)
        for _ in range(int(no_stars)):
            x = rng.next_int(0, size - 1)
            y = rng.next_int(0, size - 1)
            cx = min(rng.next_double() + 0.6, 1.0)
            cy = min(rng.next_double() + 0.6, cx)
            cz = min(rng.next_double() + 0.6, 1.0)
            sz = max(rng.next_gaussian(star_size, star_size_spread),
                     star_size / 3.0)
            w = int(int(sz * size) / 245.0)
            ss = sz * abs(rng.next_gaussian(strength, strength))
            if w < 2:
                continue
            rows.append([x, y, w, cx * ss, cy * ss, cz * ss])
    return np.asarray(rows, np.float32).reshape(-1, 6)


def pad_star_rows(rows: np.ndarray) -> np.ndarray:
    """Pad (K, 6) star rows to the next power-of-two bucket (>= 64) with
    zero rows — a w = 0 row splats an empty window, so padding is a no-op
    numerically. Callers that jit the device splatter pass padded rows so
    the compiled executable sees a handful of stable shapes instead of one
    per exact star count: star seed/count edits are NUMERIC parameter
    changes and must not recompile (the scene_prep invariant)."""
    K = rows.shape[0]
    if K == 0:
        return rows
    bucket = 64
    while bucket < K:
        bucket *= 2
    if bucket > K:
        rows = np.concatenate([rows, np.zeros((bucket - K, 6), np.float32)])
    return rows


def render_star_field(size: int, no_stars: int, star_size: float,
                      star_size_spread: float, strength: float,
                      seed: int = 0) -> np.ndarray:
    """(size, size, 3) float32 star overlay, added to the radiance buffer at
    assembly time (rasterizer.cpp:320-321)."""
    buf = np.zeros((size, size, 3), dtype=np.float32)
    for row in star_params(size, no_stars, star_size, star_size_spread,
                           strength, seed):
        x, y, w = int(row[0]), int(row[1]), int(row[2])
        _splat_gaussian(buf, x, y, w, row[3:6].astype(np.float32))
    return buf


def star_field_device(params, size: int):
    """The overlay as ONE dense device op: per pixel, the max over stars of
    the windowed gaussian splat (buffer2d.cpp:224-243 max-combine). params
    is star_params' (K, 6) array — the only host->device traffic, ~24 bytes
    per star instead of a frame-sized buffer; lets the starred render keep
    the single fused render+overlay+post dispatch. K * size^2 * 3 mul-adds:
    a 512^2 frame with 1000 stars is ~0.8 GFLOP, milliseconds on a TPU.

    Matches the host splatter's geometry exactly (same window bounds, same
    dx = offset/w normalization); exp is evaluated on device, so values may
    differ from the host overlay in the last float32 ulp — the overlay is
    outside the conformance contract (the reference's is unseeded rand()
    and its own oracle omits it)."""
    import jax
    import jax.numpy as jnp

    params = jnp.asarray(params, jnp.float32)  # traceable (jit-fusable)
    K = params.shape[0]
    if K == 0:
        return jnp.zeros((size, size, 3), jnp.float32)
    # chunk the running max so peak memory is CHUNK frames, not K
    CHUNK = 8
    pad = (-K) % CHUNK
    if pad:
        # w = 0 padding rows contribute an empty window (all-zero splat)
        params = jnp.concatenate(
            [params, jnp.zeros((pad, 6), jnp.float32)])
    chunks = params.reshape(-1, CHUNK, 6)
    col = jnp.arange(size, dtype=jnp.float32)

    def body(acc, pc):
        xs, ys, ws, cs = pc[:, 0], pc[:, 1], pc[:, 2], pc[:, 3:6]
        wsafe = jnp.where(ws == 0, 1.0, ws)
        ox = col[None, :] - xs[:, None]
        oy = col[None, :] - ys[:, None]
        half = jnp.floor(ws * 0.5)
        # window = arange(-(w//2), w//2): inclusive low, exclusive high
        in_x = (ox >= -half[:, None]) & (ox < half[:, None])
        in_y = (oy >= -half[:, None]) & (oy < half[:, None])
        # separable: exp(-(dx^2+dy^2)/.01) == exp(-dx^2/.01)*exp(-dy^2/.01)
        gx = jnp.exp(-((ox / wsafe[:, None]) ** 2) / 0.01) * in_x
        gy = jnp.exp(-((oy / wsafe[:, None]) ** 2) / 0.01) * in_y
        v = gy[:, :, None] * gx[:, None, :]          # (C, y, x)
        field = v[..., None] * cs[:, None, None, :]  # (C, y, x, 3)
        return jnp.maximum(acc, jnp.max(field, axis=0)), None

    acc0 = jnp.zeros((size, size, 3), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, chunks)
    return out


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
