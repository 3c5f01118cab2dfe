"""In-kernel (Mosaic) math + simplex noise for the Pallas render kernel.

Everything here operates on (8, 128) float32/int32 tiles inside a
pallas_call. Differences from ops/noise.py forced by the Mosaic TPU target:

  - the 512-entry permutation lookup runs as four 128-lane dynamic gathers
    (jnp.take_along_axis within a tile row) + chunk selects — Mosaic has no
    general 1-D gather, but lane-wise dynamic_gather is native
  - atan/atan2 are unimplemented primitives on the TC core; this module
    carries float32 minimax implementations (range-reduced, ~2 ulp)
  - octave loops are python-unrolled (static counts), matching
    noise.cpp:81-180 semantics exactly otherwise

Semantics sources: simplexnoise.cpp:173+ (raw), noise.cpp:162-180 (octave),
noise.cpp:81-128 (ridged multifractal).
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.141592653589793

# Profiling hooks (scripts/perf_ab.py). NEVER set in production — they
# change rendered values.
# >0 caps every octave loop at this count (measures noise-cost share):
ABLATE_OCTAVES = 0
# nonzero replaces the table gathers with arithmetic of similar register
# shape (measures the gather share of a noise eval; trip counts and gating
# are unaffected because noise feeds emission values, not the march):
ABLATE_GATHERS = 0


# ---------------------------------------------------------------------------
# float32 atan / atan2 (Mosaic lacks the primitives)
# ---------------------------------------------------------------------------


def atan_f32(x):
    """Minimax float32 arctangent — range-reduced, max error ~2 ulp."""
    ax = jnp.abs(x)
    big = ax > 2.414213562373095   # tan(3*pi/8)
    mid = ax > 0.4142135623730950  # tan(pi/8)
    safe = jnp.where(ax == 0, jnp.ones_like(ax), ax)
    z = jnp.where(big, -1.0 / safe, jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    base = jnp.where(big, jnp.full_like(ax, PI / 2),
                     jnp.where(mid, jnp.full_like(ax, PI / 4),
                               jnp.zeros_like(ax)))
    z2 = z * z
    p = ((8.05374449538e-2 * z2 - 1.38776856032e-1) * z2
         + 1.99777106478e-1) * z2 - 3.33329491539e-1
    r = base + (z + z * z2 * p)
    return jnp.where(x < 0, -r, r)


def atan2_f32(y, x):
    """float32 atan2 built on atan_f32 with full quadrant handling."""
    safe_x = jnp.where(x == 0, jnp.ones_like(x), x)
    r = atan_f32(y / safe_x)
    # x < 0: shift by +-pi toward y's sign (atan2 convention, y==0 -> +pi)
    shift = jnp.where(y < 0, jnp.full_like(y, -PI), jnp.full_like(y, PI))
    r = jnp.where(x < 0, r + shift, r)
    # x == 0: +-pi/2 by y's sign; (0, 0) -> 0
    vert = jnp.where(y > 0, jnp.full_like(y, PI / 2),
                     jnp.where(y < 0, jnp.full_like(y, -PI / 2),
                               jnp.zeros_like(y)))
    return jnp.where(x == 0, vert, r)


# ---------------------------------------------------------------------------
# permutation lookup + raw simplex
# ---------------------------------------------------------------------------


def _packed_word(perm_rows, idx):
    """One lane-gather of the packed word (tables.PERM_PACKED32 layout).

    perm_rows: (R, 128) int32 broadcast across tile rows; idx: (R, 128)
    int32 in [0, 512). Because the table is PERM_HALF repeated
    (perm[i] == perm[i & 255]), bit 7 selects the byte and bits 0-6 the
    lane; bit 8 is redundant.
    """
    lane = idx & 127
    hi = (idx >> 7) & 1
    if ABLATE_GATHERS:
        return lane * jnp.int32(1103515245) & jnp.int32(0x7FFFFFF), hi
    return jnp.take_along_axis(perm_rows, lane, axis=1), hi


def perm_lookup(perm_rows, idx):
    """perm[idx] for idx int32 in [0, 512): 1 lane-gather + byte extract
    (variable shift by 8*hi instead of a select between extractions)."""
    w, hi = _packed_word(perm_rows, idx)
    return (w >> (hi << 3)) & 255


def mod12_lookup(perm_rows, idx):
    """perm[idx] % 12 from the packed word — no gather beyond perm_lookup's,
    no vector integer mod."""
    w, hi = _packed_word(perm_rows, idx)
    return (w >> ((hi << 3) + 16)) & 255


def _grad_dot(gi, x, y, z):
    """dot(GRAD3[gi], (x, y, z)) — branchless (see ops/noise.py)."""
    group = gi >> 2
    u = jnp.where(group == 2, y, x)
    v = jnp.where(group == 0, y, z)
    u = jnp.where((gi & 1) == 1, -u, u)
    v = jnp.where((gi & 2) == 2, -v, v)
    return u + v


def _fastfloor(x):
    t = jnp.trunc(x)
    return jnp.where(x > 0, t, t - 1.0).astype(jnp.int32)


def raw_noise_3d(perm_rows, x, y, z):
    """Raw 3-D simplex noise on an (R, 128) tile (simplexnoise.cpp:173+)."""
    third = 1.0 / 3.0
    sixth = 1.0 / 6.0
    s = (x + y + z) * third
    i = _fastfloor(x + s)
    j = _fastfloor(y + s)
    k = _fastfloor(z + s)
    t = (i + j + k).astype(x.dtype) * sixth
    x0 = x - (i.astype(x.dtype) - t)
    y0 = y - (j.astype(x.dtype) - t)
    z0 = z - (k.astype(x.dtype) - t)

    A = x0 >= y0
    B = y0 >= z0
    C = x0 >= z0
    one = jnp.ones_like(i)
    zero = jnp.zeros_like(i)
    i1 = jnp.where(A & (B | C), one, zero)
    j1 = jnp.where(~A & B, one, zero)
    k1 = jnp.where((A & ~B & ~C) | (~A & ~B), one, zero)
    i2 = jnp.where(A | (B & C), one, zero)
    j2 = jnp.where(~A | B, one, zero)
    k2 = jnp.where((A & ~B) | (~A & (~B | ~C)), one, zero)

    f1 = i1.astype(x.dtype)
    g1 = j1.astype(x.dtype)
    h1 = k1.astype(x.dtype)
    f2 = i2.astype(x.dtype)
    g2 = j2.astype(x.dtype)
    h2 = k2.astype(x.dtype)

    x1 = x0 - f1 + sixth
    y1 = y0 - g1 + sixth
    z1 = z0 - h1 + sixth
    x2 = x0 - f2 + 2.0 * sixth
    y2 = y0 - g2 + 2.0 * sixth
    z2 = z0 - h2 + 2.0 * sixth
    x3 = x0 - 1.0 + 3.0 * sixth
    y3 = y0 - 1.0 + 3.0 * sixth
    z3 = z0 - 1.0 + 3.0 * sixth

    ii = i & 255
    jj = j & 255
    kk = k & 255
    # the four k-level indices only ever take the two values kk and kk+1
    # (k1, k2 in {0, 1}) — two gather pairs + selects instead of four
    pkk = perm_lookup(perm_rows, kk)
    pkk3 = perm_lookup(perm_rows, kk + 1)
    pkk1 = jnp.where(k1 == 1, pkk3, pkk)
    pkk2 = jnp.where(k2 == 1, pkk3, pkk)
    pj0 = perm_lookup(perm_rows, jj + pkk)
    pj1 = perm_lookup(perm_rows, jj + j1 + pkk1)
    pj2 = perm_lookup(perm_rows, jj + j2 + pkk2)
    pj3 = perm_lookup(perm_rows, jj + 1 + pkk3)
    # gradient indices from the packed perm%12 half — no vector integer mod
    gi0 = mod12_lookup(perm_rows, ii + pj0)
    gi1 = mod12_lookup(perm_rows, ii + i1 + pj1)
    gi2 = mod12_lookup(perm_rows, ii + i2 + pj2)
    gi3 = mod12_lookup(perm_rows, ii + 1 + pj3)

    def contrib(tv, gi, cx, cy, cz):
        tt = tv * tv
        return jnp.where(tv < 0, jnp.zeros_like(tv),
                         tt * tt * _grad_dot(gi, cx, cy, cz))

    n0 = contrib(0.6 - x0 * x0 - y0 * y0 - z0 * z0, gi0, x0, y0, z0)
    n1 = contrib(0.6 - x1 * x1 - y1 * y1 - z1 * z1, gi1, x1, y1, z1)
    n2 = contrib(0.6 - x2 * x2 - y2 * y2 - z2 * z2, gi2, x2, y2, z2)
    n3 = contrib(0.6 - x3 * x3 - y3 * y3 - z3 * z3, gi3, x3, y3, z3)
    return 32.0 * (n0 + n1 + n2 + n3)


# ---------------------------------------------------------------------------
# alternative raw-noise backends (RenderConfig.noise_kind)
# ---------------------------------------------------------------------------


def _chunked_gather(chunks, widx):
    """Gather int32 words from a table wider than one vreg row: Mosaic's
    dynamic gather is lane-local (128 lanes), so an N*128-word table rides
    as N row-broadcast chunks — one lane gather per chunk + selects."""
    lane = widx & 127
    if ABLATE_GATHERS:
        # arithmetic of similar register shape, zero gathers/selects —
        # measures the chunked-gather share of a perlin/alt-noise eval
        return (widx * jnp.int32(1103515245)) & jnp.int32(0x3FFFFFFF)
    sel = widx >> 7
    out = jnp.take_along_axis(chunks[0], lane, axis=1)
    for c in range(1, len(chunks)):
        out = jnp.where(sel == c,
                        jnp.take_along_axis(chunks[c], lane, axis=1), out)
    return out


def perlin_perm_lookup(pperm, idx):
    """p[idx] for the 1024-entry Perlin permutation (values 0..1023): the
    packed table (ops/altnoise.perlin_packed_tables) holds two 16-bit
    entries per word across 4 chunks. Masking by 1023 is value-identical
    to the reference's doubled table (perlin.h:59, p[i] == p[i & 1023])."""
    e = idx & 1023
    w = _chunked_gather(pperm, e >> 1)
    return (w >> ((e & 1) << 4)) & 1023


def _perlin_grad_dot(idx, rx, ry, rz):
    """dot(g3[idx], r) with the gradient triple regenerated IN-REGISTER by
    the gradient hash (ops/altnoise GRAD_HASH note) — no table, no gather.
    Measured motivation (scripts/perf_perlin.py): the 8-chunk gradient
    gathers were 64 of perlin's 88 gathers/eval and the chunked gathers
    were 76.7% of the 512^2 frame. The int32 mix (mul/xor/arith-shift,
    two's-complement wrap) and the f32 decode constants are op-for-op the
    numpy table build, so the values are bit-identical to the g3 table the
    XLA engine and the scalar oracle use."""
    from .altnoise import (GRAD_HASH_M1, GRAD_HASH_M2, PERLIN_DEFAULT_SEEDK)

    h = (idx & 1023) ^ jnp.int32(PERLIN_DEFAULT_SEEDK)
    h = h * jnp.int32(GRAD_HASH_M1)
    h = h ^ (h >> 15)
    h = h * jnp.int32(GRAD_HASH_M2)
    h = h ^ (h >> 13)
    mid = jnp.float32(511.5)
    inv = jnp.float32(1.0 / 511.5)
    gx = ((h & 1023).astype(jnp.float32) - mid) * inv
    gy = (((h >> 10) & 1023).astype(jnp.float32) - mid) * inv
    gz = (((h >> 20) & 1023).astype(jnp.float32) - mid) * inv
    return rx * gx + ry * gy + rz * gz


def perlin_raw_3d(pperm, x, y, z):
    """Classic Perlin gradient noise (perlin.cpp:99-150, x2 of
    perlin.h:32-37) on an (R, 128) tile — the packed-perm + hash-gradient
    twin of ops/altnoise.perlin_raw_3d (cross-engine image gate in
    tests/test_noise_kind.py)."""

    def setup(v):
        t = v + 4096.0
        it = t.astype(jnp.int32)  # trunc; t >= 0 over the sane input range
        b0 = it & 1023
        r0 = t - it.astype(jnp.float32)
        return b0, (b0 + 1) & 1023, r0, r0 - 1.0

    bx0, bx1, rx0, rx1 = setup(x)
    by0, by1, ry0, ry1 = setup(y)
    bz0, bz1, rz0, rz1 = setup(z)

    i = perlin_perm_lookup(pperm, bx0)
    j = perlin_perm_lookup(pperm, bx1)
    b00 = perlin_perm_lookup(pperm, i + by0)
    b10 = perlin_perm_lookup(pperm, j + by0)
    b01 = perlin_perm_lookup(pperm, i + by1)
    b11 = perlin_perm_lookup(pperm, j + by1)

    def s_curve(t):
        return t * t * (3.0 - 2.0 * t)

    def lerp(w, a, b):
        return a + w * (b - a)

    t = s_curve(rx0)
    sy = s_curve(ry0)
    sz = s_curve(rz0)
    a = lerp(t, _perlin_grad_dot(b00 + bz0, rx0, ry0, rz0),
             _perlin_grad_dot(b10 + bz0, rx1, ry0, rz0))
    b = lerp(t, _perlin_grad_dot(b01 + bz0, rx0, ry1, rz0),
             _perlin_grad_dot(b11 + bz0, rx1, ry1, rz0))
    c = lerp(sy, a, b)
    a = lerp(t, _perlin_grad_dot(b00 + bz1, rx0, ry0, rz1),
             _perlin_grad_dot(b10 + bz1, rx1, ry0, rz1))
    b = lerp(t, _perlin_grad_dot(b01 + bz1, rx0, ry1, rz1),
             _perlin_grad_dot(b11 + bz1, rx1, ry1, rz1))
    d = lerp(sy, a, b)
    return 2.0 * lerp(sz, c, d)


def iq_raw_3d(x, y, z):
    """IQ sin-hash trilinear value noise (iqnoise.cpp:34-53) on a tile.

    floor is trunc-adjusted (Mosaic-safe); sin is the backend
    transcendental — the TC core's sin and XLA's libm can disagree in the
    last ulps, which the x753.5453123 fract hash amplifies, so the
    cross-engine gate for this backend is image-statistical on hardware
    (exact under CPU interpret, where both paths share one libm)."""

    def fl(v):
        t = jnp.trunc(v)
        return t - (v < t).astype(v.dtype)

    px, py, pz = fl(x), fl(y), fl(z)
    fx, fy, fz = x - px, y - py, z - pz
    fx = fx * fx * (3.0 - 2.0 * fx)
    fy = fy * fy * (3.0 - 2.0 * fy)
    fz = fz * fz * (3.0 - 2.0 * fz)
    n = px + py * 157.0 + 113.0 * pz

    def h(o):
        v = jnp.sin(n + o) * 753.5453123
        return v - fl(v)

    def lerp(w, a, b):
        return a + w * (b - a)

    return lerp(
        fz,
        lerp(fy, lerp(fx, h(0.0), h(1.0)), lerp(fx, h(157.0), h(158.0))),
        lerp(fy, lerp(fx, h(113.0), h(114.0)), lerp(fx, h(270.0), h(271.0))),
    )


def octave_noise_3d(perm_rows, octaves: int, persistence, scale, x, y, z,
                    raw_fn=None):
    """noise.cpp:162-180; octaves static, unrolled. ``raw_fn`` swaps the
    raw-noise backend (default: packed-table simplex via perm_rows)."""
    if ABLATE_OCTAVES:
        octaves = min(int(octaves), ABLATE_OCTAVES)
    raw = ((lambda a, b, c: raw_noise_3d(perm_rows, a, b, c))
           if raw_fn is None else raw_fn)
    total = jnp.zeros_like(x)
    freq = scale
    amp = 1.0
    max_amp = 0.0
    for _ in range(int(octaves)):
        total = total + raw(x * freq, y * freq, z * freq) * amp
        freq = freq * 2.0
        max_amp = max_amp + amp
        amp = amp * persistence
    return total / max_amp


def ridged_mf(perm_rows, x, y, z, spectral_weights, lacunarity, offset, gain,
              raw_fn=None):
    """noise.cpp:81-128; per-octave f32 coordinate scaling is native here.

    spectral_weights: per-octave pow(freq_k, -0.05) scalars, computed by the
    caller OUTSIDE the kernel (scalar pow is not lowerable on the TC core);
    its length sets the octave count. ``raw_fn`` swaps the raw-noise
    backend (default: packed-table simplex via perm_rows).
    """
    if ABLATE_OCTAVES:
        spectral_weights = spectral_weights[:ABLATE_OCTAVES]
    raw = ((lambda a, b, c: raw_noise_3d(perm_rows, a, b, c))
           if raw_fn is None else raw_fn)
    value = jnp.zeros_like(x)
    weight = jnp.ones_like(x)
    vx, vy, vz = x, y, z
    for sw in spectral_weights:
        signal = raw(vx, vy, vz)
        signal = offset - jnp.abs(signal)
        signal = signal * signal
        signal = signal * weight
        weight = jnp.clip(signal * gain, 0.0, 1.0)
        value = value + signal * sw
        vx = vx * lacunarity
        vy = vy * lacunarity
        vz = vz * lacunarity
    return value * 1.25 - 1.0
