"""JAX simplex-noise stack — the fidelity-critical numeric core.

Same semantics as the reference noise subsystem (and gamer_tpu.oracle.noise):

  raw 3-D simplex:       source/noise/simplexnoise.cpp:173+ (Gustavson tables)
  octave fractal:        source/noise/noise.cpp:162-180
  ridged multifractal:   source/noise/noise.cpp:81-128 (f32 coordinate
                         scaling per octave — QVector3D semantics)

Computation is dtype-generic: float32 for the production TPU path, float64
(with jax x64) for spec validation. The 12 cube-edge gradients are evaluated
branchlessly from the gradient index instead of a table gather — exact, since
GRAD3 rows for gi<4 are (±1,±1,0), gi<8 are (±1,0,±1), else (0,±1,±1) with
signs given by the low bits of gi (see ops/tables.py).

The permutation-table lookups are data-dependent; their LOWERING is chosen
per backend at trace time (identical integer results either way):

  - CPU/GPU: jnp.take — native gathers are fast there.
  - TPU: a branchless binary select tree over the byte-packed 256-entry
    table (_perm_lookup_tree). XLA:TPU serializes small-table gathers to
    ~10 M lookups/s, which made the whole XLA render path gather-bound
    (measured: raw simplex 9 M evals/s while pow chains run 560 M evals/s
    on the same chip); the select tree is ~70 pure vector ops per lookup
    and fuses, recovering VPU-speed noise for the lockstep/differentiable
    paths. The production Pallas kernel solves the same problem with
    lane-gathers from PERM_PACKED32 (ops/pallas_noise.py).

Octave counts are static (python ints) — loops unroll at trace time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .tables import PERM

_PERM_NP = PERM.astype(np.int32)

# 256-entry half-table byte-packed 4 values/word: word w holds
# PERM[4w..4w+3] in its bytes. PERM is the half-table doubled, so
# PERM[idx] == packed-byte (idx & 255) for every idx the simplex forms.
_PERM_WORDS = [
    int(_PERM_NP[4 * w] | (_PERM_NP[4 * w + 1] << 8)
        | (_PERM_NP[4 * w + 2] << 16) | (_PERM_NP[4 * w + 3] << 24))
    for w in range(64)
]


def _perm() -> jnp.ndarray:
    # jnp.asarray of a host constant per trace — XLA dedupes; caching the
    # device array globally would leak tracers across jit scopes.
    return jnp.asarray(_PERM_NP)


def _perm_lookup_tree(idx):
    """PERM[idx] as a branchless binary select tree over the 64 packed
    words — zero gathers, value-exact (integer selects); see module
    docstring for why TPU needs this."""
    i = idx & 255
    w = i >> 2
    level = [jnp.int32(c) for c in _PERM_WORDS]
    bit = 0
    while len(level) > 1:
        pred = (w & (1 << bit)) != 0
        level = [jnp.where(pred, level[2 * k + 1], level[2 * k])
                 for k in range(len(level) // 2)]
        bit += 1
    word = level[0]
    return (word >> ((i & 3) << 3)) & 255


def _perm_lookup_onehot(idx):
    """PERM[idx] as one-hot(256) @ table on the MXU — also gather-free and
    value-exact: the one-hot rows and the table values (<= 255) are exact
    in bfloat16, and the f32 dot accumulates one nonzero term."""
    i = idx & 255
    oh = (i[..., None] == jnp.arange(256, dtype=jnp.int32)).astype(jnp.bfloat16)
    table = jnp.asarray(_PERM_NP[:256], jnp.bfloat16)
    out = jax.lax.dot_general(
        oh, table, (((oh.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.astype(jnp.int32)


def _perm_take(perm, idx):
    """Backend-dispatched PERM lookup (identical values either way)."""
    if jax.default_backend() == "tpu":
        return _perm_lookup_onehot(idx)
    return jnp.take(perm, idx, axis=0)


def _grad_dot(gi, x, y, z):
    """dot(GRAD3[gi], (x,y,z)) without a table gather.

    GRAD3 layout (tables.py): gi in [0,4): (sx, sy, 0); [4,8): (sx, 0, sz);
    [8,12): (0, sy, sz) where each sign is -1 iff the corresponding selector
    bit of gi is set (bit0 flips the first nonzero, bit1 the second).
    """
    group = gi >> 2  # 0,1,2
    b0 = (gi & 1).astype(jnp.bool_)
    b1 = (gi & 2).astype(jnp.bool_)
    # first operand: x for groups 0,1; y for group 2
    u = jnp.where(group == 2, y, x)
    # second operand: y for group 0; z for groups 1,2
    v = jnp.where(group == 0, y, z)
    u = jnp.where(b0, -u, u)
    v = jnp.where(b1, -v, v)
    return u + v


def fastfloor(x):
    """trunc for x>0 else trunc-1 (simplexnoise.h:130 — NOT floor at exact
    non-positive integers)."""
    t = jnp.trunc(x)
    return jnp.where(x > 0, t, t - 1.0).astype(jnp.int32)


def raw_noise_3d(x, y, z):
    """Raw 3-D simplex noise in [-1, 1], elementwise over any shape."""
    dtype = jnp.result_type(x, y, z)
    one_third = jnp.asarray(1.0, dtype) / 3.0
    one_sixth = jnp.asarray(1.0, dtype) / 6.0

    s = (x + y + z) * one_third
    i = fastfloor(x + s)
    j = fastfloor(y + s)
    k = fastfloor(z + s)
    t = (i + j + k).astype(dtype) * one_sixth
    x0 = x - (i.astype(dtype) - t)
    y0 = y - (j.astype(dtype) - t)
    z0 = z - (k.astype(dtype) - t)

    # Simplex corner ranking — exact transcription of the nested conditionals.
    A = x0 >= y0
    B = y0 >= z0
    C = x0 >= z0
    i1 = (A & (B | C)).astype(jnp.int32)
    j1 = (~A & B).astype(jnp.int32)
    k1 = ((A & ~B & ~C) | (~A & ~B)).astype(jnp.int32)
    i2 = (A | (B & C)).astype(jnp.int32)
    j2 = (~A | B).astype(jnp.int32)
    k2 = ((A & ~B) | (~A & (~B | ~C))).astype(jnp.int32)

    g3 = one_sixth
    x1 = x0 - i1 + g3
    y1 = y0 - j1 + g3
    z1 = z0 - k1 + g3
    x2 = x0 - i2 + 2.0 * g3
    y2 = y0 - j2 + 2.0 * g3
    z2 = z0 - k2 + 2.0 * g3
    x3 = x0 - 1.0 + 3.0 * g3
    y3 = y0 - 1.0 + 3.0 * g3
    z3 = z0 - 1.0 + 3.0 * g3

    perm = _perm()
    ii = i & 255
    jj = j & 255
    kk = k & 255
    pkk = _perm_take(perm, kk)
    pkk1 = _perm_take(perm, kk + k1)
    pkk2 = _perm_take(perm, kk + k2)
    pkk3 = _perm_take(perm, kk + 1)
    pj0 = _perm_take(perm, jj + pkk)
    pj1 = _perm_take(perm, jj + j1 + pkk1)
    pj2 = _perm_take(perm, jj + j2 + pkk2)
    pj3 = _perm_take(perm, jj + 1 + pkk3)
    gi0 = _perm_take(perm, ii + pj0) % 12
    gi1 = _perm_take(perm, ii + i1 + pj1) % 12
    gi2 = _perm_take(perm, ii + i2 + pj2) % 12
    gi3 = _perm_take(perm, ii + 1 + pj3) % 12

    def contrib(tv, gi, cx, cy, cz):
        gd = _grad_dot(gi, cx, cy, cz)
        tt = tv * tv
        return jnp.where(tv < 0, 0.0, tt * tt * gd)

    p6 = jnp.asarray(0.6, dtype)
    n0 = contrib(p6 - x0 * x0 - y0 * y0 - z0 * z0, gi0, x0, y0, z0)
    n1 = contrib(p6 - x1 * x1 - y1 * y1 - z1 * z1, gi1, x1, y1, z1)
    n2 = contrib(p6 - x2 * x2 - y2 * y2 - z2 * z2, gi2, x2, y2, z2)
    n3 = contrib(p6 - x3 * x3 - y3 * y3 - z3 * z3, gi3, x3, y3, z3)
    return 32.0 * (n0 + n1 + n2 + n3)


def _grad_dot_2d(gi, x, y):
    """dot(GRAD3[gi].xy, (x, y)) without a table gather — the 2-D noise
    uses the (x, y) components of the 3-D gradient set
    (simplexnoise.cpp:219 'grad3 used for 2D gradient')."""
    group = gi >> 2  # 0: (±1,±1,0)  1: (±1,0,±1)  2: (0,±1,±1)
    b0 = (gi & 1).astype(jnp.bool_)
    b1 = (gi & 2).astype(jnp.bool_)
    # first nonzero component contributes x (groups 0,1) or y (group 2)
    u = jnp.where(group == 2, y, x)
    u = jnp.where(b0, -u, u)
    # second component contributes y only in group 0 (its sign is bit 1)
    v = jnp.where(b1, -y, y)
    return u + jnp.where(group == 0, v, jnp.zeros_like(v))


def raw_noise_2d(x, y):
    """Raw 2-D simplex noise in [-1, 1], elementwise over any shape
    (simplexnoise.cpp:173-239). Interface parity with Noise::raw_2d
    (noise.h:41) — no component calls it."""
    dtype = jnp.result_type(x, y)
    F2 = jnp.asarray(0.5 * (np.sqrt(3.0) - 1.0), dtype)
    G2 = jnp.asarray((3.0 - np.sqrt(3.0)) / 6.0, dtype)

    s = (x + y) * F2
    i = fastfloor(x + s)
    j = fastfloor(y + s)
    t = (i + j).astype(dtype) * G2
    x0 = x - (i.astype(dtype) - t)
    y0 = y - (j.astype(dtype) - t)

    lower = x0 > y0
    i1 = lower.astype(jnp.int32)
    j1 = (~lower).astype(jnp.int32)

    x1 = x0 - i1 + G2
    y1 = y0 - j1 + G2
    x2 = x0 - 1.0 + 2.0 * G2
    y2 = y0 - 1.0 + 2.0 * G2

    perm = _perm()
    ii = i & 255
    jj = j & 255
    gi0 = _perm_take(perm, ii + _perm_take(perm, jj)) % 12
    gi1 = _perm_take(perm, ii + i1 + _perm_take(perm, jj + j1)) % 12
    gi2 = _perm_take(perm, ii + 1 + _perm_take(perm, jj + 1)) % 12

    def contrib(tv, gi, cx, cy):
        gd = _grad_dot_2d(gi, cx, cy)
        tt = tv * tv
        return jnp.where(tv < 0, 0.0, tt * tt * gd)

    half = jnp.asarray(0.5, dtype)
    n0 = contrib(half - x0 * x0 - y0 * y0, gi0, x0, y0)
    n1 = contrib(half - x1 * x1 - y1 * y1, gi1, x1, y1)
    n2 = contrib(half - x2 * x2 - y2 * y2, gi2, x2, y2)
    return 70.0 * (n0 + n1 + n2)


def octave_noise_2d(octaves: int, persistence, scale, x, y, raw_fn=None):
    """Noise::get 2-D / octave_noise_2d (noise.cpp:47-63,
    simplexnoise.cpp:55-71): the same frequency-doubling combinator over
    raw_2d. ``raw_fn`` swaps the raw backend (simplex default)."""
    import jax

    raw = raw_noise_2d if raw_fn is None else raw_fn
    dtype = jnp.result_type(x, y)
    shape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y))
    pers = jnp.asarray(persistence, dtype)

    def body(carry, _):
        total, freq, amp, max_amp = carry
        total = total + raw(x * freq, y * freq) * amp
        return (total, freq * 2.0, amp * pers, max_amp + amp), None

    init = (
        jnp.zeros(shape, dtype),
        jnp.asarray(scale, dtype),
        jnp.asarray(1.0, dtype),
        jnp.asarray(0.0, dtype),
    )
    (total, _, _, max_amp), _ = jax.lax.scan(body, init, None,
                                             length=int(octaves))
    return total / max_amp


def resolve_raw(kind):
    """Raw-noise backend by name. The reference ships three Noise
    implementations but hardcodes Simplex in every rasterizer constructor
    (rasterizer.h:57,62,67 — Perlin/IQ are commented-out alternatives);
    here the alternatives are actually selectable
    (RenderConfig.noise_kind, XLA engine)."""
    if kind in (None, "simplex"):
        return raw_noise_3d
    if kind == "perlin":
        from .altnoise import perlin_raw_3d

        return perlin_raw_3d
    if kind == "iq":
        from .altnoise import iq_value_noise_3d

        return iq_value_noise_3d
    raise ValueError(
        f"unknown noise kind {kind!r}: expected 'simplex', 'perlin' or 'iq'"
    )


def octave_noise_3d(octaves: int, persistence, scale, x, y, z, raw_fn=None):
    """noise.cpp:162-180 — frequency doubling, persistence amplitudes,
    normalized by total amplitude. `octaves` is static; persistence/scale
    may be traced scalars. The octave loop is a lax.scan so the traced graph
    stays one raw-noise body regardless of octave count (compile time).
    ``raw_fn`` swaps the raw-noise backend (default: reference simplex)."""
    import jax

    raw = raw_noise_3d if raw_fn is None else raw_fn
    dtype = jnp.result_type(x, y, z)
    shape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y), jnp.shape(z))
    pers = jnp.asarray(persistence, dtype)

    def body(carry, _):
        total, freq, amp, max_amp = carry
        total = total + raw(x * freq, y * freq, z * freq) * amp
        return (total, freq * 2.0, amp * pers, max_amp + amp), None

    init = (
        jnp.zeros(shape, dtype),
        jnp.asarray(scale, dtype),
        jnp.asarray(1.0, dtype),
        jnp.asarray(0.0, dtype),
    )
    (total, _, _, max_amp), _ = jax.lax.scan(body, init, None, length=int(octaves))
    return total / max_amp


def ridged_mf(px, py, pz, frequency, octaves: int, lacunarity: float, offset, gain,
              raw_fn=None):
    """noise.cpp:81-128 — ridged multifractal with weight feedback.

    Coordinates scale per octave at the working dtype (the reference rounds
    them through a float32 QVector3D each octave — exact in the f32 path).
    `octaves`/`lacunarity` static; frequency/offset/gain may be traced.
    Octave loop as lax.scan (see octave_noise_3d). ``raw_fn`` swaps the
    raw-noise backend (default: reference simplex).
    """
    import jax

    raw = raw_noise_3d if raw_fn is None else raw_fn
    dtype = jnp.result_type(px, py, pz)
    shape = jnp.broadcast_shapes(jnp.shape(px), jnp.shape(py), jnp.shape(pz))
    lac = jnp.asarray(lacunarity, dtype)
    w = jnp.asarray(-0.05, dtype)

    def body(carry, _):
        value, weight, vx, vy, vz, freq = carry
        signal = raw(vx, vy, vz)
        signal = offset - jnp.abs(signal)
        signal = signal * signal
        signal = signal * weight
        weight = jnp.clip(signal * gain, 0.0, 1.0)
        value = value + signal * jnp.power(freq, w)
        return (value, weight, vx * lac, vy * lac, vz * lac, freq * lac), None

    init = (
        jnp.zeros(shape, dtype),
        jnp.ones(shape, dtype),
        jnp.broadcast_to(jnp.asarray(px, dtype), shape),
        jnp.broadcast_to(jnp.asarray(py, dtype), shape),
        jnp.broadcast_to(jnp.asarray(pz, dtype), shape),
        jnp.asarray(frequency, dtype),
    )
    (value, *_), _ = jax.lax.scan(body, init, None, length=int(octaves))
    return value * 1.25 - 1.0


def offset_octave_noise_3d(octaves: int, persistence, frequency, x, y, z):
    """Noise::get — octave fractal with per-octave coordinate offsets
    (noise.cpp:16-40). Part of the Noise interface; not used by any
    component kernel (kept for library parity)."""
    import jax

    dtype = jnp.result_type(x, y, z)
    shape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y), jnp.shape(z))
    total = jnp.zeros(shape, dtype)
    freq = jnp.asarray(frequency, dtype)
    amp = jnp.asarray(1.0, dtype)
    max_amp = jnp.asarray(0.0, dtype)
    for i in range(int(octaves)):
        total = total + raw_noise_3d(
            (x + 0.1231 * i) * freq, (y + 0.6123 * i) * freq,
            (z + 100.539127 * i) * freq) * amp
        freq = freq * 2.0
        max_amp = max_amp + amp
        amp = amp * persistence
    return total / max_amp


def noise_statistics(sampler, n: int = 100000, lo: float = -1.0,
                     hi: float = 1.0, seed: int = 0):
    """Min/max/mean/std of a noise sampler over random points —
    Noise::calculate_statistics parity (noise.cpp:132-160, the reference's
    unused self-check helper), seeded here."""
    import numpy as np

    rng = np.random.default_rng(seed)
    pts = rng.uniform(lo, hi, size=(int(n), 3))
    vals = np.asarray(sampler(jnp.asarray(pts[:, 0], jnp.float32),
                              jnp.asarray(pts[:, 1], jnp.float32),
                              jnp.asarray(pts[:, 2], jnp.float32)))
    return {"min": float(vals.min()), "max": float(vals.max()),
            "mean": float(vals.mean()), "std": float(vals.std())}
