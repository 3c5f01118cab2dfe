"""Alternative noise backends: classic Perlin and IQ sin-hash value noise.

The reference ships three Noise implementations but hardcodes Simplex in
every rasterizer constructor (rasterizer.h:57,62,67); Perlin
(source/noise/perlin.{h,cpp}) and IQ value noise (source/noise/iqnoise.cpp)
are selectable-in-principle alternatives. They are provided here with the
same interface as ops.noise for library parity:

  - perlin_raw_3d: Ken Perlin's classic gradient noise, SAMPLE_SIZE=1024
    tables, x2 output scaling (perlin.h:32-37). The reference seeds its
    tables from libc srand/rand (perlin.cpp init); here the tables come
    from a seeded MT19937 — same algorithm, different (but reproducible)
    gradient sets, since libc's rand stream is not part of any observable
    contract (the class is never instantiated by the engine). The lattice
    algorithm itself is conformance-gated against the fixed-table scalar
    twin in oracle/altnoise.py (tests/test_altnoise_oracle.py).
  - iq_value_noise_3d: sin-hash trilinear value noise, exact semantics
    (iqnoise.cpp:34-53), gated against oracle/altnoise.iq_noise.

Both are traceable jnp ops (jit/vmap-safe). Gradient q-triples are
10-bit integer-hash outputs of the lattice index (GRAD_HASH below) so the
production Pallas kernel can regenerate them IN-REGISTER with zero
gathers (ops/pallas_noise._perlin_grad_dot) while this jnp path, the
stored table, and the kernel all decode BIT-IDENTICAL float32 gradient
values.

Backend-dispatched lookups (the ops/noise._perm_take treatment): XLA:TPU
serializes small-table gathers (~10 M lookups/s — ops/noise.py), which
would make full-octave perlin through the XLA/diff engines (alt-noise
FITS) gather-bound, so on TPU the perm and gradient lookups run as
one-hot bfloat16 matmuls against byte-split tables — integer-exact
(every table piece <= 255 is exact in bf16, the f32 dot accumulates one
nonzero term) and value-identical to jnp.take. Hardware RENDERS route
through the Pallas kernel's packed-table twin either way
(ops/pallas_noise.perlin_raw_3d).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_SIZE = 1024
_N_OFF = 0x1000
# 10-bit gradient quantization: q in [0, 1023] <-> g = (q - 511.5)/511.5.
# BOTH decode factors are float32 so the jnp table values and the Pallas
# kernel's in-register decode are bit-identical.
_GRAD_MID = np.float32(511.5)
_GRAD_INV = np.float32(1.0 / 511.5)

# Gradient HASH (since round 5): the gradient triples are a pure integer
# mix of the lattice index instead of a stored table. Measured motivation
# (scripts/perf_perlin.py, v5e-1, 512^2 interleaved A/B): 76.7% of a
# production perlin frame was the chunked lane-gathers, 64 of the 88
# gathers/eval being the 8-chunk gradient table — computing the same
# 10-bit q-triples in-register removes them all. The mix is two rounds of
# multiply-xorshift (lowbias32 constants) over int32 with two's-complement
# wraparound and ARITHMETIC right shifts, so the numpy table build below
# and the Mosaic/jnp in-register twins are bit-identical; component
# extraction uses shift+mask, which reads the same bit fields regardless
# of shift sign-fill. Deviation note: hash gradients are uniform on the
# quantized cube, NOT normalized like perlin.cpp init's g3 — the table
# generation procedure was already a documented deviation (libc rand is
# unobservable; the class is never instantiated), and the oracle gates
# take the tables as arguments, so the lattice ALGORITHM stays gated.
GRAD_HASH_M1 = int(np.uint32(0x7FEB352D).view(np.int32))
GRAD_HASH_M2 = int(np.uint32(0x846CA68B).view(np.int32))


def grad_hash_seedk(seed: int) -> int:
    """The per-seed xor key folded into the gradient hash."""
    return int(np.uint32((seed * 0x9E3779B9) & 0xFFFFFFFF).view(np.int32))


# the Pallas kernel has no seed plumbing (like the packed tables before it,
# the production path renders the default table set)
PERLIN_DEFAULT_SEEDK = grad_hash_seedk(94)


def _grad_hash_q(idx, seed: int):
    """(qx, qy, qz) 10-bit gradient components of lattice index ``idx`` —
    the numpy twin of ops/pallas_noise._perlin_grad_dot's in-register mix
    (kept op-for-op identical; tests/test_altnoise_oracle.py gates the
    equality)."""
    sk = np.int32(grad_hash_seedk(seed))
    with np.errstate(over="ignore"):
        h = (np.asarray(idx, np.int32) & np.int32(SAMPLE_SIZE - 1)) ^ sk
        h = h * np.int32(GRAD_HASH_M1)
        h = h ^ (h >> 15)
        h = h * np.int32(GRAD_HASH_M2)
        h = h ^ (h >> 13)
    return h & 1023, (h >> 10) & 1023, (h >> 20) & 1023


@functools.lru_cache(maxsize=8)
def _perlin_build(seed: int):
    """(perm_base (1024,) i32, q (1024, 3) i32, g3 decoded (1024, 3) f32).

    perm is a true MT19937-shuffled permutation (the bijection is part of
    classic Perlin's structure); the gradient q-triples come from
    _grad_hash_q so the Pallas kernel can regenerate them in-register
    without a table gather."""
    rng = np.random.Generator(np.random.MT19937(seed))
    B = SAMPLE_SIZE
    perm = np.arange(B)
    rng.shuffle(perm)
    qx, qy, qz = _grad_hash_q(np.arange(B), seed)
    q = np.stack([qx, qy, qz], axis=-1).astype(np.int32)
    g3q = (q.astype(np.float32) - _GRAD_MID) * _GRAD_INV
    return perm.astype(np.int32), q, g3q


@functools.lru_cache(maxsize=8)
def _perlin_tables(seed: int):
    """Doubled (+2) tables in the reference's layout (perlin.h:59-61):
    p[i] == p_base[i & 1023] over the reachable index range."""
    perm, _, g3q = _perlin_build(seed)
    perm = np.concatenate([perm, perm, perm[:2]]).astype(np.int32)
    g3 = np.concatenate([g3q, g3q, g3q[:2]], axis=0)
    return perm, g3.astype(np.float64)


@functools.lru_cache(maxsize=8)
def perlin_packed_tables(seed: int = 94):
    """Packed int32 permutation for the Pallas kernel's chunked lane
    gathers:

    perm_packed: (512,) — word w holds perm_base[2w] | perm_base[2w+1]<<16

    (Gradients are no longer packed: the kernel regenerates the q-triples
    in-register via the gradient hash — see the GRAD_HASH note above.)
    """
    perm, _, _ = _perlin_build(seed)
    p64 = perm.astype(np.int64)
    return (p64[0::2] | (p64[1::2] << 16)).astype(np.int32)


def _onehot_dot(idx, table_bf16):
    """one_hot(idx & 1023, 1024) @ table on the MXU — the gather-free
    TPU lookup. Every table entry is <= 255 (byte pieces), so the bf16
    one-hot rows and table are exact and the f32 dot accumulates exactly
    one nonzero term: value-identical to jnp.take."""
    i = idx & (SAMPLE_SIZE - 1)
    oh = (i[..., None] == jnp.arange(SAMPLE_SIZE, dtype=jnp.int32)).astype(
        jnp.bfloat16)
    return jax.lax.dot_general(
        oh, table_bf16, (((oh.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=8)
def _byte_split_tables(seed: int):
    """bf16 byte-piece perm table for the one-hot lookups: (1024, 2)
    [lo, hi] bytes (each piece <= 255 is bf16-exact)."""
    perm, _, _ = _perlin_build(seed)
    p64 = perm.astype(np.int64)
    perm_bytes = np.stack([p64 & 255, p64 >> 8], axis=-1)
    return perm_bytes.astype(np.float32)


def _perm_take_1024(perm, idx, seed: int):
    """perm[idx] — jnp.take off-TPU; byte-split one-hot matmul on TPU
    (values 0..1023 ride as lo/hi bytes, both bf16-exact)."""
    if jax.default_backend() != "tpu":
        return jnp.take(perm, idx, axis=0)
    perm_bytes = _byte_split_tables(seed)
    out = _onehot_dot(idx, jnp.asarray(perm_bytes, jnp.bfloat16))
    return (out[..., 0] + 256.0 * out[..., 1]).astype(jnp.int32)


def _grad_decode(idx, dtype, seed: int):
    """The gradient triple of lattice index ``idx``, regenerated
    in-register (no table, no gather — the hash twin of the stored g3;
    BIT-identical to _perlin_build's decoded table on every backend: the
    mix is pure int32 and the decode constants are the same two f32s)."""
    sk = jnp.int32(grad_hash_seedk(seed))
    h = (idx.astype(jnp.int32) & jnp.int32(SAMPLE_SIZE - 1)) ^ sk
    h = h * jnp.int32(GRAD_HASH_M1)
    h = h ^ (h >> 15)
    h = h * jnp.int32(GRAD_HASH_M2)
    h = h ^ (h >> 13)
    g = jnp.stack([(h & 1023).astype(jnp.float32),
                   ((h >> 10) & 1023).astype(jnp.float32),
                   ((h >> 20) & 1023).astype(jnp.float32)], axis=-1)
    return ((g - _GRAD_MID) * _GRAD_INV).astype(dtype)


def perlin_raw_3d(x, y, z, seed: int = 94):
    """Classic Perlin gradient noise in roughly [-1, 1] (x2 scaling like
    Perlin::raw_3d, perlin.h:32-37)."""
    perm_np, _g3_np = _perlin_tables(seed)
    dtype = jnp.result_type(x, y, z)
    perm = jnp.asarray(perm_np)

    def setup(v):
        t = v + _N_OFF
        b0 = t.astype(jnp.int32) & (SAMPLE_SIZE - 1)
        b1 = (b0 + 1) & (SAMPLE_SIZE - 1)
        r0 = t - jnp.trunc(t)
        r1 = r0 - 1.0
        return b0, b1, r0, r1

    bx0, bx1, rx0, rx1 = setup(jnp.asarray(x, dtype))
    by0, by1, ry0, ry1 = setup(jnp.asarray(y, dtype))
    bz0, bz1, rz0, rz1 = setup(jnp.asarray(z, dtype))

    i = _perm_take_1024(perm, bx0, seed)
    j = _perm_take_1024(perm, bx1, seed)
    b00 = _perm_take_1024(perm, i + by0, seed)
    b10 = _perm_take_1024(perm, j + by0, seed)
    b01 = _perm_take_1024(perm, i + by1, seed)
    b11 = _perm_take_1024(perm, j + by1, seed)

    def s_curve(t):
        return t * t * (3.0 - 2.0 * t)

    def at3(q_idx, rx, ry, rz):
        g = _grad_decode(q_idx, dtype, seed)
        return rx * g[..., 0] + ry * g[..., 1] + rz * g[..., 2]

    t = s_curve(rx0)
    sy = s_curve(ry0)
    sz = s_curve(rz0)

    def lerp(w, a, b):
        return a + w * (b - a)

    a = lerp(t, at3(b00 + bz0, rx0, ry0, rz0), at3(b10 + bz0, rx1, ry0, rz0))
    b = lerp(t, at3(b01 + bz0, rx0, ry1, rz0), at3(b11 + bz0, rx1, ry1, rz0))
    c = lerp(sy, a, b)
    a = lerp(t, at3(b00 + bz1, rx0, ry0, rz1), at3(b10 + bz1, rx1, ry0, rz1))
    b = lerp(t, at3(b01 + bz1, rx0, ry1, rz1), at3(b11 + bz1, rx1, ry1, rz1))
    d = lerp(sy, a, b)
    return 2.0 * lerp(sz, c, d)


@functools.lru_cache(maxsize=8)
def _perlin_build2(seed: int):
    """(g2 decoded (1024, 2) f32) — the 2-D gradient table (perlin.cpp
    init's g2), 10-bit quantized like g3. Drawn from an independent
    MT19937 stream keyed off ``seed`` (the reference interleaves g1/g2/g3
    from ONE libc rand stream — not an observable contract, see the
    module docstring's table-generation note)."""
    rng = np.random.Generator(np.random.MT19937(seed ^ 0x2D2D))
    g2 = rng.uniform(-1.0, 1.0, (SAMPLE_SIZE, 2))
    g2 /= np.linalg.norm(g2, axis=1, keepdims=True)
    q = np.clip(np.rint(g2 * 511.5 + 511.5), 0, 1023).astype(np.int32)
    return (q.astype(np.float32) - _GRAD_MID) * _GRAD_INV


@functools.lru_cache(maxsize=8)
def _perlin_tables2(seed: int):
    """Doubled (+2) 2-D tables in the reference's layout (perlin.h:59-61)."""
    perm, _, _ = _perlin_build(seed)
    perm = np.concatenate([perm, perm, perm[:2]]).astype(np.int32)
    g2q = _perlin_build2(seed)
    g2 = np.concatenate([g2q, g2q, g2q[:2]], axis=0)
    return perm, g2.astype(np.float64)


def perlin_raw_2d(x, y, seed: int = 94):
    """Classic Perlin 2-D gradient noise, x2 scaling (perlin.h:26-30) —
    the 2-D half of the Noise interface. Library parity only: no
    component samples 2-D noise, so this stays on plain jnp.take (no
    one-hot/packed-table tiering like the production 3-D path)."""
    perm_np, g2_np = _perlin_tables2(seed)
    dtype = jnp.result_type(x, y)
    perm = jnp.asarray(perm_np)
    g2 = jnp.asarray(g2_np, dtype)

    def setup(v):
        t = v + _N_OFF
        b0 = t.astype(jnp.int32) & (SAMPLE_SIZE - 1)
        b1 = (b0 + 1) & (SAMPLE_SIZE - 1)
        r0 = t - jnp.trunc(t)
        r1 = r0 - 1.0
        return b0, b1, r0, r1

    bx0, bx1, rx0, rx1 = setup(jnp.asarray(x, dtype))
    by0, by1, ry0, ry1 = setup(jnp.asarray(y, dtype))

    i = jnp.take(perm, bx0, axis=0)
    j = jnp.take(perm, bx1, axis=0)
    b00 = jnp.take(perm, i + by0, axis=0)
    b10 = jnp.take(perm, j + by0, axis=0)
    b01 = jnp.take(perm, i + by1, axis=0)
    b11 = jnp.take(perm, j + by1, axis=0)

    def s_curve(t):
        return t * t * (3.0 - 2.0 * t)

    def lerp(w, a, b):
        return a + w * (b - a)

    def at2(q_idx, rx, ry):
        g = jnp.take(g2, q_idx, axis=0)
        return rx * g[..., 0] + ry * g[..., 1]

    sx = s_curve(rx0)
    sy = s_curve(ry0)
    a = lerp(sx, at2(b00, rx0, ry0), at2(b10, rx1, ry0))
    b = lerp(sx, at2(b01, rx0, ry1), at2(b11, rx1, ry1))
    return 2.0 * lerp(sy, a, b)


def iq_value_noise_2d(x, y):
    """IQnoise::raw_2d (iqnoise.h:22-24): the 3-D value noise at z = 0."""
    return iq_value_noise_3d(x, y, jnp.zeros_like(jnp.asarray(x)))


def iq_value_noise_3d(x, y, z):
    """IQ sin-hash trilinear value noise (iqnoise.cpp:34-53), in [-1, 1]-ish
    (the hash is in [0,1); the reference's comment claims [-1,1] — kept
    as-written)."""
    dtype = jnp.result_type(x, y, z)
    x = jnp.asarray(x, dtype)
    y = jnp.asarray(y, dtype)
    z = jnp.asarray(z, dtype)
    px = jnp.floor(x)
    py = jnp.floor(y)
    pz = jnp.floor(z)
    fx = x - px
    fy = y - py
    fz = z - pz
    fx = fx * fx * (3.0 - 2.0 * fx)
    fy = fy * fy * (3.0 - 2.0 * fy)
    fz = fz * fz * (3.0 - 2.0 * fz)
    n = px + py * 157.0 + 113.0 * pz

    def h(o):
        v = jnp.sin(n + o) * 753.5453123
        return v - jnp.floor(v)

    def lerp(w, a, b):
        return a + w * (b - a)

    return lerp(
        fz,
        lerp(fy, lerp(fx, h(0.0), h(1.0)), lerp(fx, h(157.0), h(158.0))),
        lerp(fy, lerp(fx, h(113.0), h(114.0)), lerp(fx, h(270.0), h(271.0))),
    )
