"""Scalar conformance gates for the alternative noise backends.

The reference never instantiates Perlin/IQnoise, so there is no rendered
golden datum — the gate is against exact float64 transcriptions of the
ALGORITHMS (oracle/altnoise.py):

  - IQ value noise (iqnoise.cpp:34-53) is closed-form; the jnp f64 twin
    must match to ~1e-12 (libm-sin last-ulp differences between numpy and
    XLA, amplified x753.5453123 by the fract hash, bound the agreement).
  - Perlin's lattice (perlin.cpp:99-150 + the x2 of perlin.h:32-37) is
    gated with FIXED tables: the same seeded tables feed both the oracle
    twin and the jnp path, so the gate checks the lattice algorithm while
    the table contents stay a reproducible implementation choice (the
    reference's libc rand stream is unobservable — the class is dead code).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamer_tpu.oracle import altnoise as oracle_alt
from gamer_tpu.ops import altnoise as jalt


def _points(n=4096, seed=7, lo=-40.0, hi=40.0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(lo, hi, size=(n, 3))
    # include lattice-edge cases: exact integers, negatives, near-zero
    pts[:8] = [[0, 0, 0], [1, 2, 3], [-1, -2, -3], [0.5, -0.5, 0.25],
               [-0.0, 1.0, -1.0], [10.999999, -10.999999, 0.0],
               [1e-7, -1e-7, 3.0], [39.5, -39.5, 39.5]]
    return pts


def test_iq_matches_oracle_f64():
    pts = _points(seed=11)
    want = oracle_alt.iq_noise(pts[:, 0], pts[:, 1], pts[:, 2])
    with jax.enable_x64(True):
        got = np.asarray(jalt.iq_value_noise_3d(
            jnp.asarray(pts[:, 0], jnp.float64),
            jnp.asarray(pts[:, 1], jnp.float64),
            jnp.asarray(pts[:, 2], jnp.float64)))
    # libm sin (numpy) vs XLA sin can differ in the last ulp; x753.5453123
    # through the fract hash bounds the difference at ~2e-13
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)
    assert want.min() >= 0.0 and want.max() <= 1.0  # hash range, pre-lerp


def test_iq_large_coordinate_hash_args():
    """The components feed scaled coordinates (|n| up to ~1e5); the hash
    must stay in [0, 1) and the twin must track the oracle there too."""
    pts = _points(seed=13, lo=-800.0, hi=800.0)
    want = oracle_alt.iq_noise(pts[:, 0], pts[:, 1], pts[:, 2])
    with jax.enable_x64(True):
        got = np.asarray(jalt.iq_value_noise_3d(
            jnp.asarray(pts[:, 0], jnp.float64),
            jnp.asarray(pts[:, 1], jnp.float64),
            jnp.asarray(pts[:, 2], jnp.float64)))
    # n ~ 2e5 -> sin arg ulp ~3e-11, x753.5 -> ~2.5e-8 transcription bound
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    assert np.isfinite(got).all()


def test_perlin_matches_fixed_table_oracle_f64():
    perm, g3 = jalt._perlin_tables(94)
    pts = _points(seed=17)
    want = oracle_alt.perlin_raw_3d(perm, g3, pts[:, 0], pts[:, 1], pts[:, 2])
    with jax.enable_x64(True):
        got = np.asarray(jalt.perlin_raw_3d(
            jnp.asarray(pts[:, 0], jnp.float64),
            jnp.asarray(pts[:, 1], jnp.float64),
            jnp.asarray(pts[:, 2], jnp.float64), seed=94))
    # same f64 lattice arithmetic; XLA may contract mul+add to FMA
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-13)


def test_perlin_oracle_interpolates_to_zero_at_lattice():
    """At integer lattice points the fractional offsets are 0, so noise3
    reduces to the single corner gradient dotted with the zero offset — 0."""
    perm, g3 = jalt._perlin_tables(94)
    ij = np.mgrid[-3:4, -3:4].reshape(2, -1)
    v = oracle_alt.perlin_raw_3d(perm, g3, ij[0], ij[1], np.zeros(ij.shape[1]))
    np.testing.assert_allclose(v, 0.0, atol=1e-12)


def test_perlin_packed_tables_decode_exactly():
    """The packed int32 permutation the Pallas kernel gathers decodes to
    the SAME values the jnp path uses (two 16-bit entries per word)."""
    perm_full, _ = jalt._perlin_tables(94)
    perm_packed = jalt.perlin_packed_tables(94)
    base = perm_full[:1024].astype(np.int64)
    w = perm_packed.astype(np.int64) & 0xFFFFFFFF
    np.testing.assert_array_equal(w & 0xFFFF, base[0::2])
    np.testing.assert_array_equal((w >> 16) & 0xFFFF, base[1::2])


def test_perlin_grad_hash_matches_table():
    """The in-register gradient hash (ops/pallas_noise._perlin_grad_dot's
    mix == altnoise._grad_decode) regenerates the stored g3 table
    BIT-exactly — the property that lets the production kernel drop all
    64 gradient gathers per eval (scripts/perf_perlin.py: chunked gathers
    were 76.7% of a perlin frame). Also pins the hash's distribution:
    10-bit cube-uniform (a documented deviation from perlin.cpp's
    normalized gradients — the table generation was never reproducible
    against libc rand anyway)."""
    _, g3_full = jalt._perlin_tables(94)
    idx = np.random.default_rng(5).integers(0, 2046, size=513)
    dec = np.asarray(jalt._grad_decode(jnp.asarray(idx, jnp.int32),
                                       jnp.float64, 94))
    np.testing.assert_array_equal(dec, g3_full[idx & 1023])
    # distribution sanity: components fill the cube roughly uniformly
    g = g3_full[:1024]
    assert np.abs(g).max() <= 1.0
    assert g.mean() == pytest.approx(0.0, abs=0.05)
    assert (np.abs(g) > 0.5).mean() == pytest.approx(0.5, abs=0.08)


def test_perlin_doubled_table_is_periodic():
    """p[i] == p[i & 1023] over the reachable range — the masked lookup the
    kernel uses is value-identical to the doubled-table indexing."""
    perm_full, g3_full = jalt._perlin_tables(94)
    idx = np.arange(perm_full.shape[0])
    np.testing.assert_array_equal(perm_full, perm_full[idx & 1023])
    np.testing.assert_array_equal(g3_full, g3_full[idx & 1023])


def test_onehot_lookup_paths_are_value_exact():
    """The TPU one-hot byte-split matmul perm lookup
    (altnoise._perm_take_1024 on the tpu backend) must be VALUE-identical
    to jnp.take: every byte piece is bf16-exact and the f32 dot
    accumulates one nonzero term. Exercised here by driving the matmul
    path directly (the dispatch picks take on this CPU backend).
    (Gradients no longer look up at all — see
    test_perlin_grad_hash_matches_table.)"""
    perm_full, _ = jalt._perlin_tables(94)
    pb = jalt._byte_split_tables(94)
    idx = np.random.default_rng(3).integers(0, 2046, size=257).astype(np.int32)
    out = np.asarray(jalt._onehot_dot(jnp.asarray(idx),
                                      jnp.asarray(pb, jnp.bfloat16)))
    vals = (out[..., 0] + 256.0 * out[..., 1]).astype(np.int64)
    np.testing.assert_array_equal(vals, perm_full[idx])


def test_perlin_2d_matches_fixed_table_oracle_f64():
    """The 2-D half of the Noise interface (noise.h:41, perlin.h:26-30):
    same fixed-table discipline as the 3-D gate — the seeded tables feed
    both the f64 oracle twin (perlin.cpp:56-97 transcription) and the jnp
    path."""
    perm, g2 = jalt._perlin_tables2(94)
    pts = _points(seed=23)
    want = oracle_alt.perlin_raw_2d(perm, g2, pts[:, 0], pts[:, 1])
    with jax.enable_x64(True):
        got = np.asarray(jalt.perlin_raw_2d(
            jnp.asarray(pts[:, 0], jnp.float64),
            jnp.asarray(pts[:, 1], jnp.float64)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
    assert np.abs(want).max() <= 2.0


def test_iq_2d_matches_oracle_f64():
    """IQnoise::raw_2d == noise(x, y, 0) (iqnoise.h:22-24)."""
    pts = _points(seed=29)
    want = oracle_alt.iq_raw_2d(pts[:, 0], pts[:, 1])
    with jax.enable_x64(True):
        got = np.asarray(jalt.iq_value_noise_2d(
            jnp.asarray(pts[:, 0], jnp.float64),
            jnp.asarray(pts[:, 1], jnp.float64)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)
    # z = 0 must reproduce the 3-D noise exactly
    want3 = oracle_alt.iq_noise(pts[:, 0], pts[:, 1], np.zeros(len(pts)))
    np.testing.assert_array_equal(want, want3)


def test_perlin_2d_table_is_unit_and_periodic():
    perm, g2 = jalt._perlin_tables2(94)
    idx = np.arange(perm.shape[0])
    np.testing.assert_array_equal(g2, g2[idx & 1023])
    norms = np.linalg.norm(g2[:1024], axis=1)
    assert norms.min() > 0.99 and norms.max() < 1.01
