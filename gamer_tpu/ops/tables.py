"""Constant tables for simplex noise.

These are the standard public-domain tables from Gustavson/Eshelman's
reference simplex-noise implementation, identical to the ones the reference
engine hardcodes (source/noise/simplexnoise.h:138-185). ``PERM`` is a fixed
permutation of 0..255 repeated twice (512 entries) so ``perm[i + perm[j]]``
never needs a wrap; ``GRAD3`` are the 12 edge-midpoint gradients of a cube.
"""

from __future__ import annotations

import numpy as np

PERM_HALF = (
    151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7, 225, 140,
    36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6, 148, 247, 120, 234,
    75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32, 57, 177, 33, 88, 237,
    149, 56, 87, 174, 20, 125, 136, 171, 168, 68, 175, 74, 165, 71, 134, 139, 48,
    27, 166, 77, 146, 158, 231, 83, 111, 229, 122, 60, 211, 133, 230, 220, 105,
    92, 41, 55, 46, 245, 40, 244, 102, 143, 54, 65, 25, 63, 161, 1, 216, 80, 73,
    209, 76, 132, 187, 208, 89, 18, 169, 200, 196, 135, 130, 116, 188, 159, 86,
    164, 100, 109, 198, 173, 186, 3, 64, 52, 217, 226, 250, 124, 123, 5, 202, 38,
    147, 118, 126, 255, 82, 85, 212, 207, 206, 59, 227, 47, 16, 58, 17, 182, 189,
    28, 42, 223, 183, 170, 213, 119, 248, 152, 2, 44, 154, 163, 70, 221, 153, 101,
    155, 167, 43, 172, 9, 129, 22, 39, 253, 19, 98, 108, 110, 79, 113, 224, 232,
    178, 185, 112, 104, 218, 246, 97, 228, 251, 34, 242, 193, 238, 210, 144, 12,
    191, 179, 162, 241, 81, 51, 145, 235, 249, 14, 239, 107, 49, 192, 214, 31,
    181, 199, 106, 157, 184, 84, 204, 176, 115, 121, 50, 45, 127, 4, 150, 254,
    138, 236, 205, 93, 222, 114, 67, 29, 24, 72, 243, 141, 128, 195, 78, 66, 215,
    61, 156, 180,
)

PERM = np.array(PERM_HALF * 2, dtype=np.int32)

GRAD3 = np.array(
    [
        (1, 1, 0), (-1, 1, 0), (1, -1, 0), (-1, -1, 0),
        (1, 0, 1), (-1, 0, 1), (1, 0, -1), (-1, 0, -1),
        (0, 1, 1), (0, -1, 1), (0, 1, -1), (0, -1, -1),
    ],
    dtype=np.int32,
)

# perm[i] % 12 precomputed: the only use of perm values at the final lookup
# level; keeping the raw table too because inner levels add indices first.
PERM_MOD12 = (PERM % 12).astype(np.int32)

# Packed layout for the Pallas kernel: Mosaic's native lane gather covers
# 128 lanes, and table entries are 8-bit, so ALL four values a lookup can
# need — perm[lane], perm[lane+128], perm%12[lane], perm%12[lane+128] — fit
# in one int32 word per lane. One gather + byte extraction replaces two
# gathers + select per table lookup (ops/pallas_noise.perm_lookup /
# mod12_lookup), and the gradient index skips the vector integer mod.
PERM_PACKED32 = (
    PERM[:128]
    | (PERM[128:256] << 8)
    | (PERM_MOD12[:128] << 16)
    | (PERM_MOD12[128:256] << 24)
).astype(np.int32)
