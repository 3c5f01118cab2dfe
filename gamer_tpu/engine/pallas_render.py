"""Pallas TPU render kernel — the production hot path.

One pallas_call renders the whole frame: the grid tiles the image into
(TILE_R, 128)-pixel blocks (VPU-register multiples); each program generates its
tile's rays from the inverse view-projection, intersects the scene's
ellipsoids, and runs the emission-absorption march with a TILE-LOCAL
while loop. Spatially coherent rays share trip counts, so each tile stops
as soon as ITS rays are done — the early-out structure the reference gets
from per-pixel loop exits (rasterizer.cpp:447-475) and that a lockstep
whole-image march (engine/render.py) cannot express.

Mosaic-specific shapes of the design (see ops/pallas_noise.py for why):
  - march state lives in VMEM scratch refs; the while loop carries only
    (iteration, active-count) scalars (vector carries hit layout bugs)
  - scene scalars are packed into one SMEM row with trace-time offsets
  - the permutation table sits row-broadcast in VMEM as one byte-packed
    int32 word per lane (tables.PERM_PACKED32): one 128-lane gather + byte
    extraction per table lookup
  - winding is computed where used — it is provably write-before-read per
    component in the reference (galaxycomponent.cpp:45-88), so no state ref

Semantics mirror engine/render.py (same reference citations), with two
knowing deviations, both inside fp32 tolerance: atan/atan2 are minimax
polynomials, and the march-exit test uses the accumulated path length
instead of re-projecting p onto the ray.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import pallas_noise as pn
from ..ops import camera as cam_ops
from ..scene.schema import (
    CID_BULGE,
    CID_DISK,
    CID_DUST,
    CID_DUST2,
    CID_DUST_POSITIVE,
    CID_STARS,
    CID_STARS_SMALL,
    Scene,
)
from ..ops.tables import PERM_PACKED32
from .scene_prep import COMP_FIELDS, SceneStatic, flatten_scene

PI = 3.141592653589793
# Tile height by frame size (interleaved A/B on v5e, scripts/perf_ab.py):
# at 512px 32 rows win (0.175s vs 0.24s for 64); from 1024px up 64 rows win
# (1024: 0.40 vs 0.45, 2048: 1.43 vs 1.65, 4096: 5.49 vs 6.37; 128 loses
# again at 4096) — higher resolution makes a tile's rays angularly tighter,
# so divergence stops punishing tall tiles and fewer grid programs win
TILE_R, TILE_C = 32, 128
TILE_R_LARGE = 64


def _tile_rows(size: int) -> int:
    return TILE_R_LARGE if size >= 1024 else TILE_R


# Hard safety cap on march substeps — guards against a non-terminating
# while loop if the exit test goes NaN (stop compares false forever), NOT a
# tuning knob. Worst legitimate trips = chord/min_step; 2^17 covers chords
# up to 131 units at the 0.001 min step (the unit-ellipsoid scenes need
# ~2500). The XLA/oracle paths have no cap; a scene that truly exceeds this
# would truncate its camera-near segment.
MAX_ITERS = 131072
# march substeps per while-loop iteration: amortizes the per-iteration
# overhead (loop condition's cross-lane reduction, scalar carries, Mosaic
# loop scheduling) over UNROLL straight-line steps. Finished tiles run at
# most UNROLL-1 masked extra substeps — negligible vs the ~100-250 real
# ones. Measured at TILE_R=32: 1 and 2 tie, 4 is slower — with the cheap
# triggers in place there is no per-iteration overhead left to amortize, so
# default 1 (3x faster kernel compiles); the knob stays for perf_ab tuning
UNROLL = 1
RIDGED_OCTAVES = 9
# Three-phase march: per-ray CONSERVATIVE entry/exit of the union of the
# non-bulge components' support (the |dott| <= 2*z0 sech slab is affine in
# path length, the radius < 2.2552*r0 cutoff is quadratic —
# galaxycomponent.h:61-81), computed once at march start. Steps strictly
# before entry / after exit can trigger NO non-bulge component, so they run
# a CHEAP body (exit test + bulge + advance — bulge has no gating in the
# reference, galaxycomponents.cpp:5-39, and must be sampled at every
# schedule point). Sample positions ride the IDENTICAL f32 recurrence in
# all three phases, so the image is bit-exact vs the single-loop march
# (checksum-gated in perf_ab and tests/test_pallas.py).
# MEASURED NEUTRAL on v5e (interleaved A/B, min of 6): canonical Spiral
# 4096² 5.485 -> 5.470 s (-0.3%), 1024² 0.399 -> 0.398 s; bulge-disabled
# Spiral 1024² 0.394 -> 0.393 s. Root cause: the frame is bound by
# EXECUTED noise inside the support window; out-of-window steps were
# already trigger-gated (pl.when), so the walk they pay is ~1% of frame.
# Default OFF; the knob stays for scripts/perf_ab.py (MARCH_WINDOW:0/1) —
# see docs/PERF.md "do not revisit".
MARCH_WINDOW = 0
# Threshold slack (absolute, in dott / projected-radius units) + window
# margin (in path-length units): covers f32 evaluation noise of the
# analytic bounds AND the ulp drift of the incrementally-updated position
# vs the affine closed form (~1e-4 over a 2000-substep chord). Costs a few
# extra full-body steps per ray; correctness needs only "conservative".
WINDOW_SLACK = 0.01
WINDOW_MARGIN = 0.02
# Load every SMEM scene scalar ONCE at kernel start instead of re-issuing
# the scalar load at each use site inside the march while-loop (the loads
# are loop-invariant; hoisting is bit-exactness-preserving by construction).
# Perf knob for scripts/perf_ab.py (HOIST_SMEM:0/1).
HOIST_SMEM = 1


class _Layout:
    """Trace-time scalar packing: names -> offsets into one SMEM row."""

    def __init__(self):
        self.names = []
        self.sizes = {}
        self.offsets = {}
        self.n = 0
        # number of (tr, 128) constant-table blocks riding the tables input:
        # block 0 is the byte-packed simplex perm; blocks 1-4 / 5-12 the
        # packed Perlin perm / gradient chunks when the scene uses
        # noise_kind='perlin' (see _NoiseEnv / _tables_const)
        self.table_blocks = 1

    def add(self, name: str, k: int) -> int:
        self.offsets[name] = self.n
        self.sizes[name] = k
        self.names.append(name)
        self.n += k
        return self.offsets[name]

    @property
    def smem_rows(self) -> int:
        """Scalar page height: the row is stored as an (smem_rows, 128)
        page per batch element (Mosaic blocked-SMEM tiles must be (8k, 128)
        aligned)."""
        return max(8, ((-(-self.n // 128) + 7) // 8) * 8)

    @property
    def padded_n(self) -> int:
        return self.smem_rows * 128


def _build_layout(static: SceneStatic) -> _Layout:
    # All three reference noise backends are first-class here (the
    # reference hardcodes Simplex in every rasterizer ctor,
    # rasterizer.h:57,62,67, shipping Perlin/IQ as selectable-in-principle
    # alternatives; RenderConfig.noise_kind makes them actually selectable
    # on the production kernel). Perlin needs its packed tables on the
    # tables input; IQ is closed-form.
    kinds = {cs.noise_kind for inst in static.instances for cs in inst.comps}
    bad = kinds - {"simplex", "perlin", "iq"}
    if bad:
        raise ValueError(f"unknown noise_kind(s) {sorted(bad)!r}")
    lay = _Layout()
    if "perlin" in kinds:
        # simplex block + 4 packed-perm chunks (gradients are hash-
        # regenerated in-register, no blocks — ops/altnoise GRAD_HASH note)
        lay.table_blocks = 5
    lay.add("inv_vp", 16)
    lay.add("camera", 3)
    lay.add("ray_step", 1)
    lay.add("min_step", 1)
    # global row offset of this program's slab (0 for whole-frame renders).
    # The row-sharded path (shard_map over a 'rows' mesh axis) and the
    # progressive band path both reuse ONE compiled kernel by overriding
    # this slot per device / per dispatch — the analog of the reference's
    # contiguous pixel-chunk decomposition (rasterthread.cpp:6-25), with
    # exact tiling instead of the dropped remainder.
    lay.add("row0", 1)
    for gi, inst in enumerate(static.instances):
        p = f"i{gi}."
        lay.add(p + "pos", 3)
        lay.add(p + "axis_inv", 3)   # 1/axis^2
        lay.add(p + "axis_x", 1)
        lay.add(p + "winding_b", 1)
        lay.add(p + "winding_n", 1)
        lay.add(p + "arms", 4)
        lay.add(p + "rotmat", 4)
        lay.add(p + "twirl_axis", 3)
        lay.add(p + "orientation", 3)
        lay.add(p + "iscale", 1)
        for ci, cs in enumerate(inst.comps):
            cp = f"{p}c{ci}."
            for f in COMP_FIELDS:
                lay.add(cp + f, 1)
            lay.add(cp + "spec", 3)
            if cs.cid in (CID_DUST2, CID_DUST_POSITIVE):
                lay.add(cp + "ridged_w", cs.oct(RIDGED_OCTAVES))
    return lay


def _pack_scalars(static: SceneStatic, lay: _Layout, params, camera, inv_vp,
                  ray_step, min_step):
    """Pack the scene scalars into one (1, smem_rows, 128) float32 page.

    Pure NUMPY on the host — one device transfer happens when the row enters
    the jitted kernel call. Building it from eager jnp ops instead costs
    ~100 device dispatches per scene (~0.3 s), which dominated small frames
    and multiplied across batch elements. Only the ridged spectral weights
    run on device (eager jnp.power) so they stay bit-identical to the XLA
    conformance path's in-graph pow.
    """
    row = np.zeros(lay.padded_n, np.float32)

    def put(name, v):
        off = lay.offsets[name]
        flat = np.asarray(v, np.float32).reshape(-1)
        row[off:off + flat.shape[0]] = flat

    put("inv_vp", inv_vp)
    put("camera", camera)
    put("ray_step", ray_step)
    put("min_step", min_step)
    put("row0", 0.0)  # overridden on device by the sharded/band wrappers
    for gi, (inst, pr) in enumerate(zip(static.instances, params)):
        p = f"i{gi}."
        axis = np.asarray(pr["axis"], np.float32)
        put(p + "pos", pr["position"])
        put(p + "axis_inv", np.float32(1.0) / (axis * axis))
        put(p + "axis_x", axis[0])
        put(p + "winding_b", pr["winding_b"])
        put(p + "winding_n", pr["winding_n"])
        put(p + "arms", pr["arms"])
        put(p + "rotmat", pr["rotmat"])
        put(p + "twirl_axis", pr["twirl_axis"])
        put(p + "orientation", pr["orientation"])
        put(p + "iscale", pr["intensity_scale"])
        for ci, (cs, cp) in enumerate(zip(inst.comps, pr["comps"])):
            cpre = f"{p}c{ci}."
            for f in COMP_FIELDS:
                put(cpre + f, cp[f])
            put(cpre + "spec", cp["spec"])
            if cs.cid in (CID_DUST2, CID_DUST_POSITIVE):
                put(cpre + "ridged_w",
                    _ridged_weights(float(cp["ks"]), cs.oct(RIDGED_OCTAVES)))
    return row.reshape(1, lay.smem_rows, 128)


@functools.lru_cache(maxsize=256)
def _ridged_weights(ks: float, octaves: int = RIDGED_OCTAVES) -> "np.ndarray":
    """Per-octave pow(freq, -0.05) for the ridged MF — scalar pow cannot run
    inside the kernel (noise.cpp:122). Computed ON DEVICE to match the XLA
    path's pow bit-for-bit, memoized per ks so batches/fly-throughs sharing
    a galaxy pay the device round trip once, not per frame."""
    lac = jnp.float32(2.5)
    freqs = jnp.float32(ks) * lac ** jnp.arange(octaves, dtype=jnp.float32)
    return np.asarray(jnp.power(freqs, jnp.float32(-0.05)))


def _qt_clamp(v, lo, hi):
    r = jnp.where(v < hi, v, jnp.full_like(v, hi) if not hasattr(hi, "shape") else hi)
    return jnp.where(r > lo, r, jnp.full_like(r, lo) if not hasattr(lo, "shape") else lo)


class _NoiseEnv:
    """In-kernel noise tables, threaded through the component kernels:
    ``perm`` is the (tr, 128) byte-packed simplex table (always present —
    block 0 of the tables input); ``pperm`` is the packed Perlin
    permutation chunks when the scene uses noise_kind='perlin' (perlin
    gradients are hash-regenerated in-register, no table). ``raw_fn(kind)``
    returns the per-component raw-noise override for the pn combinators
    (None for simplex, keeping the default scene's trace unchanged)."""

    __slots__ = ("perm", "pperm")

    def __init__(self, perm, pperm=None):
        self.perm = perm
        self.pperm = pperm

    def raw_fn(self, kind: str):
        if kind == "simplex":
            return None
        if kind == "perlin":
            pperm = self.pperm
            return lambda x, y, z: pn.perlin_raw_3d(pperm, x, y, z)
        return pn.iq_raw_3d


def _make_kernel(static: SceneStatic, lay: _Layout, size: int,
                 rows: int, cols: int, tr: int = TILE_R,
                 batched: bool = False, rays_input: bool = False):
    """Build the kernel function for one scene structure.

    With `batched`, grid axis 0 indexes the batch element (frame of a
    fly-through, or seed of a dataset batch); the SMEM scalar row and the
    output block are selected per batch element by the BlockSpecs, so the
    kernel body only shifts its tile program ids.
    """

    def kernel(sp_ref, perm_ref, *rest):
        if rays_input:
            dx_ref, dy_ref, dz_ref = rest[:3]
            rest = rest[3:]
        (outr_ref, outg_ref, outb_ref,
         rd0, rd1, rd2, I0, I1, I2, p0, p1, p2, tacc, steppr, done) = rest

        def S(name, k=0):
            off = lay.offsets[name] + k
            return sp_ref[0, off // 128, off % 128]

        if HOIST_SMEM:
            # one load per scalar, issued HERE (outside the march loop and
            # every pl.when region); all later S() calls return the cached
            # value, so the while-loop body carries them as invariants
            # instead of re-loading from SMEM each substep.
            cache = {
                (name, k): S(name, k)
                for name in lay.names
                for k in range(lay.sizes[name])
            }
            S = lambda name, k=0: cache[(name, k)]  # noqa: E731

        if lay.table_blocks == 1:
            nz = _NoiseEnv(perm_ref[:])
        else:
            tabs = perm_ref[:]
            nz = _NoiseEnv(
                tabs[:tr],
                pperm=tuple(tabs[(1 + c) * tr:(2 + c) * tr] for c in range(4)),
            )

        if rays_input:
            # arbitrary ray directions (HEALPix all-sky mode); padding rays
            # are zero vectors, which never intersect (Sdisc NaN -> not hit)
            rd0[:] = dx_ref[...].reshape(tr, TILE_C)
            rd1[:] = dy_ref[...].reshape(tr, TILE_C)
            rd2[:] = dz_ref[...].reshape(tr, TILE_C)
            valid = None
        else:
            # --- rays from the inverse view-projection (gamercamera.cpp:210-217)
            pid_r = pl.program_id(1 if batched else 0)
            pid_c = pl.program_id(2 if batched else 1)
            # row0 is an exact small integer in f32, so row0 + local-row
            # is bit-identical to the global row index an unsharded render
            # computes (both exact ints < 2^24) — sharded rays match
            # whole-frame rays bit-for-bit.
            jrow = S("row0") + (pid_r * tr + jax.lax.broadcasted_iota(
                jnp.int32, (tr, TILE_C), 0)).astype(jnp.float32)
            icol = (pid_c * TILE_C + jax.lax.broadcasted_iota(
                jnp.int32, (tr, TILE_C), 1)).astype(jnp.float32)
            # frame mask: tile rows/cols pad to (tr, 128) multiples, and a
            # sharded slab may lie entirely past the last frame row — padded
            # lanes are born done, so fully-padded tiles skip the march
            fsize = jnp.float32(float(size))
            valid = (jrow < fsize) & (icol < fsize)
            half = float(size) * 0.5
            xx = icol / half - 1.0
            yy = jrow / half - 1.0
            wx = S("inv_vp", 0) * xx - S("inv_vp", 1) * yy + S("inv_vp", 2) + S("inv_vp", 3)
            wy = S("inv_vp", 4) * xx - S("inv_vp", 5) * yy + S("inv_vp", 6) + S("inv_vp", 7)
            wz = S("inv_vp", 8) * xx - S("inv_vp", 9) * yy + S("inv_vp", 10) + S("inv_vp", 11)
            inv_n = jax.lax.rsqrt(wx * wx + wy * wy + wz * wz)
            rd0[:] = wx * inv_n
            rd1[:] = wy * inv_n
            rd2[:] = wz * inv_n

        I0[:] = jnp.zeros_like(I0)
        I1[:] = jnp.zeros_like(I1)
        I2[:] = jnp.zeros_like(I2)

        ray_step = S("ray_step")
        min_step = S("min_step")

        for gi, inst in enumerate(static.instances):
            pfx = f"i{gi}."
            _march_instance(
                static, inst, lay, S, pfx, nz, ray_step, min_step,
                rd0, rd1, rd2, I0, I1, I2, p0, p1, p2, tacc, steppr, done,
                valid=valid,
            )

        # final scale (rasterizer.cpp:409); batched blocks are (1, 8, 128)
        fs = 0.01 / ray_step
        outr_ref[...] = (I0[:] * fs).reshape(outr_ref.shape)
        outg_ref[...] = (I1[:] * fs).reshape(outg_ref.shape)
        outb_ref[...] = (I2[:] * fs).reshape(outb_ref.shape)

    return kernel


def _march_instance(static, inst, lay, S, pfx, nz, ray_step, min_step,
                    rd0, rd1, rd2, I0, I1, I2, p0, p1, p2, tacc, steppr, done,
                    valid=None):
    """Intersect + march one galaxy instance (rasterizer.cpp:379-483)."""
    cx = S("camera", 0) - S(pfx + "pos", 0)
    cy = S("camera", 1) - S(pfx + "pos", 1)
    cz = S("camera", 2) - S(pfx + "pos", 2)
    ivx = S(pfx + "axis_inv", 0)
    ivy = S(pfx + "axis_inv", 1)
    ivz = S(pfx + "axis_inv", 2)

    dx, dy, dz = rd0[:], rd1[:], rd2[:]
    A = dx * dx * ivx + dy * dy * ivy + dz * dz * ivz
    B = 2.0 * (dx * cx * ivx + dy * cy * ivy + dz * cz * ivz)
    C = (cx * cx * ivx + cy * cy * ivy + cz * cz * ivz) - 1.0
    Sdisc = B * B - 4.0 * A * C
    hit = Sdisc > 0.0
    sq = jnp.sqrt(jnp.where(hit, Sdisc, jnp.zeros_like(Sdisc)))
    t0 = (-B - sq) / (2.0 * A)
    t1 = (-B + sq) / (2.0 * A)
    # behind-camera rules (rasterizer.cpp:396-403)
    near_t = jnp.where(t1 > 0, jnp.zeros_like(t1), t1)
    alive = hit & ~((t0 > 0) & (t1 > 0))
    if valid is not None:
        alive = alive & valid

    o1x = cx + dx * t0
    o1y = cy + dy * t0
    o1z = cz + dz * t0
    o2x = cx + dx * near_t
    o2y = cy + dy * near_t
    o2z = cz + dz * near_t
    fx = o1x - o2x
    fy = o1y - o2y
    fz = o1z - o2z
    length = jnp.sqrt(fx * fx + fy * fy + fz * fz)
    safe = jnp.where(length == 0, jnp.ones_like(length), length)
    # march direction (unit, from far point toward the camera-side point)
    mdx = fx / safe
    mdy = fy / safe
    mdz = fz / safe

    # camera distance is affine along the march: every sample sits on the
    # ray THROUGH the camera (rays originate there; the behind-camera rule
    # only ever truncates the segment at t=0), and on alive lanes t0 <= 0
    # with t increasing toward the near point — so |p - cam| = -t0 - tacc.
    # Saves a sqrt + 6 ops per substep; differs from the per-step sqrt only
    # in f32 rounding (conformance-gated like the other knowing deviations)
    dist0 = -t0

    if static.dither:
        # Per-ray march-start jitter (RenderConfig.dither): offset the far
        # start point toward the camera by h01 in [0,1) of the first step,
        # decorrelating coarse-rayStep banding (the shadertoy fork's
        # treatment, galaxy_shadertoy.glsl:564-589). tacc starts at the
        # offset so the incremental camera distance and the chord-length
        # exit test stay exact. Same hash as engine.render._dither01.
        from .render import hash3_i32

        hsh = hash3_i32(jax.lax.bitcast_convert_type(dx, jnp.int32),
                        jax.lax.bitcast_convert_type(dy, jnp.int32),
                        jax.lax.bitcast_convert_type(dz, jnp.int32))
        h01 = (jnp.abs(hsh) % 8192).astype(jnp.float32) * (1.0 / 8192.0)
        # clamp to the chord: grazing rays must not overshoot the near point
        delta = jnp.minimum(
            _qt_clamp(dist0 * ray_step, min_step, 0.01) * h01, length)
        p0[:] = o1x - mdx * delta
        p1[:] = o1y - mdy * delta
        p2[:] = o1z - mdz * delta
        tacc[:] = delta
    else:
        p0[:] = o1x
        p1[:] = o1y
        p2[:] = o1z
        tacc[:] = jnp.zeros_like(o1x)
    steppr[:] = jnp.zeros_like(o1x) + ray_step
    done[:] = jnp.where(alive, jnp.zeros_like(length, jnp.int32),
                        jnp.ones_like(length, jnp.int32))

    nb_comps = [(ci, cs) for ci, cs in enumerate(inst.comps)
                if cs.cid != CID_BULGE]
    bulge_comps = [(ci, cs) for ci, cs in enumerate(inst.comps)
                   if cs.cid == CID_BULGE]
    use_window = bool(MARCH_WINDOW) and bool(nb_comps)

    if use_window:
        # Per-ray support window [w0, w1] in tacc (path length from the far
        # point; p(tacc) = o1 - md*tacc): union hull over non-bulge comps of
        # slab ∩ radial-cutoff, each widened by WINDOW_SLACK so it strictly
        # contains every sample whose _component_trigger could fire.
        INF = jnp.float32(3.0e38)
        ox = S(pfx + "orientation", 0)
        oy = S(pfx + "orientation", 1)
        oz = S(pfx + "orientation", 2)
        axx = S(pfx + "axis_x")
        d0w = o1x * ox + o1y * oy + o1z * oz      # dott at tacc = 0
        dmw = mdx * ox + mdy * oy + mdz * oz      # -d(dott)/dtacc
        q0x = o1x - ox * d0w
        q0y = o1y - oy * d0w
        q0z = o1z - oz * d0w
        qdx = mdx - ox * dmw
        qdy = mdy - oy * dmw
        qdz = mdz - oz * dmw
        qa = qdx * qdx + qdy * qdy + qdz * qdz    # |P(t)|^2 = qa t^2+qb t+qc
        qb = -2.0 * (q0x * qdx + q0y * qdy + q0z * qdz)
        qc = q0x * q0x + q0y * q0y + q0z * q0z
        adm = jnp.abs(dmw)
        dm_flat = adm < 1e-8
        dm_safe = jnp.where(dm_flat, jnp.ones_like(dmw), dmw)
        qa_flat = qa < 1e-12
        qa_safe = jnp.where(qa_flat, jnp.ones_like(qa), qa)
        w0 = jnp.full_like(d0w, 3.0e38)
        w1 = jnp.full_like(d0w, -3.0e38)
        slack = jnp.float32(WINDOW_SLACK)
        for ci, cs in nb_comps:
            cpre = f"{pfx}c{ci}."
            Z = 2.0 * jnp.abs(S(cpre + "z0")) + slack
            sa = (d0w - Z) / dm_safe
            sb = (d0w + Z) / dm_safe
            in_slab0 = jnp.abs(d0w) <= Z
            s_lo = jnp.where(dm_flat, jnp.where(in_slab0, -INF, INF),
                             jnp.minimum(sa, sb))
            s_hi = jnp.where(dm_flat, jnp.where(in_slab0, INF, -INF),
                             jnp.maximum(sa, sb))
            r0c = S(cpre + "r0")
            # trigger: radius = |P|/axx < r0*2.2552 (inf for r0 <= 0); in
            # |P| units R = r_thr*axx, quadratic roots bound the interval
            R = (r0c * jnp.float32(2.2552) + slack) * axx
            unlimited = (r0c <= 0.0) | (axx <= 0.0)
            disc = qb * qb - 4.0 * qa * (qc - R * R)
            sqd = jnp.sqrt(jnp.maximum(disc, jnp.zeros_like(disc)))
            r_lo = (-qb - sqd) / (2.0 * qa_safe)
            r_hi = (-qb + sqd) / (2.0 * qa_safe)
            empty_r = disc <= 0.0   # upward parabola never below R^2
            const_in = qc <= R * R  # qa ~ 0: |P| constant along the ray
            r_lo = jnp.where(qa_flat, jnp.where(const_in, -INF, INF),
                             jnp.where(empty_r, INF, r_lo))
            r_hi = jnp.where(qa_flat, jnp.where(const_in, INF, -INF),
                             jnp.where(empty_r, -INF, r_hi))
            r_lo = jnp.where(unlimited, -INF, r_lo)
            r_hi = jnp.where(unlimited, INF, r_hi)
            lo = jnp.maximum(s_lo, r_lo)
            hi = jnp.minimum(s_hi, r_hi)
            empty = lo > hi
            w0 = jnp.minimum(w0, jnp.where(empty, INF, lo))
            w1 = jnp.maximum(w1, jnp.where(empty, -INF, hi))
        margin = jnp.float32(WINDOW_MARGIN)
        w0m = jnp.maximum(w0 - margin, jnp.zeros_like(w0))
        w1m = w1 + margin

    def cond(c):
        it, n_active = c
        return (n_active > 0) & (it < MAX_ITERS)

    def advance(px, py, pz, step, active):
        # advance (rasterizer.cpp:467-470) — shared verbatim by all three
        # phases so every lane's (p, tacc, steppr) sequence is the one f32
        # recurrence regardless of which phase executes a given step
        af = active.astype(jnp.float32)
        p0[:] = px - mdx * step * af
        p1[:] = py - mdy * step * af
        p2[:] = pz - mdz * step * af
        tacc[:] = tacc[:] + step * af
        steppr[:] = jnp.where(active, step, steppr[:])

    def cheap_substep(count_active: bool, upper):
        """One schedule step where no non-bulge trigger can fire: exit test
        + bulge (ungated in the reference) + advance + floor. Identical
        arithmetic to the full body with all non-bulge triggers false."""
        stop = tacc[:] >= length + steppr[:]
        d = jnp.where(stop, jnp.ones_like(done[:]), done[:])
        done[:] = d
        active = d == 0
        if upper is not None:
            active = active & (tacc[:] < upper)
        px, py, pz = p0[:], p1[:], p2[:]
        dist = dist0 - tacc[:]
        step = _qt_clamp(dist * ray_step, min_step, 0.01)
        weight = step * 200.0
        for ci, _cs in bulge_comps:
            _apply_bulge(S, pfx, f"{pfx}c{ci}.", px, py, pz,
                         active, weight, ray_step, I0, I1, I2)
        advance(px, py, pz, step, active)
        if bulge_comps:
            for ref in (I0, I1, I2):
                v = ref[:]
                ref[:] = jnp.where(
                    active, jnp.where(v >= 0, v, jnp.zeros_like(v)), v)
        return jnp.sum(active.astype(jnp.int32)) if count_active else None

    def substep(count_active: bool, upper=None):
        # loop exit check (rasterizer.cpp:447): path length vs chord
        stop = tacc[:] >= length + steppr[:]
        d = jnp.where(stop, jnp.ones_like(done[:]), done[:])
        done[:] = d
        active = d == 0
        if upper is not None:
            # lanes past the support window idle here; the cheap tail loop
            # finishes their chord (their state is untouched meanwhile)
            active = active & (tacc[:] <= upper)

        px, py, pz = p0[:], p1[:], p2[:]
        dist = dist0 - tacc[:]
        step = _qt_clamp(dist * ray_step, min_step, 0.01)
        weight = step * 200.0

        # shared per-sample geometry, hoisted: identical for every
        # non-bulge component (rasterizer.cpp:460-462 recomputes it per
        # component, but only h = |dott/z0| actually varies)
        ox = S(pfx + "orientation", 0)
        oy = S(pfx + "orientation", 1)
        oz = S(pfx + "orientation", 2)
        dott = px * ox + py * oy + pz * oz
        Px = px - ox * dott
        Py = py - oy * dott
        Pz = pz - oz * dott
        radius = jnp.sqrt(Px * Px + Py * Py + Pz * Pz) / S(pfx + "axis_x")

        # components apply strictly in list order (emission adds, absorption
        # multiplies — they do not commute, rasterizer.cpp:460-466), so only
        # CONSECUTIVE non-bulge components may share one tile-level slab
        # trigger (one cross-lane any on the OR of their triggers in the
        # common everyone-outside case). Bulge bypasses all gating in the
        # reference (galaxycomponents.cpp:5-39) and applies unconditionally.
        runs = []
        for ci, cs in enumerate(inst.comps):
            if cs.cid == CID_BULGE:
                runs.append((True, [(ci, cs)]))
            elif runs and not runs[-1][0]:
                runs[-1][1].append((ci, cs))
            else:
                runs.append((False, [(ci, cs)]))
        for is_bulge, comps in runs:
            if is_bulge:
                _apply_bulge(S, pfx, f"{pfx}c{comps[0][0]}.", px, py, pz,
                             active, weight, ray_step, I0, I1, I2)
            else:
                _apply_component_run(
                    static, inst, comps, lay, S, pfx, nz,
                    px, py, pz, active, weight, ray_step,
                    dott, Px, Py, Pz, radius, I0, I1, I2)

        advance(px, py, pz, step, active)
        # RasterPixel::Floor semantics via math3d.floor0: negatives AND NaN
        # go to 0 (v >= 0 keeps, everything else zeroes) — `v < 0` would
        # keep a NaN emission and poison the rest of the march
        for ref in (I0, I1, I2):
            v = ref[:]
            ref[:] = jnp.where(
                active, jnp.where(v >= 0, v, jnp.zeros_like(v)), v)
        # the cross-lane reduction is only needed once per while iteration
        return jnp.sum(active.astype(jnp.int32)) if count_active else None

    if use_window:
        # Phase 1 — fast-forward: advance every lane to its support entry
        # with the cheap body (also ALIGNS the lanes' hot windows, so the
        # tile-level `any` triggers in phase 2 fire when lanes genuinely
        # need the work, not because one straggler is mid-slab).
        def ff_body(c):
            it, _ = c
            return it + 1, cheap_substep(True, w0m)

        n_ff = jnp.sum(((done[:] == 0) & (tacc[:] < w0m)).astype(jnp.int32))
        it_ff, _ = jax.lax.while_loop(cond, ff_body, (jnp.int32(0), n_ff))

        # Phase 2 — full body across [w0m, w1m] (the MAX_ITERS budget is
        # shared across phases, preserving the single-loop cap semantics)
        def main_body(c):
            it, _ = c
            n_active = None
            for k in range(UNROLL):
                n_active = substep(count_active=(k == UNROLL - 1), upper=w1m)
            return it + UNROLL, n_active

        n_main = jnp.sum(((done[:] == 0) & (tacc[:] <= w1m)).astype(jnp.int32))
        it_main, _ = jax.lax.while_loop(cond, main_body, (it_ff, n_main))

        # Phase 3 — cheap tail: past every support exit, only bulges (and
        # the exit test) remain until the chord is spent
        def tail_body(c):
            it, _ = c
            return it + 1, cheap_substep(True, None)

        n_tail = jnp.sum((done[:] == 0).astype(jnp.int32))
        jax.lax.while_loop(cond, tail_body, (it_main, n_tail))
    else:
        def body(c):
            it, _ = c
            n_active = None
            for k in range(UNROLL):
                n_active = substep(count_active=(k == UNROLL - 1))
            return it + UNROLL, n_active

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.sum(1 - done[:])))


def _apply_bulge(S, pfx, cpre, px, py, pz, active, weight, ray_step,
                 I0, I1, I2):
    """Bulge kernel (galaxycomponents.cpp:5-39): no gating in the reference,
    applied to every active sample."""
    qw = S(pfx + "rotmat", 0)
    qx = S(pfx + "rotmat", 1)
    qy = S(pfx + "rotmat", 2)
    qz = S(pfx + "rotmat", 3)
    bx, by, bz = _quat_rotate_scalar(qw, qx, qy, qz, px, py, pz)
    rad = (jnp.sqrt(bx * bx + by * by + bz * bz) + 0.01) * S(cpre + "r0") + 0.01
    # rad^0.25 == sqrt(sqrt(rad)) — two cheap VPU sqrts instead of exp/log
    ival = (S(cpre + "strength") * weight) * (
        jnp.power(rad, -0.855) * jnp.exp(-jnp.sqrt(jnp.sqrt(rad))) - 0.05
    ) * S(pfx + "iscale")
    ival = jnp.where(ival < 0, jnp.zeros_like(ival), ival)
    # where-select, not multiply-by-mask: a NaN ival (e.g. pow of a negative
    # rad under r0 < 0) on a finished lane must not poison the accumulator
    add = ival * ray_step
    I0[:] = jnp.where(active, I0[:] + S(cpre + "spec", 0) * add, I0[:])
    I1[:] = jnp.where(active, I1[:] + S(cpre + "spec", 1) * add, I1[:])
    I2[:] = jnp.where(active, I2[:] + S(cpre + "spec", 2) * add, I2[:])


def _component_trigger(S, cpre, active, dott, radius):
    """CONSERVATIVE transcendental-free tile trigger for one component —
    the only per-step unconditional cost is |dott/z0| and two compares:
      z > 0.01  <=>  h <= 2   (sech^2(2) = 0.0707 > 0.01, and the reference
                               hard-cuts z to 0 for h > 2)
      intensity > 0.001  <=>  exp(-radius/(r0/2)) > 0.011
                         <=>  radius < -ln(0.011)*r0/2 = 2.25493*r0
        (widened to 2.2552, and to +inf for r0 <= 0 where exp blows up, so
         the trigger is a strict superset of the gate)
    The EXACT exp-based gates (galaxycomponent.cpp:50-60) are re-derived
    inside the gated region, so triggering never changes a pixel value —
    it only decides whether this tile does the work this step."""
    h = jnp.abs(dott / S(cpre + "z0"))
    r0 = S(cpre + "r0")
    r_thr = jnp.where(r0 > 0, r0 * jnp.float32(2.2552), jnp.float32(3.4e38))
    return active & (h <= 2.0) & (radius < r_thr), h


def _apply_component_run(static, inst, comps, lay, S, pfx, nz,
                         px, py, pz, active, weight, ray_step,
                         dott, Px, Py, Pz, radius, I0, I1, I2):
    """A maximal run of consecutive non-bulge components under ONE tile
    trigger (the OR of the per-component triggers); per-component triggers
    re-gate inside when the run has more than one member."""
    trigs = []
    any_t = None
    for ci, cs in comps:
        cpre = f"{pfx}c{ci}."
        t, h = _component_trigger(S, cpre, active, dott, radius)
        trigs.append((cs, cpre, t, h))
        any_t = t if any_t is None else any_t | t

    @pl.when(jnp.any(any_t))
    def _slab():
        for cs, cpre, t, h in trigs:
            if len(trigs) == 1:
                _apply_component_gated(
                    static, inst, cs, lay, S, pfx, cpre, nz,
                    px, py, pz, active, weight, ray_step,
                    Px, Py, Pz, radius, t, h, I0, I1, I2)
            else:
                @pl.when(jnp.any(t))
                def _one(cs=cs, cpre=cpre, t=t, h=h):
                    _apply_component_gated(
                        static, inst, cs, lay, S, pfx, cpre, nz,
                        px, py, pz, active, weight, ray_step,
                        Px, Py, Pz, radius, t, h, I0, I1, I2)


def _apply_component_gated(static, inst, cs, lay, S, pfx, cpre, nz,
                           px, py, pz, active, weight, ray_step,
                           Px, Py, Pz, radius, trigger, h, I0, I1, I2):
    """One triggered non-bulge component (galaxycomponent.cpp:45-88 +
    galaxycomponents.cpp kernels): exact gate re-derivation + emission."""
    iscale = S(pfx + "iscale")
    qw = S(pfx + "rotmat", 0)
    qx = S(pfx + "rotmat", 1)
    qy = S(pfx + "rotmat", 2)
    qz = S(pfx + "rotmat", 3)

    def rot_by_rotmat(vx, vy, vz):
        return _quat_rotate_scalar(qw, qx, qy, qz, vx, vy, vz)

    spec_r = S(cpre + "spec", 0)
    spec_g = S(cpre + "spec", 1)
    spec_b = S(cpre + "spec", 2)
    strength = S(cpre + "strength")
    r0 = S(cpre + "r0")

    # cosh via one exp: e^-h = 1/e^h (saves an exp per component per step)
    eh = jnp.exp(h)
    sech = 2.0 / (eh + 1.0 / eh)
    z = jnp.where(h > 2.0, jnp.zeros_like(h), sech * sech)

    ri = jnp.exp(-radius / (r0 * 0.5))
    intensity = _qt_clamp(ri - 0.01, 0.0, 1.0)
    intensity = jnp.where(intensity > 0.1, jnp.full_like(intensity, 0.1),
                          intensity)
    gates = active & (z > 0.01) & (intensity > 0.001)
    _component_emit(static, inst, cs, lay, S, pfx, cpre, nz,
                    px, py, pz, gates, weight, ray_step, iscale,
                    strength, z, intensity, radius, Px, Py, Pz,
                    rot_by_rotmat, spec_r, spec_g, spec_b, I0, I1, I2)


def _component_emit(static, inst, cs, lay, S, pfx, cpre, nz,
                    px, py, pz, gates, weight, ray_step, iscale, strength,
                    z, intensity, radius, Px, Py, Pz, rot_by_rotmat,
                    spec_r, spec_g, spec_b, I0, I1, I2):
    # qt_smoothstep(0, inner, radius) with the RAW division, exactly like
    # math3d.qt_smoothstep: inner==0 -> inf (or NaN at radius==0) -> the
    # qt_clamp NaN path gives 1; inner<0 -> negative -> 0 (component cut).
    # A jnp.maximum(inner, tiny) guard would instead emit at full strength
    # for ALL inner <= 0 — wrong in both directions
    t_s = _qt_clamp(radius / S(cpre + "inner"), 0.0, 1.0)
    scale_inner_base = t_s * t_s * (3.0 - 2.0 * t_s)
    scale_inner = (scale_inner_base * scale_inner_base) * (scale_inner_base * scale_inner_base)

    twx = S(pfx + "twirl_axis", 0)
    twy = S(pfx + "twirl_axis", 1)
    twz = S(pfx + "twirl_axis", 2)

    if cs.arm_enabled:
        arm_val = _arm_value(static, inst, lay, S, pfx, cpre, radius, Px, Py, Pz,
                             rot_by_rotmat)
        if cs.winding_enabled:
            winding = _get_winding(radius, S(pfx + "winding_b"),
                                   S(pfx + "winding_n")) * S(cpre + "winding")
        else:
            winding = jnp.zeros_like(radius)
    else:
        arm_val = jnp.ones_like(radius)
        winding = jnp.zeros_like(radius)

    val = strength * scale_inner * arm_val * z * intensity * iscale
    ival = val * weight
    emit = gates & (ival > 0.0005)

    ks = S(cpre + "ks")
    cscale = S(cpre + "scale")
    noff = S(cpre + "noise_offset")
    ntilt = S(cpre + "noise_tilt")

    def twirl3(t):
        return _twirl(twx, twy, twz, t, px, py, pz)

    # raw-noise backend is per-component compile-time static; None keeps
    # the default simplex trace byte-identical to the pre-knob kernel
    raw_fn = nz.raw_fn(cs.noise_kind)

    def cloud(octaves, t, ks_, pers_):
        tx, ty, tz = twirl3(t)
        return pn.octave_noise_3d(nz.perm, octaves, pers_, ks_ * 0.1,
                                  tx, ty, tz, raw_fn=raw_fn)

    # second-level early-out: gates passed somewhere, but the intensity
    # floor (val*weight > 0.0005, galaxycomponent.cpp:75) may still kill
    # every lane in the tile — skip the noise then too
    @pl.when(jnp.any(emit))
    def _emitting():
        _component_noise(cs, S, cpre, nz, raw_fn, px, py, pz, emit, ival,
                         winding, ray_step, ks, cscale, noff, ntilt, cloud,
                         twirl3, spec_r, spec_g, spec_b, I0, I1, I2)


def _component_noise(cs, S, cpre, nz, raw_fn, px, py, pz, emit, ival,
                     winding, ray_step, ks, cscale, noff, ntilt, cloud,
                     twirl3, spec_r, spec_g, spec_b, I0, I1, I2):
    # Emission masks are where-selects, NEVER multiply-by-mask: a NaN or inf
    # contribution on a masked lane (e.g. pow of a negative arm base) must
    # vanish like the reference's per-pixel `continue`, but NaN*0 == NaN
    # would poison the accumulator. Mirrors engine/render.py:161-209.
    def accum_add(cond, contrib):
        add = ival * contrib * ray_step
        I0[:] = jnp.where(cond, I0[:] + spec_r * add, I0[:])
        I1[:] = jnp.where(cond, I1[:] + spec_g * add, I1[:])
        I2[:] = jnp.where(cond, I2[:] + spec_b * add, I2[:])

    if cs.cid == CID_DISK:
        p2v = jnp.abs(cloud(cs.oct(10), winding, cscale, ks))
        p2v = jnp.maximum(p2v, 0.01)
        p2v = jnp.power(p2v, ntilt)
        p2v = p2v + noff
        accum_add(emit & (p2v >= 0), p2v)
    elif cs.cid == CID_DUST:
        p2v = cloud(cs.oct(9), winding, cscale, ks)
        p2v = jnp.maximum(p2v - noff, 0.0)
        p2v = _qt_clamp(jnp.power(5.0 * p2v, ntilt), -10.0, 10.0)
        e = -p2v * ival * 0.01
        one = jnp.ones_like(e)
        I0[:] = I0[:] * jnp.where(emit, jnp.exp(e * spec_r), one)
        I1[:] = I1[:] * jnp.where(emit, jnp.exp(e * spec_g), one)
        I2[:] = I2[:] * jnp.where(emit, jnp.exp(e * spec_b), one)
    elif cs.cid in (CID_DUST2, CID_DUST_POSITIVE):
        tx, ty, tz = twirl3(winding)
        sw = tuple(S(cpre + "ridged_w", k) for k in range(cs.oct(RIDGED_OCTAVES)))
        p2v = pn.ridged_mf(nz.perm, tx * cscale, ty * cscale, tz * cscale,
                           sw, 2.5, noff, ntilt, raw_fn=raw_fn)
        p2v = jnp.maximum(p2v, 0.0)
        if cs.cid == CID_DUST2:
            e = -p2v * ival * 0.01
            one = jnp.ones_like(e)
            I0[:] = I0[:] * jnp.where(emit, jnp.exp(e * spec_r), one)
            I1[:] = I1[:] * jnp.where(emit, jnp.exp(e * spec_g), one)
            I2[:] = I2[:] * jnp.where(emit, jnp.exp(e * spec_b), one)
        else:
            accum_add(emit, p2v)
    elif cs.cid == CID_STARS:
        freq = (0.01 * cscale) * 100.0
        perlin = jnp.abs(pn.octave_noise_3d(nz.perm, cs.oct(10), ks, freq,
                                            px, py, pz, raw_fn=raw_fn))
        add_n = jnp.zeros_like(perlin)
        if cs.star_extra:
            add_n = noff * cloud(cs.oct(4), winding, 2.0, -2.0)
            add_n = add_n + 0.5 * noff * cloud(cs.oct(4), winding * 0.5, 4.0, -2.0)
        v = jnp.abs(jnp.power(perlin + 1.0 + add_n, ntilt))
        accum_add(emit, v)
    elif cs.cid == CID_STARS_SMALL:
        # seeded position-hash sparkle (see engine.render._sparkle_hash)
        bx = jax.lax.bitcast_convert_type(px, jnp.int32)
        by = jax.lax.bitcast_convert_type(py, jnp.int32)
        bz = jax.lax.bitcast_convert_type(pz, jnp.int32)
        from .render import hash3_i32

        hu = jnp.abs(hash3_i32(bx, by, bz))
        scale_i = jnp.maximum(cscale.astype(jnp.int32), 1)
        sel = (hu % scale_i) == 0
        dval = ((hu >> 8) % 10).astype(jnp.float32)
        v = jnp.power(dval, ntilt)
        accum_add(emit & sel, v)


def _quat_rotate_scalar(qw, qx, qy, qz, vx, vy, vz):
    """Rotate tile vectors by a scalar quaternion (sandwich product)."""
    uvx = qy * vz - qz * vy
    uvy = qz * vx - qx * vz
    uvz = qx * vy - qy * vx
    uuvx = qy * uvz - qz * uvy
    uuvy = qz * uvx - qx * uvz
    uuvz = qx * uvy - qy * uvx
    return (vx + 2.0 * (qw * uvx + uuvx),
            vy + 2.0 * (qw * uvy + uuvy),
            vz + 2.0 * (qw * uvz + uuvz))


def _twirl(ax, ay, az, t, vx, vy, vz):
    """Rotate by angle t*pi about the (scalar) unit twirl axis; t is a tile
    vector (galaxycomponent.h:86-90)."""
    half = t * (PI * 0.5)
    s = jnp.sin(half)
    c = jnp.cos(half)
    qx = ax * s
    qy = ay * s
    qz = az * s
    uvx = qy * vz - qz * vy
    uvy = qz * vx - qx * vz
    uvz = qx * vy - qy * vx
    uuvx = qy * uvz - qz * uvy
    uuvy = qz * uvx - qx * uvz
    uuvz = qx * uvy - qy * uvx
    return (vx + 2.0 * (c * uvx + uuvx),
            vy + 2.0 * (c * uvy + uuvy),
            vz + 2.0 * (c * uvz + uuvz))


def _get_winding(rad, winding_b, winding_n):
    """galaxycomponent.h:156-165 (atan via the in-kernel minimax)."""
    r = rad + 0.05
    return pn.atan_f32(jnp.exp(-0.25 / (0.5 * r)) / winding_b) * 2.0 * winding_n


def _find_difference(t1, t2):
    d = t1 - t2
    v = jnp.abs(d)
    v = jnp.minimum(v, jnp.abs(d - 2 * PI))
    v = jnp.minimum(v, jnp.abs(d + 2 * PI))
    v = jnp.minimum(v, jnp.abs(d - 4 * PI))
    v = jnp.minimum(v, jnp.abs(d + 4 * PI))
    return v


def _arm_value(static, inst, lay, S, pfx, cpre, radius, Px, Py, Pz, rot_by_rotmat):
    """galaxycomponent.h:120-146: max over per-arm pow(1-v, arm*15) with the
    reference's std::max NaN ordering (a NaN candidate never wins; a NaN
    FIRST arm poisons the max — harmless downstream because emission is
    where-masked on val*weight > 0.0005, which NaN fails like the
    reference's `continue`).

    Deliberately the LITERAL pow ladder, not max-of-bases-then-one-pow:
    pow(negative base, integral exponent) is FINITE under both std::pow and
    XLA (e.g. pow(-3, 30) = 2e14) and can legitimately win the max when
    arm*15 lands on an integer and an over-wound arm drives v above 1, so
    a base-selection rewrite diverges from the conformance path exactly
    there (and it measured perf-neutral anyway)."""
    rx, _, rz = rot_by_rotmat(Px, Py, Pz)
    theta = pn.atan2_f32(rx, rz) + S(cpre + "delta")
    ww = _get_winding(radius, S(pfx + "winding_b"), S(pfx + "winding_n"))
    arm15 = S(cpre + "arm") * 15.0
    val = None
    for a in range(inst.max_arms):
        v = jnp.abs(_find_difference(ww, -theta + S(pfx + "arms", a))) / PI
        arm_v = jnp.power(1.0 - v, arm15)
        val = arm_v if val is None else jnp.where(arm_v > val, arm_v, val)
    return val


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def _set_row0(lay: _Layout, sp, row0_f):
    """Override the packed page's global-row-offset slot on device (row0 is
    a traced value, so band/shard offsets never recompile)."""
    off = lay.offsets["row0"]
    return sp.at[..., off // 128, off % 128].set(row0_f)


def _tables_const(tr: int, lay: _Layout):
    """The kernel's constant-table input: (lay.table_blocks * tr, 128)
    int32. Block 0 is the byte-packed simplex permutation broadcast to
    (tr, 128) rows (one lane-gather + byte-extract per lookup); when the
    scene uses noise_kind='perlin', blocks 1-4 carry the packed 1024-entry
    Perlin permutation (ops/altnoise.perlin_packed_tables), each 128-word
    chunk row-broadcast the same way. Gradients have no blocks: the kernel
    regenerates them in-register (pallas_noise._perlin_grad_dot)."""
    blocks = [np.broadcast_to(PERM_PACKED32, (tr, 128))]
    if lay.table_blocks > 1:
        from ..ops.altnoise import perlin_packed_tables

        pp = perlin_packed_tables()
        for c in range(4):
            blocks.append(np.broadcast_to(pp[c * 128:(c + 1) * 128],
                                          (tr, 128)))
    return jnp.asarray(np.concatenate(blocks, axis=0).astype(np.int32))


def _tile_call(kernel, lay: _Layout, tr: int, cols: int, grid, out_rows: int,
               batched_n=None, extra_in_specs=()):
    """The pallas_call plumbing shared by every kernel builder: SMEM scalar
    page + broadcast perm-table rows in, three f32 planes out, the 11+1
    VMEM scratch set. Builders differ only in grid shape, output
    partitioning (per-frame batching) and the ray-list variant's extra
    direction inputs — a Mosaic-constraint change (scratch count, SMEM
    block shape, ...) lands HERE exactly once."""
    vmem = lambda: pltpu.VMEM((tr, TILE_C), jnp.float32)
    interpret = jax.default_backend() != "tpu"
    if batched_n is None:
        out_shape = [jax.ShapeDtypeStruct((out_rows, cols), jnp.float32)] * 3
        smem_spec = pl.BlockSpec((1, lay.smem_rows, 128),
                                 lambda i, j: (0, 0, 0),
                                 memory_space=pltpu.SMEM)
        perm_spec = pl.BlockSpec((lay.table_blocks * tr, 128),
                                 lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM)
        out_specs = [pl.BlockSpec((tr, TILE_C), lambda i, j: (i, j),
                                  memory_space=pltpu.VMEM)] * 3
    else:
        out_shape = [jax.ShapeDtypeStruct((batched_n, out_rows, cols),
                                          jnp.float32)] * 3
        smem_spec = pl.BlockSpec((1, lay.smem_rows, 128),
                                 lambda b, i, j: (b, 0, 0),
                                 memory_space=pltpu.SMEM)
        perm_spec = pl.BlockSpec((lay.table_blocks * tr, 128),
                                 lambda b, i, j: (0, 0),
                                 memory_space=pltpu.VMEM)
        out_specs = [pl.BlockSpec((1, tr, TILE_C), lambda b, i, j: (b, i, j),
                                  memory_space=pltpu.VMEM)] * 3
    return pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        out_shape=out_shape,
        in_specs=[smem_spec, perm_spec, *extra_in_specs],
        out_specs=out_specs,
        scratch_shapes=[vmem() for _ in range(11)]
        + [pltpu.VMEM((tr, TILE_C), jnp.int32)],
    )


def _fused_runs(pooled_linear, out_size: int):
    """(run, run_post, run_post_stars) over a frame-producing
    ``pooled_linear(sp)``.

    run_post fuses the render + post chain into ONE dispatch (each dispatch
    pays a tunnel round trip); run_post_stars additionally evaluates the
    star overlay ON DEVICE from the (K, 6) star-parameter rows inside the
    SAME dispatch — a starred frame ships ~24 bytes per star up and one
    uint8 image down, instead of splitting into two dispatches around a
    frame-sized host overlay upload."""
    run = jax.jit(pooled_linear)

    @jax.jit
    def run_post(sp, exposure, gamma, saturation):
        from .render import post_process

        return post_process(pooled_linear(sp), exposure, gamma, saturation)

    @jax.jit
    def run_post_stars(sp, star_p, exposure, gamma, saturation):
        from ..post.stars import star_field_device
        from .render import post_process

        lin = pooled_linear(sp) + star_field_device(star_p, out_size)
        return post_process(lin, exposure, gamma, saturation)

    return run, run_post, run_post_stars


@functools.lru_cache(maxsize=32)
def _compiled(static: SceneStatic, size: int, pool: int = 1):
    """Compiled kernel for a (structure, render size) pair.

    ``pool``: box-average factor applied to the linear radiance before it
    leaves the fused dispatch — the supersampling path renders at
    size = out_size * pool and pools back down IN LINEAR SPACE (averaging
    radiance before the nonlinear post chain is the physically correct
    anti-aliasing; RenderConfig.supersample)."""
    lay = _build_layout(static)
    tr = _tile_rows(size)
    rows = -(-size // tr) * tr
    cols = -(-size // TILE_C) * TILE_C
    kernel = _make_kernel(static, lay, size, rows, cols, tr=tr)
    call = _tile_call(kernel, lay, tr, cols, (rows // tr, cols // TILE_C),
                      rows)
    perm_rows = _tables_const(tr, lay)

    def _pooled_linear(sp):
        r, g, b = call(sp, perm_rows)
        lin = jnp.stack([r[:size, :size], g[:size, :size], b[:size, :size]],
                        axis=-1)
        if pool > 1:
            o = size // pool
            lin = lin.reshape(o, pool, o, pool, 3).mean(axis=(1, 3))
        return lin

    return (lay, *_fused_runs(_pooled_linear, size // pool))


@functools.lru_cache(maxsize=32)
def _compiled_rowshard(static: SceneStatic, size: int, mesh, pool: int = 1):
    """Row-slab-sharded kernel: ONE frame partitioned across the devices of
    a 1-D mesh — the production multi-chip path for single frames.

    This is the reference's one real parallelism axis (the OMP pixel loop,
    rasterizer.cpp:294, and RasterThread's contiguous chunks,
    rasterthread.cpp:6-25) carried to the device mesh: each device runs the
    SAME compiled tile kernel over its contiguous slab of padded rows,
    shifted by a per-device row offset written into the scalar page
    on-device. Sharded rays are bit-identical to whole-frame rays (the
    offset+local-row sum is exact in f32), and the sharded frame is gated
    bit-identical to a single-device render decomposed into the same row
    bands (_compiled_band, tests/test_sharding.py). Against the single
    fused launch, the tile program is identical, but on CPU interpret
    backends XLA:CPU recompiles the kernel body per grid shape with
    different fp contraction, so fused-vs-banded agreement there is ~1
    uint8 LSB rather than exact; on TPU the Mosaic tile program does not
    depend on the grid, making the decomposition exact. The only collective
    is the output gather XLA inserts at assembly — Rasterizer::AssembleImage
    (rasterizer.cpp:315-327).
    """
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    if len(mesh.axis_names) != 1:
        raise ValueError(f"need a 1-D mesh, got axes {mesh.axis_names}")
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    lay = _build_layout(static)
    tr = _tile_rows(size)
    # every device gets the same whole-tile slab height; slabs past the
    # frame's last row are born done (frame mask) and cost ~nothing
    rows_local = -(-size // (n_dev * tr)) * tr
    rows = rows_local * n_dev
    cols = -(-size // TILE_C) * TILE_C
    kernel = _make_kernel(static, lay, size, rows, cols, tr=tr)
    call = _tile_call(kernel, lay, tr, cols,
                      (rows_local // tr, cols // TILE_C), rows_local)
    perm_rows = _tables_const(tr, lay)

    def _local(sp):
        row0 = (jax.lax.axis_index(axis) * rows_local).astype(jnp.float32)
        return call(_set_row0(lay, sp, row0), perm_rows)

    sharded = shard_map(
        _local, mesh=mesh, in_specs=P(),
        out_specs=P(axis, None),
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )

    def _pooled_linear(sp):
        r, g, b = sharded(sp)
        lin = jnp.stack([r[:size, :size], g[:size, :size], b[:size, :size]],
                        axis=-1)
        if pool > 1:
            o = size // pool
            lin = lin.reshape(o, pool, o, pool, 3).mean(axis=(1, 3))
        return lin

    return (lay, *_fused_runs(_pooled_linear, size // pool))


@functools.lru_cache(maxsize=32)
def _compiled_batch_rowshard(static: SceneStatic, size: int,
                             nbatch_local: int, mesh, pool: int = 1):
    """2-D decomposition: batch elements over the mesh's 'batch' axis (DCN
    across hosts) AND each frame's row slabs over its 'rows' axis (ICI
    within a slice) — SURVEY §2.6's two-level decomposition, live. Each
    device renders `nbatch_local` frames' worth of its row slab; the row
    offset rides the scalar page exactly as in _compiled_rowshard."""
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    if set(mesh.axis_names) != {"batch", "rows"}:
        raise ValueError(
            f"need a ('batch', 'rows') mesh, got axes {mesh.axis_names}")
    n_rows_dev = mesh.shape["rows"]
    lay = _build_layout(static)
    tr = _tile_rows(size)
    rows_local = -(-size // (n_rows_dev * tr)) * tr
    rows = rows_local * n_rows_dev
    cols = -(-size // TILE_C) * TILE_C
    kernel = _make_kernel(static, lay, size, rows, cols, tr=tr, batched=True)
    call = _tile_call(kernel, lay, tr, cols,
                      (nbatch_local, rows_local // tr, cols // TILE_C),
                      rows_local, batched_n=nbatch_local)
    perm_rows = _tables_const(tr, lay)

    def _local(sp_rows):
        row0 = (jax.lax.axis_index("rows") * rows_local).astype(jnp.float32)
        return call(_set_row0(lay, sp_rows, row0), perm_rows)

    sharded = shard_map(
        _local, mesh=mesh, in_specs=P("batch", None, None),
        out_specs=P("batch", "rows", None),
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )

    @jax.jit
    def run(sp_rows):
        r, g, b = sharded(sp_rows)
        lin = jnp.stack(
            [r[:, :size, :size], g[:, :size, :size], b[:, :size, :size]],
            axis=-1)
        if pool > 1:
            o = size // pool
            lin = lin.reshape(-1, o, pool, o, pool, 3).mean(axis=(2, 4))
        return lin

    return lay, run


@functools.lru_cache(maxsize=32)
def _compiled_band(static: SceneStatic, size: int, band_rows: int,
                   pool: int = 1):
    """One row band of a frame as a single dispatch, with the band's global
    row offset a TRACED argument — every band of a progressive render (and
    any frame size sharing the band shape) reuses one executable.

    Returns (lay, run_linear, run_post, run_post_overlay); the post chain
    (buffer2d.cpp:106-126) is per-pixel, so each band leaves the device as
    finished uint8 — the progressive contract (rasterizer.cpp:283-313
    percentDone + partial back buffer) without ever downloading f32 frames.
    """
    lay = _build_layout(static)
    tr = _tile_rows(size)
    if band_rows % tr or (pool > 1 and band_rows % pool):
        raise ValueError(
            f"band_rows {band_rows} must be a multiple of the tile height "
            f"{tr} and the pool factor {pool}")
    cols = -(-size // TILE_C) * TILE_C
    kernel = _make_kernel(static, lay, size, band_rows, cols, tr=tr)
    call = _tile_call(kernel, lay, tr, cols,
                      (band_rows // tr, cols // TILE_C), band_rows)
    perm_rows = _tables_const(tr, lay)

    def _band_linear(sp, row0):
        r, g, b = call(_set_row0(lay, sp, row0), perm_rows)
        lin = jnp.stack([r[:, :size], g[:, :size], b[:, :size]], axis=-1)
        if pool > 1:
            lin = lin.reshape(band_rows // pool, pool, size // pool, pool,
                              3).mean(axis=(1, 3))
        return lin

    run_linear = jax.jit(_band_linear)

    @jax.jit
    def run_post(sp, row0, exposure, gamma, saturation):
        from .render import post_process

        return post_process(_band_linear(sp, row0), exposure, gamma,
                            saturation)

    @jax.jit
    def run_post_overlay(sp, row0, overlay, exposure, gamma, saturation):
        from .render import post_process

        return post_process(_band_linear(sp, row0) + overlay, exposure,
                            gamma, saturation)

    return lay, run_linear, run_post, run_post_overlay


@functools.lru_cache(maxsize=32)
def _compiled_batch(static: SceneStatic, size: int, nbatch: int,
                    pool: int = 1):
    """Batched variant: grid (nbatch, rows/8, cols/128); one SMEM scalar row
    and one output frame per batch element. ``pool`` box-averages the linear
    radiance per frame before it leaves the dispatch (supersampling)."""
    lay = _build_layout(static)
    tr = _tile_rows(size)
    rows = -(-size // tr) * tr
    cols = -(-size // TILE_C) * TILE_C
    kernel = _make_kernel(static, lay, size, rows, cols, tr=tr, batched=True)
    call = _tile_call(kernel, lay, tr, cols,
                      (nbatch, rows // tr, cols // TILE_C), rows,
                      batched_n=nbatch)
    perm_rows = _tables_const(tr, lay)

    @jax.jit
    def run(sp_rows):
        r, g, b = call(sp_rows, perm_rows)
        lin = jnp.stack(
            [r[:, :size, :size], g[:, :size, :size], b[:, :size, :size]],
            axis=-1)
        if pool > 1:
            o = size // pool
            lin = lin.reshape(-1, o, pool, o, pool, 3).mean(axis=(2, 4))
        return lin

    return lay, run


@functools.lru_cache(maxsize=16)
def _compiled_dirs(static: SceneStatic, n_rays: int):
    """Ray-list variant (all-sky / arbitrary directions): rays arrive as
    three (rows, 128) arrays instead of being generated from the camera."""
    lay = _build_layout(static)
    rows = -(-n_rays // TILE_C)
    rows = -(-rows // TILE_R) * TILE_R
    cols = TILE_C
    kernel = _make_kernel(static, lay, 0, rows, cols, rays_input=True)

    dir_spec = pl.BlockSpec((TILE_R, TILE_C), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    call = _tile_call(kernel, lay, TILE_R, cols, (rows // TILE_R, 1), rows,
                      extra_in_specs=(dir_spec, dir_spec, dir_spec))
    perm_rows = _tables_const(TILE_R, lay)

    @jax.jit
    def run(sp, dx, dy, dz):
        r, g, b = call(sp, perm_rows, dx, dy, dz)
        flat = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1)
        return flat[:n_rays]

    return lay, rows * cols, run


@functools.lru_cache(maxsize=16)
def _compiled_dirs_rowshard(static: SceneStatic, n_rays: int, mesh):
    """Ray-list kernel with the ray rows sharded over a 1-D mesh — the
    multi-device all-sky path (the HEALPix renderer, hpxrasterizer.cpp:
    61-140, gets the same multi-chip story as the frame renderers).
    Unlike the frame row slabs (_compiled_rowshard) there is no per-device
    row offset to thread: rays arrive EXPLICITLY as (rows, 128) direction
    arrays, and the kernel body has no dependence on the global ray index
    (rays_input branch of _make_kernel), so each device just runs the same
    tile program over its slab of direction rows. Padding rays are zero
    vectors (never intersect). The only collective is XLA's output gather
    at assembly."""
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    if len(mesh.axis_names) != 1:
        raise ValueError(f"need a 1-D mesh, got axes {mesh.axis_names}")
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    lay = _build_layout(static)
    rows = -(-n_rays // TILE_C)
    rows_local = -(-rows // (n_dev * TILE_R)) * TILE_R
    rows = rows_local * n_dev
    cols = TILE_C
    kernel = _make_kernel(static, lay, 0, rows, cols, rays_input=True)

    dir_spec = pl.BlockSpec((TILE_R, TILE_C), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    call = _tile_call(kernel, lay, TILE_R, cols, (rows_local // TILE_R, 1),
                      rows_local,
                      extra_in_specs=(dir_spec, dir_spec, dir_spec))
    perm_rows = _tables_const(TILE_R, lay)

    def _local(sp, dx, dy, dz):
        return call(sp, perm_rows, dx, dy, dz)

    sharded = shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )

    @jax.jit
    def run(sp, dx, dy, dz):
        r, g, b = sharded(sp, dx, dy, dz)
        flat = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)],
                         axis=-1)
        return flat[:n_rays]

    return lay, rows * cols, run


def render_dirs_pallas(scene: Scene, dirs, mesh=None) -> np.ndarray:
    """Linear radiance for an arbitrary (N, 3) ray-direction list via the
    Pallas kernel (the HPXRasterizer work-list analog). With ``mesh`` (a
    1-D device mesh) the ray rows are sharded across its devices."""
    static, params = flatten_scene(scene, jnp.float32)
    camera = np.asarray(scene.camera.camera, np.float32)
    inv_vp = cam_ops.inv_view_projection_host(
        camera, scene.camera.target, scene.camera.up, scene.camera.fov)
    cfg = scene.config
    dirs = np.asarray(dirs, np.float32)
    n = dirs.shape[0]
    if mesh is not None:
        lay, padded, run = _compiled_dirs_rowshard(static, n, mesh)
    else:
        lay, padded, run = _compiled_dirs(static, n)
    sp = _pack_scalars(static, lay, params, camera, inv_vp,
                       np.float32(cfg.ray_step), np.float32(cfg.min_ray_step))
    pad = padded - n
    d = np.concatenate([dirs, np.zeros((pad, 3), np.float32)], axis=0)
    rows = padded // TILE_C
    dx = jnp.asarray(d[:, 0].reshape(rows, TILE_C))
    dy = jnp.asarray(d[:, 1].reshape(rows, TILE_C))
    dz = jnp.asarray(d[:, 2].reshape(rows, TILE_C))
    return np.asarray(run(sp, dx, dy, dz))


def _check_march_cap(scene: Scene) -> None:
    """Surface the MAX_ITERS safety cap instead of silently truncating: a
    pathological scene (huge ellipsoid + tiny min step) whose WORST-CASE
    march length exceeds the kernel's substep cap would lose its
    camera-near segment. The check is conservative (closed-form bound from
    the step schedule, diff.conservative_step_bound), so a warning means
    'can truncate', not 'did truncate'."""
    from .diff import conservative_step_bound

    cfg = scene.config
    max_axis = max(
        (max(gi.galaxy.params.axis) for gi in scene.instances), default=1.0)
    bound = conservative_step_bound(cfg.ray_step, cfg.min_ray_step, max_axis)
    # each instance marches in its OWN while_loop (it restarts at 0 per
    # _march_instance call), so the cap applies per instance, not summed
    if bound > MAX_ITERS:
        import warnings

        from ..utils.log import Messages

        msg = (f"scene's worst-case march length (~{bound} substeps/instance"
               f", axis {max_axis:g}, min step {cfg.min_ray_step:g}) exceeds "
               f"the kernel cap MAX_ITERS={MAX_ITERS}; rays needing more "
               "substeps would truncate their camera-near segment. Use a "
               "larger min_ray_step or smaller ellipsoid axes.")
        Messages.message("WARNING: " + msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=3)


def _prepared(scene: Scene, mesh=None):
    cfg = scene.config
    _check_march_cap(scene)
    static, params = flatten_scene(scene, jnp.float32)
    camera = np.asarray(scene.camera.camera, np.float32)
    inv_vp = cam_ops.inv_view_projection_host(
        camera, scene.camera.target, scene.camera.up, scene.camera.fov)
    ss = cfg.supersample
    if mesh is not None:
        lay, run, run_post, run_post_stars = _compiled_rowshard(
            static, cfg.size * ss, mesh, ss)
    else:
        lay, run, run_post, run_post_stars = _compiled(static, cfg.size * ss, ss)
    sp = _pack_scalars(static, lay, params, camera, inv_vp,
                       np.float32(cfg.ray_step), np.float32(cfg.min_ray_step))
    return sp, run, run_post, run_post_stars


def render_linear_pallas(scene: Scene, mesh=None):
    """Linear radiance buffer (size, size, 3) float32 via the Pallas kernel.
    With ``mesh`` (1-D), the frame's rows are sharded across its devices."""
    sp, run, _, _ = _prepared(scene, mesh)
    return run(sp)


def render_scene_pallas(scene: Scene, mesh=None, device_out: bool = False):
    """Full frame via the Pallas kernel -> uint8 image (+ star overlay/post
    identical to engine.render.render_scene).

    With ``mesh`` (a 1-D device mesh), the frame's row slabs are sharded
    across its devices — the multi-chip production path for single frames
    (see _compiled_rowshard for the exactness contract).

    The linear buffer STAYS ON DEVICE through the post chain — only the
    final uint8 image is transferred, always in ONE dispatch: a starred
    frame evaluates the overlay on device from the (K, 6) star-parameter
    rows (post/stars.star_field_device) inside the same fused dispatch,
    uploading ~24 bytes per star instead of a frame-sized overlay.
    """
    cfg = scene.config
    sp, run, run_post, run_post_stars = _prepared(scene, mesh)
    exposure = np.float32(cfg.exposure)
    gamma = np.float32(cfg.gamma)
    saturation = np.float32(cfg.saturation)
    if cfg.no_stars > 0:
        from ..post.stars import pad_star_rows, star_params

        # bucket-padded so star count/seed edits reuse the compiled
        # executable (w=0 pad rows splat nothing)
        star_p = pad_star_rows(
            star_params(cfg.size, cfg.no_stars, cfg.star_size,
                        cfg.star_size_spread, cfg.star_strength,
                        cfg.star_seed))
        img = run_post_stars(sp, jnp.asarray(star_p), exposure, gamma,
                             saturation)
    else:
        img = run_post(sp, exposure, gamma, saturation)
    if device_out:
        # Skip the host download: the caller keeps the uint8 frame on
        # device (device-side timing, further on-device post, ...). Over
        # the dev tunnel a frame download costs seconds at 4K+ — pure
        # link cost a production-attached host does not pay.
        return img
    return np.asarray(img)


def render_progressive_pallas(scene: Scene, bands: int = 16,
                              on_progress=None) -> np.ndarray:
    """Progressive Pallas render: the frame in row-band dispatches, with
    percent-done callbacks and cooperative abort BETWEEN bands — the
    reference's progress/ETA + abort contract (rasterizer.cpp:283-313,
    consolerenderer.cpp:80-93, Rasterizer::Abort rasterizer.h:91-98) on the
    production kernel, which a single fused launch cannot provide.

    ``on_progress(frac, partial_uint8) -> False`` aborts; the partially
    filled frame (un-rendered rows black) is returned, like the reference's
    aborted back buffer. Bands run the same tile program as the fused
    single-launch frame (same ray math, per-pixel post) — on TPU that makes
    progressive mode bit-identical to the fused frame; on CPU interpret
    backends XLA recompiles per grid shape and agreement is ~1 uint8 LSB
    (see _compiled_rowshard). Either way it is a latency/observability
    knob, not a quality knob.
    """
    import math

    cfg = scene.config
    _check_march_cap(scene)
    static, params = flatten_scene(scene, jnp.float32)
    camera = np.asarray(scene.camera.camera, np.float32)
    inv_vp = cam_ops.inv_view_projection_host(
        camera, scene.camera.target, scene.camera.up, scene.camera.fov)
    ss = cfg.supersample
    S = cfg.size * ss
    tr = _tile_rows(S)
    granule = tr * ss // math.gcd(tr, ss)  # band height quantum
    rows = -(-S // granule) * granule
    n_bands = max(1, min(bands, rows // granule))
    band_rows = -(-(rows // granule) // n_bands) * granule
    n_bands = -(-S // band_rows)  # bands that actually cover frame rows

    lay, _run_lin, run_post, run_post_ov = _compiled_band(
        static, S, band_rows, ss)
    sp = _pack_scalars(static, lay, params, camera, inv_vp,
                       np.float32(cfg.ray_step), np.float32(cfg.min_ray_step))
    exposure = np.float32(cfg.exposure)
    gamma = np.float32(cfg.gamma)
    saturation = np.float32(cfg.saturation)

    overlay = None
    if cfg.no_stars > 0:
        from ..post.stars import render_star_field

        overlay = render_star_field(
            cfg.size, cfg.no_stars, cfg.star_size, cfg.star_size_spread,
            cfg.star_strength, cfg.star_seed)

    band_out = band_rows // ss
    out = np.zeros((n_bands * band_out, cfg.size, 3), np.uint8)

    def dispatch(b: int):
        row0 = np.float32(b * band_rows)
        if overlay is not None:
            ob = np.zeros((band_out, cfg.size, 3), np.float32)
            lo = b * band_out
            hi = min(cfg.size, lo + band_out)
            if hi > lo:
                ob[: hi - lo] = overlay[lo:hi]
            return run_post_ov(sp, row0, jnp.asarray(ob), exposure, gamma,
                               saturation)
        return run_post(sp, row0, exposure, gamma, saturation)

    # one-band software pipeline: band b+1 is DISPATCHED before band b is
    # downloaded, so the uint8 band transfer overlaps the next band's
    # device march (jax dispatch is async; np.asarray forces). At giant
    # frames the transfer is material — a 16K^2 band is 50 MB of uint8,
    # seconds on a degraded tunnel link — and without overlap it
    # serializes with the march (measured r4: 16384^2 streamed at ~3.4x
    # the fused per-pixel rate in a slow-link hour). Values are unchanged
    # (same executables, same order); progress/abort now trail the
    # dispatch by one band, which still stops a cancelled render at the
    # NEXT band boundary like the reference's abort slack.
    pending_b = None
    pending = None
    for b in range(n_bands):
        band = dispatch(b)
        if pending is not None:
            out[pending_b * band_out: (pending_b + 1) * band_out] = (
                np.asarray(pending))
            if on_progress is not None:
                partial = out[: cfg.size].copy()
                if on_progress((pending_b + 1) / n_bands, partial) is False:
                    return partial
        pending_b, pending = b, band
    out[pending_b * band_out: (pending_b + 1) * band_out] = np.asarray(pending)
    if on_progress is not None:
        partial = out[: cfg.size].copy()
        if on_progress(1.0, partial) is False:
            return partial
    return out[: cfg.size]
