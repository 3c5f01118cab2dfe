"""Tensorized differentiable march: the TPU-native gradient path.

The scan march (engine/diff.py) replays the reference's sequential loop
(rasterizer.cpp:422-483) step by step; its reverse pass is a 200-odd-step
sequential transpose whose per-step bodies are far too small to occupy a
TPU — that is what made fitting 3.5 s/step at 64^2 in round 1.

This module removes the sequential dependence entirely, using a structural
fact of the pipeline: every per-step update is AFFINE in the accumulator,

    I_{k+1} = exp(E_k) * I_k + B_k

because emissions never depend on I and the per-channel absorption factors
are exponentials (render._component_sample's contract). The march therefore
factorizes into three parts:

  1. a tiny scalar scan computing each ray's step schedule t_k (the
     adaptive clamp schedule has a 1-D recursion per ray — a few scalar
     carries, negligible cost either direction);
  2. embarrassingly parallel evaluation of the per-sample effects
     (E_k, B_k) over (step-chunk x rays) grids — ALL of the noise math,
     now wide elementwise computation the TPU can tile, rematerialized
     under jax.checkpoint per chunk;
  3. a closed-form composition: within a chunk I = I_in * exp(sum E) +
     sum_k B_k * exp(suffix_k) (suffix via one cumulative sum), and chunks
     compose sequentially as affine maps (STEP_CHUNK steps each, bounding
     backward memory at O(chunk x rays) — a 128^2 pose fit fits in HBM
     where the unchunked form OOM'd the compiler).

Forward values match the sequential paths to fp-reassociation tolerance
(the camera-distance and chord bookkeeping use the incremental forms, like
the Pallas kernel); gradients agree with the scan path to the same order
(gated in tests/test_tensor_march.py). One knowing divergence: a NaN
emission on an active lane zeroes the whole accumulated intensity in the
sequential paths (RasterPixel::Floor semantics, rasterpixel.cpp:34-38) but
only that step's contribution here — it differs only for parameter sets
whose render is already NaN-poisoned, which no fit target is.

Within a step, components still compose in list order (emission adds,
absorption multiplies — they do not commute): B accumulates each emitter's
contribution and is re-attenuated by every later-in-step absorber, exactly
the (((I + e1) * a2) + e3) bracketing of the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import camera as cam_ops
from ..ops.math3d import intersect_ellipsoid, norm3, qt_clamp
from .diff import post_process_float, safe_pow
from .render import _component_sample, _dither01, _is_absorber
from .scene_prep import InstanceStatic, SceneStatic


# steps per rematerialized chunk of the effects evaluation. The march
# composes chunk-affine maps sequentially (each chunk is itself I' =
# exp(Ec)*I + Bc), so backward memory is O(chunk x rays) instead of
# O(steps x rays) — a 128^2 pose fit needs ~30 MB of temporaries instead
# of the multi-GB that OOM'd the TPU compiler, while the work inside each
# chunk stays fully parallel.
STEP_CHUNK = 64


def _schedule(pr, dirs, camera, ray_step, min_step, max_steps: int,
              dither: bool, step_chunk: int):
    """The per-ray march geometry + step schedule (param-dependent only
    through guarded-constant leaves in the frozen path): returns
    (origin, dir_m, ts, actives, weights, n_chunks) with the step arrays
    shaped (n_chunks * step_chunk, N)."""
    o = camera - pr["position"]
    hit, isp1, isp2, t0, t1 = intersect_ellipsoid(o, dirs, pr["axis"])
    isp2 = jnp.where((t1 > 0)[..., None], o, isp2)
    alive = hit & ~((t0 > 0) & (t1 > 0))

    origin = isp1
    # camera distance is affine along the march (rays originate at the
    # camera; the behind-camera rule only truncates at t=0) — the same
    # incremental form the Pallas kernel uses (pallas_render.py dist0-tacc)
    dist_origin = norm3(origin - o)
    if dither:
        step0 = qt_clamp(dist_origin * ray_step, min_step, 0.01)
        diff0 = origin - isp2
        len0 = norm3(diff0)
        safe0 = jnp.where(len0 == 0, 1.0, len0)
        delta = jnp.minimum(step0 * _dither01(dirs), len0)
        origin = origin - (diff0 / safe0[..., None]) * delta[..., None]
        dist_origin = dist_origin - delta
    diff = origin - isp2
    length = norm3(diff)
    safe = jnp.where(length == 0, 1.0, length)
    dir_m = diff / safe[..., None]

    # step schedule: t_k along the chord, per ray (cheap scalar scan)
    def tbody(carry, _):
        t, step_prev, done = carry
        done = done | (t >= length + step_prev)
        active = ~done
        dist = dist_origin - t
        step = qt_clamp(dist * ray_step, min_step, 0.01)
        af = active.astype(t.dtype)
        out = (t, active, step * 200.0)
        return (t + step * af, jnp.where(active, step, step_prev), done), out

    # pad the trip count to whole chunks: padded steps run with done=True
    # (done persists in the schedule scan), so their effects are exact zeros
    n_chunks = max(1, -(-max_steps // step_chunk))
    S = n_chunks * step_chunk
    init = (jnp.zeros_like(length), jnp.full_like(length, ray_step), ~alive)
    _, (ts, actives, weights) = jax.lax.scan(tbody, init, None, length=S)
    return origin, dir_m, ts, actives, weights, n_chunks


def _march_instance_tensor(st: InstanceStatic, pr, dirs, camera, I,
                           ray_step, min_step, max_steps: int,
                           dither: bool = False,
                           step_chunk: int = STEP_CHUNK,
                           frozen_noise=None):
    """One instance's march as (schedule scan) + (parallel per-chunk
    effects) + (affine chunk composition). dirs: (N, 3) unit rays;
    I: (N, 3). ``frozen_noise``: optional per-component noise-field
    tuples shaped (n_chunks, step_chunk, N) from precompute_frozen —
    consumed under stop_gradient in place of inline noise evaluation."""
    origin, dir_m, ts, actives, weights, n_chunks = _schedule(
        pr, dirs, camera, ray_step, min_step, max_steps, dither, step_chunk)

    def step_effects(P, actives, weights, noise_c=None):
        E = jnp.zeros(P.shape[:-1] + (3,), P.dtype)  # log attenuation
        B = jnp.zeros_like(E)                        # in-step emission
        winding = jnp.zeros(P.shape[:-1], P.dtype)
        for ci, (cs, cp) in enumerate(zip(st.comps, pr["comps"])):
            noise = None if noise_c is None else noise_c[ci]
            emit, att_e, winding = _component_sample(
                cs, st, pr, cp, P, actives, weights, ray_step, winding,
                pow_fn=safe_pow, noise=noise,
            )
            if _is_absorber(cs):
                B = B * jnp.exp(att_e)
                E = E + att_e
            else:
                B = B + emit
        # a NaN effect would poison the whole composition sum; zero it like
        # the sequential paths' floor0 zeroes NaN accumulators (see module
        # docstring for the one semantic difference)
        return jnp.nan_to_num(E), jnp.nan_to_num(B)

    # 2+3. chunk-affine composition: within a chunk, all sample effects
    # evaluate in parallel and reduce via the suffix cumulative sum; chunks
    # compose sequentially (each is I' = exp(Ec)*I + Bc). Rematerializing
    # per chunk bounds backward memory at O(step_chunk x rays).
    def chunk_body(I, inputs):
        t_c, act_c, w_c, noise_c = inputs  # (step_chunk, N)
        P = origin[None] - dir_m[None] * t_c[..., None]
        E, B = step_effects(P, act_c, w_c, noise_c)
        incl = jnp.cumsum(E[::-1], axis=0)[::-1]  # sum_{j>=k} E_j
        suffix = incl - E                          # sum_{j>k}  E_j
        return I * jnp.exp(incl[0]) + jnp.sum(B * jnp.exp(suffix), axis=0), None

    if frozen_noise is None:
        # the scan body indexes noise_c per component; a literal None leaf
        # per component keeps the xs pytree aligned without any arrays
        noise_xs = tuple(None for _ in st.comps)
    else:
        # frozen fields are constants of the optimization: gradients
        # through them are zero a.e. anyway (they vary only through
        # discrete gate selections), so stop_gradient loses nothing —
        # see precompute_frozen's guard for the field sets this holds for
        noise_xs = jax.lax.stop_gradient(frozen_noise)
    chunks = (ts.reshape(n_chunks, step_chunk, -1),
              actives.reshape(n_chunks, step_chunk, -1),
              weights.reshape(n_chunks, step_chunk, -1),
              noise_xs)
    I, _ = jax.lax.scan(jax.checkpoint(chunk_body), I, chunks)
    return I


def render_rays_tensor(static: SceneStatic, params, dirs, camera, ray_step,
                       min_step, max_steps: int):
    """Differentiable twin of render.render_rays with the tensorized march.
    dirs: (..., 3) -> (..., 3) linear radiance."""
    shape = dirs.shape[:-1]
    dirs_f = dirs.reshape(-1, 3)
    I = jnp.zeros((dirs_f.shape[0], 3), dirs.dtype)
    for st, pr in zip(static.instances, params):
        # instances compose sequentially (far->near, rasterizer.cpp:190-201)
        # and each instance's action on I is itself affine, so threading I
        # through per-instance tensor marches is exact
        I = _march_instance_tensor(st, pr, dirs_f, camera, I, ray_step,
                                   min_step, max_steps,
                                   dither=static.dither)
    I = I * (0.01 / ray_step)
    return I.reshape(*shape, 3)


# ---------------------------------------------------------------------------
# Frozen-noise fitting: precompute the fractal fields once, fit pure algebra
# ---------------------------------------------------------------------------
#
# Observation: for the common fit-field sets (strength/r0/z0/inner/delta/
# arm/...), the fitted parameters enter the raw fractal noise ONLY through
# discrete gate selections (the winding carry picks values where gates
# pass), so the true autodiff gradient through the noise is zero almost
# everywhere. The noise fields are therefore constants of the optimization:
# evaluate them once at the starting parameters, stop_gradient them, and
# every optimization step reduces to the cheap differentiable algebra
# around them — the noise cost (~10 raw simplex evals per hot sample,
# rasterizer.cpp:447-475 x simplexnoise.cpp:173+) is paid once per fit
# instead of twice per step (forward + backward recompute).

# leaves that invalidate the frozen fields: march geometry (positions /
# schedule) or raw-noise inputs (frequency / persistence / twirl angle)
_FROZEN_UNSAFE_ALWAYS = frozenset({
    "axis", "position", "orientation", "twirl_axis", "rotmat",
    "scale", "ks", "winding", "winding_b", "winding_n",
})
# ridged fractals take offset/tilt INSIDE the octave loop
# (noise.cpp:81-128), so for dust2/"dust positive" they are noise inputs
_FROZEN_UNSAFE_RIDGED = frozenset({"noise_offset", "noise_tilt"})


def check_frozen_fields(static: SceneStatic, fit_fields) -> None:
    """Raise if ``fit_fields`` would invalidate frozen noise fields."""
    from ..scene.schema import CID_DUST2, CID_DUST_POSITIVE

    fields = set(fit_fields)
    bad = fields & _FROZEN_UNSAFE_ALWAYS
    has_ridged = any(
        cs.cid in (CID_DUST2, CID_DUST_POSITIVE)
        for st in static.instances for cs in st.comps)
    if has_ridged:
        bad |= fields & _FROZEN_UNSAFE_RIDGED
    if bad:
        raise ValueError(
            f"march='frozen' cannot fit {sorted(bad)}: these fields feed "
            "the raw fractal noise (or the march geometry), which the "
            "frozen path precomputes once. Use march='tensor' instead."
        )


def precompute_frozen(static: SceneStatic, params, dirs, camera, ray_step,
                      min_step, max_steps: int,
                      step_chunk: int = STEP_CHUNK):
    """Evaluate every component's raw noise fields once, for every sample
    of the march schedule. Returns a per-instance tuple of per-component
    field tuples shaped (n_chunks, step_chunk, N) — the ``frozen`` input
    of render_rays_tensor_frozen.

    Replays the exact gating/winding-carry expressions of the march
    (render._sample_gates) so the frozen fields match what the live march
    would compute at these parameters bit-for-bit.
    """
    from .render import _component_noise, _sample_gates
    from ..scene.schema import CID_BULGE

    dirs_f = dirs.reshape(-1, 3)
    out = []
    for st, pr in zip(static.instances, params):
        origin, dir_m, ts, actives, _w, n_chunks = _schedule(
            pr, dirs_f, camera, ray_step, min_step, max_steps,
            static.dither, step_chunk)

        def chunk_fields(inputs, st=st, pr=pr, origin=origin, dir_m=dir_m):
            t_c, act_c = inputs
            P = origin[None] - dir_m[None] * t_c[..., None]
            winding = jnp.zeros(P.shape[:-1], P.dtype)
            fields = []
            for cs, cp in zip(st.comps, pr["comps"]):
                if cs.cid == CID_BULGE:
                    fields.append(())
                    continue
                _g, _z, _r, _i, _P, winding = _sample_gates(
                    cs, pr, cp, P, act_c, winding)
                fields.append(_component_noise(cs, pr, cp, P, winding))
            return tuple(fields)

        # one chunk at a time bounds precompute memory at
        # O(step_chunk x rays) temporaries, same as the march itself
        fields = jax.lax.map(chunk_fields, (
            ts.reshape(n_chunks, step_chunk, -1),
            actives.reshape(n_chunks, step_chunk, -1),
        ))
        out.append(fields)
    return tuple(out)


def render_rays_tensor_frozen(static: SceneStatic, params, dirs, camera,
                              ray_step, min_step, max_steps: int, frozen):
    """render_rays_tensor with precomputed (frozen) noise fields — the
    fast fit forward: bit-identical to the tensor march at the parameters
    the fields were computed at, and exact in value whenever the fitted
    fields pass check_frozen_fields (parameters that would move the noise
    are excluded there)."""
    shape = dirs.shape[:-1]
    dirs_f = dirs.reshape(-1, 3)
    I = jnp.zeros((dirs_f.shape[0], 3), dirs.dtype)
    for st, pr, fz in zip(static.instances, params, frozen):
        I = _march_instance_tensor(st, pr, dirs_f, camera, I, ray_step,
                                   min_step, max_steps,
                                   dither=static.dither,
                                   frozen_noise=fz)
    I = I * (0.01 / ray_step)
    return I.reshape(*shape, 3)


def render_frame_tensor(static: SceneStatic, size: int, max_steps: int,
                        params, camera, inv_vp, ray_step, min_step,
                        exposure, gamma, saturation):
    """One differentiable frame via the tensorized march (float image in
    [0, 255], linear radiance) — drop-in for diff.render_frame_diff."""
    dirs = cam_ops.ray_grid(size, inv_vp)
    linear = render_rays_tensor(
        static, params, dirs, camera, ray_step, min_step, max_steps)
    return post_process_float(linear, exposure, gamma, saturation), linear


render_frame_tensor_jit = functools.partial(
    jax.jit, static_argnums=(0, 1, 2)
)(render_frame_tensor)
