"""Differentiable render path: fixed-trip scan march + float post chain.

The production XLA march (render.py::_march_instance) runs inside a
``lax.while_loop``, which JAX cannot reverse-differentiate. This module
re-expresses the *identical* per-step math as a ``lax.scan`` with a static
trip bound: scan lowers to the same vectorized step body, is reverse-mode
differentiable, and the body is rematerialized (``jax.checkpoint``) so the
backward pass stores only the small per-step carries instead of every
activation of the 30-odd noise evaluations per sample.

This is a capability the reference cannot offer at all — its renderer is a
one-way C++ loop (rasterizer.cpp:422-483). Differentiability is what the
functional formulation buys for free; gradient-based fitting of galaxy
parameters to target images ("inverse galaxy design") lives in
engine/fit.py on top of this path.

Equivalence contract: for any trip bound >= the while_loop's realized trip
count, the scan march computes bit-identical radiance — the body re-derives
its done mask exactly like the while condition, so surplus trips are no-ops
(gated in tests/test_fit.py). ``conservative_step_bound`` derives such a
bound from the closed form of the adaptive step schedule
(step = clamp(dist * rayStep, minStep, 0.01), rasterizer.cpp:449).

Gradient-safety: a handful of reference expressions are NaN-producing on
purpose — pow(1-v, arm*15) with v>1 relies on std::max NaN ordering
(galaxycomponent.h:120-137), pow(x, tilt) sees x==0 lanes — and the forward
math discards those lanes with where/max masks. Reverse-mode would still
pull NaN/inf cotangents through them, so the scan path threads ``safe_pow``
(identical primal, non-finite partials zeroed) through the component math,
and fit steps additionally sanitize gradients.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..ops import camera as cam_ops
from ..ops.math3d import dot3, floor0, intersect_ellipsoid, norm3, qt_clamp
from .render import _apply_component, _march_instance  # noqa: F401 (re-export for tests)
from .scene_prep import InstanceStatic, SceneStatic


@jax.custom_jvp
def safe_pow(x, e):
    """``jnp.power`` with gradient-safe partials.

    Primal is exactly ``jnp.power(x, e)`` (including NaN for negative base
    with non-integral exponent — the reference's NaN-ordering semantics
    depend on it). The JVP zeroes each partial where the true derivative is
    non-finite (x <= 0 or the primal itself non-finite), which is precisely
    the set of lanes the forward math masks away.
    """
    return jnp.power(x, e)


@safe_pow.defjvp
def _safe_pow_jvp(primals, tangents):
    x, e = primals
    dx, de = tangents
    y = jnp.power(x, e)
    dydx = e * jnp.power(x, e - 1.0)
    dyde = y * jnp.log(x)
    dydx = jnp.where(jnp.isfinite(dydx), dydx, 0.0)
    dyde = jnp.where(jnp.isfinite(dyde), dyde, 0.0)
    return y, dydx * dx + dyde * de


def conservative_step_bound(ray_step: float, min_step: float,
                            max_axis: float = 1.0, slack: float = 1.15) -> int:
    """Static trip bound >= the realized while_loop trip count of any ray.

    The adaptive step is clamp(dist*rayStep, minStep, 0.01) and the path
    length inside the bounding ellipsoid is <= 2*max(axis). Split the chord
    by camera distance: below d1 = minStep/rayStep the step is minStep;
    between d1 and d2 = 0.01/rayStep the schedule is geometric (trip count
    <= ln(d2/d1)/rayStep per side of the camera); beyond d2 it is a flat
    0.01. Sum the three regions' worst cases plus slack.
    """
    chord = 2.0 * max_axis
    d1 = min_step / ray_step
    d2 = 0.01 / ray_step
    trips = min(chord, 2.0 * d1) / min_step
    rem = chord - min(chord, 2.0 * d1)
    if rem > 0 and d2 > d1:
        trips += 2.0 * math.log(d2 / d1) / ray_step
        rem -= min(rem, 2.0 * (d2 - d1))
    if rem > 0:
        trips += rem / 0.01
    return int(trips * slack) + 16


def step_bound_for_scene(scene) -> int:
    """conservative_step_bound evaluated at a Scene's knobs."""
    max_axis = max(
        (max(gi.galaxy.params.axis) for gi in scene.instances), default=1.0
    )
    return conservative_step_bound(
        scene.config.ray_step, scene.config.min_ray_step, max_axis
    )


def _march_instance_scan(st: InstanceStatic, pr, dirs, camera, I, winding,
                         ray_step, min_step, max_steps: int,
                         remat: bool = True, dither: bool = False):
    """_march_instance with the while_loop unrolled into a fixed-trip scan.

    Same state, same body math (the component dispatch is shared via
    _apply_component with pow_fn=safe_pow), same done-mask derivation —
    only the loop construct differs.
    """
    o = camera - pr["position"]
    hit, isp1, isp2, t0, t1 = intersect_ellipsoid(o, dirs, pr["axis"])
    isp2 = jnp.where((t1 > 0)[..., None], o, isp2)
    alive = hit & ~((t0 > 0) & (t1 > 0))

    origin = isp1
    if dither:
        # Mirror render._march_instance's dithered start exactly so the
        # scan==while bit-exactness contract holds for dithered scenes too.
        from .render import _dither01

        step0 = qt_clamp(norm3(origin - o) * ray_step, min_step, 0.01)
        diff0 = origin - isp2
        len0 = norm3(diff0)
        safe0 = jnp.where(len0 == 0, 1.0, len0)
        delta = jnp.minimum(step0 * _dither01(dirs), len0)
        origin = origin - (diff0 / safe0[..., None]) * delta[..., None]
    diff = origin - isp2
    length = norm3(diff)
    safe = jnp.where(length == 0, 1.0, length)
    dir_m = diff / safe[..., None]
    ll = -dir_m

    state = dict(
        p=origin,
        I=I,
        winding=winding,
        step_prev=jnp.full_like(length, ray_step),
        done=~alive,
    )

    def body(s, _):
        p = s["p"]
        d_along = dot3(p - origin, ll)
        done = s["done"] | (d_along >= length + s["step_prev"])
        active = ~done

        dist = norm3(p - o)
        step = qt_clamp(dist * ray_step, min_step, 0.01)
        weight = step * 200.0

        I_s = s["I"]
        w_s = s["winding"]
        for cs, cp in zip(st.comps, pr["comps"]):
            I_s, w_s = _apply_component(
                cs, st, pr, cp, p, active, weight, I_s, w_s, ray_step,
                pow_fn=safe_pow,
            )

        p_new = p - dir_m * step[..., None]
        return dict(
            p=jnp.where(active[..., None], p_new, p),
            I=jnp.where(active[..., None], floor0(I_s), s["I"]),
            winding=jnp.where(active, w_s, s["winding"]),
            step_prev=jnp.where(active, step, s["step_prev"]),
            done=done,
        ), None

    if remat:
        body = jax.checkpoint(body)
    out, _ = jax.lax.scan(body, state, None, length=max_steps)
    return out["I"], out["winding"]


def render_rays_diff(static: SceneStatic, params, dirs, camera, ray_step,
                     min_step, max_steps: int, remat: bool = True):
    """Differentiable twin of render.render_rays. dirs: (..., 3) -> (..., 3)."""
    shape = dirs.shape[:-1]
    dirs_f = dirs.reshape(-1, 3)
    n = dirs_f.shape[0]
    I = jnp.zeros((n, 3), dirs.dtype)
    winding = jnp.zeros((n,), dirs.dtype)
    for st, pr in zip(static.instances, params):
        I, winding = _march_instance_scan(
            st, pr, dirs_f, camera, I, winding, ray_step, min_step,
            max_steps, remat, dither=static.dither,
        )
    I = I * (0.01 / ray_step)
    return I.reshape(*shape, 3)


def post_process_float(linear, exposure, gamma, saturation):
    """buffer2d.cpp:106-126 without the uint8 cast: float RGB in [0, 255].

    The differentiable target space — identical to render.post_process up
    to (and excluding) the final integer truncation.
    """
    v = linear * (1.0 / exposure)
    v = safe_pow(v, gamma)
    center = ((v[..., 0] + v[..., 1]) + v[..., 2]) / 3.0
    tmp = center[..., None] - v
    v = center[..., None] - saturation * tmp
    return qt_clamp(v * 10.0, 0.0, 255.0)


def render_frame_diff(static: SceneStatic, size: int, max_steps: int,
                      params, camera, inv_vp, ray_step, min_step,
                      exposure, gamma, saturation):
    """One differentiable frame: rays -> scan march -> float post.

    Returns (float image in [0,255], linear radiance); differentiable in
    every traced argument (params, camera, inv_vp, post knobs).
    """
    dirs = cam_ops.ray_grid(size, inv_vp)
    linear = render_rays_diff(
        static, params, dirs, camera, ray_step, min_step, max_steps
    )
    return post_process_float(linear, exposure, gamma, saturation), linear


render_frame_diff_jit = functools.partial(
    jax.jit, static_argnums=(0, 1, 2)
)(render_frame_diff)
