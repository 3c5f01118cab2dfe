"""The XLA render path: vectorized emission-absorption ray march.

Pure-function reimplementation of the reference render pipeline
(rasterizer.cpp:379-483 renderPixel/getIntensity, galaxycomponent.cpp:45-88
gating, galaxycomponents.cpp:5-170 kernels, buffer2d.cpp:106-126 post),
restructured for XLA: every pixel marches in lockstep inside one
lax.while_loop whose body is fully vectorized over rays, with per-ray
masks reproducing the data-dependent control flow. Component dispatch is
unrolled at trace time from the static scene structure (scene_prep).

This is the reference implementation the Pallas kernel is gated against;
it is also the path that vmaps over cameras (fly-throughs) and galaxy
parameters (dataset generation) and shards over device meshes (parallel/).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import camera as cam_ops
from ..ops import noise as jnoise
from ..ops.math3d import (
    dot3,
    floor0,
    intersect_ellipsoid,
    norm3,
    qt_clamp,
    qt_smoothstep,
    quat_from_axis_angle_rad,
    quat_rotate,
)
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
from .scene_prep import CompStatic, InstanceStatic, SceneStatic, flatten_scene

PI = 3.141592653589793


def _get_winding(rad, winding_b, winding_n):
    """galaxycomponent.h:156-165."""
    r = rad + 0.05
    return jnp.arctan(jnp.exp(-0.25 / (0.5 * r)) / winding_b) * 2.0 * winding_n


def _find_difference(t1, t2):
    """galaxycomponent.h:103-118 — min |t1-t2| over 0, +-2pi, +-4pi shifts."""
    d = t1 - t2
    v = jnp.abs(d)
    v = jnp.minimum(v, jnp.abs(d - 2 * PI))
    v = jnp.minimum(v, jnp.abs(d + 2 * PI))
    v = jnp.minimum(v, jnp.abs(d - 4 * PI))
    v = jnp.minimum(v, jnp.abs(d + 4 * PI))
    return v


def _twirl(p, t, orientation):
    """Rotate p about the instance orientation by t*180deg
    (galaxycomponent.h:86-90; fromAxisAndAngle degrees -> t*pi radians)."""
    q = quat_from_axis_angle_rad(orientation, t * PI)
    return quat_rotate(q, p)


def _perlin_cloud(p, t, octaves, ks, pers, orientation, raw_fn=None):
    """galaxycomponent.h:93-98 — octave noise of the twirled point at
    frequency ks*0.1."""
    r = _twirl(p, t, orientation)
    return jnoise.octave_noise_3d(
        octaves, pers, ks * 0.1, r[..., 0], r[..., 1], r[..., 2], raw_fn=raw_fn
    )


def _arm_value(st: InstanceStatic, pr, cp, radius, P, pow_fn=jnp.power):
    """galaxycomponent.h:120-146 — max over the arm equality-ladder count,
    with std::max NaN ordering (a NaN candidate never wins)."""
    rot = quat_rotate(pr["rotmat"], P)
    theta = jnp.arctan2(rot[..., 0], rot[..., 2]) + cp["delta"]
    ww = _get_winding(radius, pr["winding_b"], pr["winding_n"])
    val = None
    for a in range(st.max_arms):
        v = jnp.abs(_find_difference(ww, -theta + pr["arms"][a])) / PI
        arm_v = pow_fn(1.0 - v, cp["arm"] * 15.0)
        val = arm_v if val is None else jnp.where(arm_v > val, arm_v, val)
    return val


def _is_absorber(cs: CompStatic) -> bool:
    """dust / dust2 multiply the accumulator; every other class adds."""
    return cs.cid in (CID_DUST, CID_DUST2)


def _sample_gates(cs: CompStatic, pr, cp, p, active, winding):
    """Shared per-sample geometry + gating pipeline, up to and including
    the winding carry (rasterizer.cpp:460-462, galaxycomponent.cpp:45-88).

    Runs for every non-bulge component (the reference's calculateIntensity
    executes it before the class dispatch). Returns
    (gates, z, radius, intensity, P, winding') — P is the in-plane
    projection, winding' the updated carry. Factored out so the
    frozen-noise precompute (engine/tensor_march) replays the exact same
    expressions the march uses — any drift between the two would
    desynchronize the frozen noise from the live gates.
    """
    orientation = pr["orientation"]
    dott = dot3(p, orientation)
    P = p - orientation * dott[..., None]
    radius = norm3(P) / pr["axis"][0]
    h = jnp.abs(dott / cp["z0"])
    # sech evaluated on min(h, 3): bit-identical for every lane the h > 2
    # cutoff keeps, while capping exp(h) so overflowing discarded lanes
    # (inf -> 0*inf = NaN) cannot poison reverse-mode gradients.
    hs = jnp.minimum(h, 3.0)
    sech = 1.0 / ((jnp.exp(hs) + jnp.exp(-hs)) / 2.0)
    z = jnp.where(h > 2.0, 0.0, sech * sech)

    # Gating pipeline (galaxycomponent.cpp:45-88).
    ri = jnp.exp(-radius / (cp["r0"] * 0.5))
    intensity = qt_clamp(ri - 0.01, 0.0, 1.0)
    intensity = jnp.where(intensity > 0.1, 0.1, intensity)
    gates = active & (z > 0.01) & (intensity > 0.001)

    if cs.arm_enabled and cs.winding_enabled:
        new_wind = _get_winding(radius, pr["winding_b"], pr["winding_n"]) * cp["winding"]
    else:
        new_wind = jnp.zeros_like(radius)
    winding = jnp.where(gates, new_wind, winding)
    return gates, z, radius, intensity, P, winding


def _component_noise(cs: CompStatic, pr, cp, p, winding):
    """The component's raw fractal-noise field(s) at sample positions ``p``
    with the (already updated) winding carry — the expensive part of
    _component_sample, factored so the frozen-noise fit path
    (engine/tensor_march) can precompute it once. Returns a tuple
    (possibly empty) whose layout each _component_sample branch consumes
    positionally. Everything *after* these raw fields (abs/pow/offset
    shaping) stays in _component_sample so it remains differentiable."""
    twirl_axis = pr["twirl_axis"]
    # The raw-noise backend is compile-time static (RenderConfig.noise_kind);
    # "simplex" resolves to the reference-exact path.
    raw = None if cs.noise_kind == "simplex" else jnoise.resolve_raw(cs.noise_kind)
    if cs.cid == CID_DISK:
        return (_perlin_cloud(p, winding, cs.oct(10), cp["scale"], cp["ks"],
                              twirl_axis, raw_fn=raw),)
    if cs.cid == CID_DUST:
        return (_perlin_cloud(p, winding, cs.oct(9), cp["scale"], cp["ks"],
                              twirl_axis, raw_fn=raw),)
    if cs.cid in (CID_DUST2, CID_DUST_POSITIVE):
        r = _twirl(p, winding, twirl_axis) * cp["scale"]
        return (jnoise.ridged_mf(
            r[..., 0], r[..., 1], r[..., 2],
            cp["ks"], cs.oct(9), 2.5, cp["noise_offset"], cp["noise_tilt"],
            raw_fn=raw,
        ),)
    if cs.cid == CID_STARS:
        freq = (0.01 * cp["scale"]) * 100.0
        base = jnoise.octave_noise_3d(
            cs.oct(10), cp["ks"], freq, p[..., 0], p[..., 1], p[..., 2],
            raw_fn=raw)
        if cs.star_extra:
            c1 = _perlin_cloud(p, winding, cs.oct(4), 2.0, -2.0, twirl_axis,
                               raw_fn=raw)
            c2 = _perlin_cloud(p, winding * 0.5, cs.oct(4), 4.0, -2.0,
                               twirl_axis, raw_fn=raw)
            return (base, c1, c2)
        return (base,)
    return ()


def _component_sample(
    cs: CompStatic,
    st: InstanceStatic,
    pr,
    cp,
    p,
    active,
    weight,
    ray_step,
    winding,
    pow_fn=jnp.power,
    noise=None,
):
    """Pure per-sample effect of one component: the component's action on
    the accumulator is ``I -> I * exp(att_exp) + emit``.

    Returns (emit_rgb, att_exp_rgb, winding): absorbers (dust/dust2) have
    emit == 0, emitters att_exp == 0; masked lanes return exact zeros, so
    composing with + / * reproduces the reference's where-masked updates
    bit-for-bit (IEEE: x + 0 == x and x * exp(0) == x for the non-negative
    accumulator this pipeline maintains). This factorization is what the
    tensorized differentiable march (engine/tensor_march.py) builds on;
    _apply_component composes it back into the sequential form.

    Mirrors GalaxyComponent::calculateIntensity (galaxycomponent.cpp:45-88)
    + the componentIntensity kernels (galaxycomponents.cpp).

    ``pow_fn`` is ``jnp.power`` on the conformance path; the differentiable
    paths pass a gradient-safe pow whose primal is identical but whose
    cotangents are zeroed where the true derivative is non-finite.

    ``noise`` optionally supplies this component's raw fractal field(s)
    (the _component_noise tuple, evaluated at the same positions/winding) —
    the frozen-noise fit path precomputes them once and passes them back
    under stop_gradient. None computes them inline (identical expressions,
    bit-identical conformance path).
    """
    iscale = pr["intensity_scale"]
    zero3 = jnp.zeros(p.shape[:-1] + (3,), p.dtype)

    if cs.cid == CID_BULGE:
        # Bulge bypasses all gating (galaxycomponents.cpp:5-39).
        pos = quat_rotate(pr["rotmat"], p)
        rad = (norm3(pos) + 0.01) * cp["r0"] + 0.01
        ival = (cp["strength"] * weight) * (
            jnp.power(rad, -0.855) * jnp.exp(-jnp.power(rad, 0.25)) - 0.05
        ) * iscale
        ival = jnp.where(ival < 0, 0.0, ival)
        add = cp["spec"] * (ival * ray_step)[..., None]
        return jnp.where(active[..., None], add, 0.0), zero3, winding

    # Shared geometry + gates + winding carry (galaxycomponent.cpp:45-88).
    gates, z, radius, intensity, P, winding = _sample_gates(
        cs, pr, cp, p, active, winding)
    if noise is None:
        noise = _component_noise(cs, pr, cp, p, winding)

    scale_inner = jnp.power(qt_smoothstep(0.0, 1.0 * cp["inner"], radius), 4.0)
    if cs.arm_enabled:
        arm_val = _arm_value(st, pr, cp, radius, P, pow_fn)
    else:
        arm_val = jnp.ones_like(radius)

    val = cp["strength"] * scale_inner * arm_val * z * intensity * iscale
    emit = gates & (val * weight > 0.0005)
    ival = val * weight
    spec = cp["spec"]

    if cs.cid == CID_DISK:
        p2 = jnp.abs(noise[0])
        p2 = jnp.maximum(p2, 0.01)
        p2 = pow_fn(p2, cp["noise_tilt"])
        p2 = p2 + cp["noise_offset"]
        add = spec * (ival * p2 * ray_step)[..., None]
        return jnp.where((emit & (p2 >= 0))[..., None], add, 0.0), zero3, winding
    if cs.cid == CID_DUST:
        p2 = noise[0]
        p2 = jnp.maximum(p2 - cp["noise_offset"], 0.0)
        p2 = qt_clamp(pow_fn(5.0 * p2, cp["noise_tilt"]), -10.0, 10.0)
        e = -p2[..., None] * ival[..., None] * spec * 0.01
        return zero3, jnp.where(emit[..., None], e, 0.0), winding
    if cs.cid in (CID_DUST2, CID_DUST_POSITIVE):
        p2 = jnp.maximum(noise[0], 0.0)
        if cs.cid == CID_DUST2:
            e = -p2[..., None] * ival[..., None] * spec * 0.01
            return zero3, jnp.where(emit[..., None], e, 0.0), winding
        add = spec * (ival * p2 * ray_step)[..., None]
        return jnp.where(emit[..., None], add, 0.0), zero3, winding
    if cs.cid == CID_STARS:
        perlin = jnp.abs(noise[0])
        add_n = 0.0
        if cs.star_extra:
            add_n = cp["noise_offset"] * noise[1]
            add_n = add_n + 0.5 * cp["noise_offset"] * noise[2]
        v = jnp.abs(pow_fn(perlin + 1.0 + add_n, cp["noise_tilt"]))
        add = spec * (ival * v * ray_step)[..., None]
        return jnp.where(emit[..., None], add, 0.0), zero3, winding
    if cs.cid == CID_STARS_SMALL:
        # The reference sprinkles with unseeded rand() (galaxycomponents.cpp:
        # 159-170: emit with prob 1/scale, val = (rand()%10)^tilt) — inherently
        # nondeterministic, excluded from conformance (galaxy_repro.py:734).
        # Here: a position-hash draw — same statistics, reproducible.
        sel, dval = _sparkle_hash(p, cp["scale"])
        v = pow_fn(dval, cp["noise_tilt"])
        add = spec * (ival * v * ray_step)[..., None]
        return jnp.where((emit & sel)[..., None], add, 0.0), zero3, winding
    return zero3, zero3, winding  # unknown class: no-op (reference skips)


def _apply_component(
    cs: CompStatic,
    st: InstanceStatic,
    pr,
    cp,
    p,
    active,
    weight,
    I,
    winding,
    ray_step,
    pow_fn=jnp.power,
):
    """One component's contribution applied to the accumulator: the
    sequential composition of _component_sample (see its docstring for the
    exactness argument). Returns the updated (I, winding)."""
    emit, att_e, winding = _component_sample(
        cs, st, pr, cp, p, active, weight, ray_step, winding, pow_fn
    )
    if _is_absorber(cs):
        return I * jnp.exp(att_e), winding
    return I + emit, winding


def hash3_i32(bx, by, bz):
    """The engine's shared 3-component integer hash (sparkle + dither).

    The XLA/Pallas statistical-agreement contract for dithering depends on
    both engines using THIS exact constant-for-constant mix — do not fork
    copies of it.
    """
    h = (bx * jnp.int32(-1640531527)
         ^ by * jnp.int32(97) ^ bz * jnp.int32(1013904223))
    return h ^ (h >> 13)


def _sparkle_hash(p, scale):
    """Deterministic stand-in for the rand() sparkle: hash the sample
    position to (emit?, digit) with P(emit) = 1/scale and digit in [0, 10)."""
    bits = jax.lax.bitcast_convert_type(p, jnp.int32)
    h = hash3_i32(bits[..., 0], bits[..., 1], bits[..., 2])
    hu = jnp.abs(h)
    scale_i = jnp.maximum(scale.astype(jnp.int32), 1)
    sel = (hu % scale_i) == 0
    dval = ((hu >> 8) % 10).astype(p.dtype)
    return sel, dval


def _dither01(dirs):
    """Deterministic per-ray offset in [0, 1): hash of the ray direction
    bits (the sparkle-hash family). Used by RenderConfig.dither to jitter
    each ray's march start within its first step — the shadertoy fork's
    banding treatment (galaxy_shadertoy.glsl:564-589)."""
    # stop_gradient: belt-and-braces — the hash is piecewise-constant
    # (zero derivative a.e.), so when pose fitting sends gradients through
    # dirs the correct contribution is exactly zero; cutting the edge here
    # states that and keeps the backward graph smaller.
    bits = jax.lax.bitcast_convert_type(jax.lax.stop_gradient(dirs), jnp.int32)
    h = hash3_i32(bits[..., 0], bits[..., 1], bits[..., 2])
    return (jnp.abs(h) % 8192).astype(dirs.dtype) * (1.0 / 8192.0)


def _march_instance(st: InstanceStatic, pr, dirs, camera, I, winding, ray_step,
                    min_step, dither: bool = False):
    """March all rays through one galaxy instance, back-to-front
    (rasterizer.cpp:379-483). dirs: (N, 3); I: (N, 3); winding: (N,)."""
    o = camera - pr["position"]  # ray origin, galaxy frame
    hit, isp1, isp2, t0, t1 = intersect_ellipsoid(o, dirs, pr["axis"])
    # Behind-camera rules (rasterizer.cpp:396-403): reversed-lookAt rays
    # point backward, visible geometry has negative t.
    isp2 = jnp.where((t1 > 0)[..., None], o, isp2)
    alive = hit & ~((t0 > 0) & (t1 > 0))

    origin = isp1
    if dither:
        step0 = qt_clamp(norm3(origin - o) * ray_step, min_step, 0.01)
        diff0 = origin - isp2
        len0 = norm3(diff0)
        safe0 = jnp.where(len0 == 0, 1.0, len0)
        # jitter the start point toward the camera by a sub-step fraction
        # (clamped to the chord so grazing rays cannot overshoot isp2 and
        # flip the march direction); the done-condition bookkeeping below
        # uses the jittered origin so the chord length stays consistent.
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

    def cond(s):
        return jnp.any(~s["done"])

    def body(s):
        p = s["p"]
        # Loop condition — checked before the body (rasterizer.cpp:447).
        d_along = dot3(p - origin, ll)
        done = s["done"] | (d_along >= length + s["step_prev"])
        active = ~done

        # Adaptive step (rasterizer.cpp:449).
        dist = norm3(p - o)
        step = qt_clamp(dist * ray_step, min_step, 0.01)
        weight = step * 200.0

        I_s = s["I"]
        w_s = s["winding"]
        for cs, cp in zip(st.comps, pr["comps"]):
            I_s, w_s = _apply_component(
                cs, st, pr, cp, p, active, weight, I_s, w_s, ray_step
            )

        # Advance and floor (rasterizer.cpp:467-470).
        p_new = p - dir_m * step[..., None]
        return dict(
            p=jnp.where(active[..., None], p_new, p),
            I=jnp.where(active[..., None], floor0(I_s), s["I"]),
            winding=jnp.where(active, w_s, s["winding"]),
            step_prev=jnp.where(active, step, s["step_prev"]),
            done=done,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["I"], out["winding"]


def render_rays(static: SceneStatic, params, dirs, camera, ray_step, min_step):
    """Linear radiance for a batch of rays. dirs: (..., 3) -> (..., 3)."""
    shape = dirs.shape[:-1]
    dirs_f = dirs.reshape(-1, 3)
    n = dirs_f.shape[0]
    I = jnp.zeros((n, 3), dirs.dtype)
    winding = jnp.zeros((n,), dirs.dtype)
    for st, pr in zip(static.instances, params):
        I, winding = _march_instance(st, pr, dirs_f, camera, I, winding,
                                     ray_step, min_step,
                                     dither=static.dither)
    # Final scale (rasterizer.cpp:409).
    I = I * (0.01 / ray_step)
    return I.reshape(*shape, 3)


def post_process(linear, exposure, gamma, saturation):
    """buffer2d.cpp:106-126 -> uint8 RGB (shadow-buffer channel order)."""
    v = linear * (1.0 / exposure)
    v = jnp.power(v, gamma)
    center = ((v[..., 0] + v[..., 1]) + v[..., 2]) / 3.0
    tmp = center[..., None] - v
    v = center[..., None] - saturation * tmp
    c = qt_clamp(v * 10.0, 0.0, 255.0)
    return c.astype(jnp.int32).astype(jnp.uint8)


def render_frame(static: SceneStatic, size: int, params, camera, inv_vp,
                 ray_step, min_step, exposure, gamma, saturation):
    """One full frame: rays -> march -> post. Un-jitted; jit wrappers below
    and in parallel/sharding.py add compilation and shardings."""
    dirs = cam_ops.ray_grid(size, inv_vp)  # (size, size, 3), [row j, col i]
    linear = render_rays(static, params, dirs, camera, ray_step, min_step)
    return post_process(linear, exposure, gamma, saturation), linear


_render_jit = functools.partial(jax.jit, static_argnums=(0, 1))(render_frame)


def render_frame_ss(static: SceneStatic, size: int, ss: int, params, camera,
                    inv_vp, ray_step, min_step, exposure, gamma, saturation):
    """Supersampled frame: ss^2 rays per pixel, box-averaged in LINEAR
    space before the nonlinear post chain (RenderConfig.supersample)."""
    dirs = cam_ops.ray_grid(size * ss, inv_vp)
    linear = render_rays(static, params, dirs, camera, ray_step, min_step)
    linear = linear.reshape(size, ss, size, ss, 3).mean(axis=(1, 3))
    return post_process(linear, exposure, gamma, saturation), linear


_render_ss_jit = functools.partial(jax.jit, static_argnums=(0, 1, 2))(render_frame_ss)


def xla_march_unsafe(size: int, backend: str = None) -> bool:
    """True when the lockstep XLA march must not run on the current
    backend: its whole-image gathers inside the while loop crash the TPU
    worker at >=256^2 frames (docs/ARCHITECTURE.md) and poison the whole
    client process. The XLA path is the CPU-testable conformance
    reference; on TPU hardware the production path is the Pallas kernel
    (engine/pallas_render.render_scene_pallas)."""
    if size < 256:
        return False
    if backend is None:
        try:
            backend = jax.default_backend()
        except Exception:  # noqa: BLE001 - no backend -> nothing to protect
            return False
    return backend == "tpu"


def render_scene(scene: Scene, dtype=jnp.float32, return_linear: bool = False,
                 unsafe_large_ok: bool = False):
    """Render a Scene with the XLA path. Returns a (size, size, 3) uint8
    numpy array (and optionally the linear radiance buffer).

    On a TPU backend frames >=256^2 raise instead of rendering (the known
    whole-image-gather crash — see xla_march_unsafe); use
    render_scene_pallas there, or pass ``unsafe_large_ok=True`` to bypass
    the guard deliberately (e.g. against a future runtime)."""
    cfg = scene.config
    if not unsafe_large_ok and xla_march_unsafe(cfg.size):
        raise RuntimeError(
            f"render_scene (the lockstep XLA march) at {cfg.size}^2 on the "
            "TPU backend crashes the TPU runtime (whole-image gathers in "
            "the march while-loop, docs/ARCHITECTURE.md) and poisons the "
            "client process. Use engine.pallas_render.render_scene_pallas "
            "— the production TPU path — or a size < 256 here; pass "
            "unsafe_large_ok=True to bypass this guard deliberately.")
    static, params = flatten_scene(scene, dtype)
    camera = np.asarray(scene.camera.camera, dtype)
    inv_vp = cam_ops.inv_view_projection_host(
        camera, scene.camera.target, scene.camera.up, scene.camera.fov,
        dtype=dtype)
    scalar_args = (
        jnp.asarray(cfg.ray_step, dtype), jnp.asarray(cfg.min_ray_step, dtype),
        jnp.asarray(cfg.exposure, dtype), jnp.asarray(cfg.gamma, dtype),
        jnp.asarray(cfg.saturation, dtype),
    )
    if cfg.supersample > 1:
        img, linear = _render_ss_jit(
            static, cfg.size, cfg.supersample, params, camera, inv_vp,
            *scalar_args)
    else:
        img, linear = _render_jit(
            static, cfg.size, params, camera, inv_vp, *scalar_args)

    if cfg.no_stars > 0:
        # Star-field overlay added to the radiance buffer at assembly time
        # (rasterizer.cpp:320-321), then the post chain re-runs.
        from ..post.stars import render_star_field

        stars = render_star_field(
            cfg.size, cfg.no_stars, cfg.star_size, cfg.star_size_spread,
            cfg.star_strength, cfg.star_seed,
        )
        linear = jnp.asarray(np.asarray(linear) + stars, dtype)
        img = post_process(
            linear, jnp.asarray(cfg.exposure, dtype),
            jnp.asarray(cfg.gamma, dtype), jnp.asarray(cfg.saturation, dtype),
        )

    if return_linear:
        return np.asarray(img), np.asarray(linear)
    return np.asarray(img)
