"""JAX 3-D math primitives with the reference's numeric conventions.

Mirrors the semantics of the C++/Qt math the render path depends on
(documented in gamer_tpu.oracle.qtmath), expressed as dtype-generic jnp ops:

  - clamp/smoothstep with std::min/max NaN ordering (util.cpp:76-120)
  - quaternion rotate / from-axis-angle(deg) / rotationTo
    (galaxycomponent.h:86-90, galaxyinstance.cpp:69-71)
  - ellipsoid intersection (util.h:66-98)

Everything here is traceable (jit/vmap/pallas-safe except where noted).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def qt_clamp(val, lo, hi):
    """max(lo, min(hi, val)) with std::min/max ordering: clamp(NaN) == hi."""
    r = jnp.where(val < hi, val, hi)
    return jnp.where(lo < r, r, lo)


def qt_smoothstep(edge0, edge1, x):
    """Util::smoothstep; 0/0 -> NaN -> clamp -> 1 (matches the oracle).

    Gradient-safe at edge1 == edge0: the zero-width-edge division is kept
    for the primal (its inf/NaN-then-clamp semantics are the oracle's) but
    wrapped in stop_gradient, with the well-defined branch dividing by a
    guarded denominator — otherwise inner == 0 components poison every
    gradient that flows through radius (engine/diff.py pose/shape fitting).
    """
    d = edge1 - edge0
    nz = d != 0
    t_safe = qt_clamp((x - edge0) / jnp.where(nz, d, 1.0), 0.0, 1.0)
    t_exact = qt_clamp((x - edge0) / d, 0.0, 1.0)
    t = jnp.where(nz, t_safe, jax.lax.stop_gradient(t_exact))
    return t * t * (3.0 - 2.0 * t)


def floor0(v):
    """RasterPixel::Floor — negatives and NaN to 0 (rasterpixel.cpp:34-38)."""
    return jnp.where(v >= 0, v, 0.0)


def dot3(a, b):
    """Dot product over the trailing axis of size 3."""
    return (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]) + a[..., 2] * b[..., 2]


def norm3(v):
    """Euclidean norm over the trailing axis of size 3.

    Gradient-safe at v == 0: sqrt is evaluated on a strictly positive
    stand-in for zero-norm lanes and the true 0 reselected afterwards, so
    the primal is bit-identical to sqrt(dot(v, v)) everywhere while
    reverse-mode sees a finite (zeroed) derivative instead of
    sqrt'(0) = inf — which would otherwise poison whole-gradient sums in
    the differentiable path (engine/diff.py) for on-axis samples and
    zero-chord rays, despite those lanes being masked in the forward math.
    """
    n2 = dot3(v, v)
    nz = n2 > 0
    n = jnp.sqrt(jnp.where(nz, n2, 1.0))
    return jnp.where(nz, n, 0.0)


def normalize3(v, eps=0.0):
    n = norm3(v)
    safe = jnp.where(n == 0, 1.0, n)
    return v / safe[..., None]


def quat_mul(q1, q2):
    """Hamilton product; components (w, x, y, z) on the trailing axis."""
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    w2, x2, y2, z2 = (q2[..., i] for i in range(4))
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by quaternion(s) q (..., 4).

    Expanded sandwich product q * (0,v) * conj(q) — matches Qt's
    rotatedVector up to f32 association (tolerance path).
    """
    w = q[..., 0]
    u = q[..., 1:]
    uv = jnp.stack(
        [
            u[..., 1] * v[..., 2] - u[..., 2] * v[..., 1],
            u[..., 2] * v[..., 0] - u[..., 0] * v[..., 2],
            u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0],
        ],
        axis=-1,
    )
    uuv = jnp.stack(
        [
            u[..., 1] * uv[..., 2] - u[..., 2] * uv[..., 1],
            u[..., 2] * uv[..., 0] - u[..., 0] * uv[..., 2],
            u[..., 0] * uv[..., 1] - u[..., 1] * uv[..., 0],
        ],
        axis=-1,
    )
    return v + 2.0 * (w[..., None] * uv + uuv)


def quat_from_axis_angle_rad(axis, angle_rad):
    """Quaternion for rotation about a UNIT axis by angle (radians).

    The reference builds this with QQuaternion::fromAxisAndAngle(axis,
    twirl*180 degrees) (galaxycomponent.h:86-90); axis is the instance
    orientation, normalized at scene-prep time here.
    """
    half = angle_rad * 0.5
    s = jnp.sin(half)
    c = jnp.cos(half)
    return jnp.stack(
        [
            c,
            jnp.broadcast_to(axis[..., 0], half.shape) * s,
            jnp.broadcast_to(axis[..., 1], half.shape) * s,
            jnp.broadcast_to(axis[..., 2], half.shape) * s,
        ],
        axis=-1,
    )


def quat_rotation_to_y(orientation):
    """Shortest-arc quaternion from (0,1,0) to `orientation` (unit).

    QQuaternion::rotationTo specialization used by GalaxyInstance
    (galaxyinstance.cpp:69-71). Traceable (for vmap'd random orientations);
    the antiparallel case orientation == (0,-1,0) resolves to Qt's fallback:
    axis = normalize(cross((1,0,0), (0,1,0))) = (0,0,1), a 180-degree turn.
    Host-side scene prep uses oracle.qtmath.quat_rotation_to instead (exact
    Qt float32 semantics).
    """
    v1 = normalize3(orientation)
    d = v1[..., 1] + 1.0  # dot((0,1,0), v1) + 1
    near_pi = jnp.abs(d) <= 1e-5
    dd = jnp.sqrt(2.0 * jnp.where(near_pi, 1.0, d))
    # cross((0,1,0), v1) = (z, 0, -x)
    axis = jnp.stack([v1[..., 2], jnp.zeros_like(d), -v1[..., 0]], axis=-1) / dd[..., None]
    q = jnp.concatenate([(dd * 0.5)[..., None], axis], axis=-1)
    qn = q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    flip = jnp.zeros_like(qn).at[..., 3].set(1.0)  # (w,x,y,z) = (0,0,0,1)
    return jnp.where(near_pi[..., None], flip, qn)


def intersect_ellipsoid(origin, direction, axis):
    """Unit sphere scaled by `axis` — Util::IntersectSphere (util.h:66-98).

    origin: (..., 3) ray origins (galaxy frame), direction: (..., 3),
    axis: (3,). Returns (hit, isp1, isp2, t0, t1): the far/near intersection
    points isp = origin + direction * t.
    """
    inv = 1.0 / (axis * axis)
    rd = direction * inv
    ro = origin * inv
    A = dot3(direction, rd)
    B = 2.0 * dot3(direction, ro)
    C = dot3(origin, ro) - 1.0
    S = B * B - 4.0 * A * C
    hit = S > 0.0
    # sqrt on a positive stand-in for miss rays: same primal after the
    # reselect (sqrt(1) is discarded, 0 substituted as before), but the
    # derivative stays finite so masked miss lanes cannot emit inf*0 = NaN
    # cotangents in the differentiable path.
    sq = jnp.where(hit, jnp.sqrt(jnp.where(hit, S, 1.0)), 0.0)
    t0 = (-B - sq) / (2.0 * A)
    t1 = (-B + sq) / (2.0 * A)
    isp1 = origin + direction * t0[..., None]
    isp2 = origin + direction * t1[..., None]
    return hit, isp1, isp2, t0, t1
