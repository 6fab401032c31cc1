"""Rotation-space parametrizations and uncertainty radii, batched.

Two parametrizations, matching the reference's two solvers:

- **quaternion cube** (FastGoICP): a point ``v = (x,y,z)`` in the unit ball
  maps to the unit quaternion ``q = (w, x, y, z)`` with ``w = sqrt(1-|v|^2)``
  (``src/common.h:40-60``); search cubes live in ``[-1,1]^3``.
- **axis-angle cube** (jly Go-ICP): ``v`` in the pi-ball is an axis-angle
  vector, mapped by Rodrigues' formula (``src/goicp/jly_goicp.cpp:449-467``);
  search cubes live in ``[-pi,pi]^3``.

Uncertainty: for a cube with half side ``span`` centered at ``v0``, any
rotation in the cube moves a point ``p`` at most
``2*sin(min(max_angle,pi)/2)*|p|`` away from ``R(v0)p`` — the per-point
rotation uncertainty radius of Yang et al.  The axis-angle version uses
``max_angle = sqrt(3)*span`` exactly like ``jly_goicp.cpp:148-160``.  For the
quaternion cube the reference's formula is a known quirk (uses the *squared*
point norm and an unclamped heuristic angle, ``registration.cu:39-43``, with
an in-code TODO); here the bound is derived correctly from the 4D chordal
distance between unit quaternions (see :func:`quat_cube_max_angle`).

Everything is batched: centers ``[B,3]``, spans ``[B]``, outputs ``[B,...]``.
"""

from __future__ import annotations

import jax.numpy as jnp

_SQRT3 = 1.7320508075688772


def quat_to_matrix(q):
    """Unit quaternion(s) ``[..., 4]`` (w,x,y,z) → rotation matrix ``[...,3,3]``."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    R = jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], -1),
            jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], -1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], -1),
        ],
        axis=-2,
    )
    return R


def quat_cube_rotation(center):
    """Quaternion-ball point(s) ``[...,3]`` → rotation matrix ``[...,3,3]``.

    ``w = sqrt(max(0, 1-|v|^2))`` (``src/common.h:46-48``); points outside the
    ball (not rotations) yield the matrix at the radially clamped point —
    callers must gate on :func:`quat_cube_in_SO3` as the reference gates on
    ``Rotation::in_SO3`` (``common.h:71``).
    """
    r2 = jnp.sum(center * center, axis=-1, keepdims=True)
    scale = jnp.where(r2 > 1.0, 1.0 / jnp.sqrt(jnp.maximum(r2, 1e-30)), 1.0)
    v = center * scale
    w = jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.sum(v * v, axis=-1, keepdims=True)))
    q = jnp.concatenate([w, v], axis=-1)
    return quat_to_matrix(q)


def quat_cube_in_SO3(center):
    """``|v| <= 1`` (``src/common.h:71``)."""
    return jnp.sum(center * center, axis=-1) <= 1.0


def quat_cube_overlaps_SO3(center, span):
    """Does the cube intersect the unit ball?

    Exact test: squared distance from the origin to the cube is
    ``sum_i max(|v_i|-span, 0)^2 <= 1``.  (The reference's test at
    ``src/common.h:102-106`` omits the inner clamp, which admits slightly
    more cubes; both are safe, this one prunes more.)
    """
    d = jnp.maximum(jnp.abs(center) - span[..., None], 0.0)
    return jnp.sum(d * d, axis=-1) <= 1.0


def quat_cube_max_angle(center, span):
    """Max rotation angle between R(center) and R(v) over the cube, ``[B]``.

    Derivation: for ``v`` in the cube, the 4D quaternion chordal distance is
    ``d^2 = |v-v0|^2 + (w(v)-w(v0))^2 <= 3*span^2 + dw^2`` where the spread of
    ``w = sqrt(1-r^2)`` over the cube follows from the extreme radii
    ``r_min = |max(|v0|-span, 0)|`` and ``r_max = min(|v0|+span*1, 1)``.
    For unit quaternions, ``<q1,q2> = 1 - d^2/2`` and the rotation angle is
    ``theta = 2*arccos(<q1,q2>)`` for ``<q1,q2> >= 0``.  Because ``d^2`` here
    is an UPPER bound on the true chordal distance, the double-cover
    shortcut ``|<q1,q2>|`` must NOT be applied: a bound ``d^2 >= 2`` only
    tells us the angle may be as large as π, so the cosine is clamped at 0
    (θ = π) instead of wrapping around to small angles — the |
    ⟨⟩ | form silently returned θ→0 for the ROOT cube (span 1), erasing all
    rotation uncertainty from the lower bounds.  Replaces the reference's
    heuristic ``2*|p|^2*sin(span*sqrt(3)*pi/2)`` (``registration.cu:39-43``).
    """
    s = span[..., None]
    a = jnp.abs(center)
    r_min = jnp.sqrt(jnp.sum(jnp.maximum(a - s, 0.0) ** 2, axis=-1))
    r_max = jnp.sqrt(jnp.sum((a + s) ** 2, axis=-1))
    w_of = lambda r: jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.minimum(r, 1.0) ** 2))
    r0 = jnp.sqrt(jnp.sum(center * center, axis=-1))
    w0 = w_of(r0)
    dw = jnp.maximum(w_of(r_min) - w0, w0 - w_of(r_max))
    d2 = 3.0 * span**2 + dw**2
    cos_half = jnp.clip(1.0 - d2 / 2.0, 0.0, 1.0)
    return 2.0 * jnp.arccos(cos_half)


def axis_angle_rotation(center):
    """Axis-angle vector(s) ``[...,3]`` → rotation matrix (Rodrigues).

    Matches ``jly_goicp.cpp:449-467`` (identity when ``|v| = 0``), written
    with the singularity-free quaternion route: ``q = (cos(t/2),
    sin(t/2)*v/t)`` with a series-safe ``sin(t/2)/t`` near zero.
    """
    t2 = jnp.sum(center * center, axis=-1, keepdims=True)
    t = jnp.sqrt(jnp.maximum(t2, 1e-30))
    half = 0.5 * t
    # sin(t/2)/t, stable near 0: 1/2 - t^2/48 + ...
    sinc_half = jnp.where(t < 1e-4, 0.5 - t2 / 48.0, jnp.sin(half) / t)
    q = jnp.concatenate([jnp.cos(half), center * sinc_half], axis=-1)
    return quat_to_matrix(q)


def axis_angle_in_ball(center, span):
    """Cube-center test against the pi-ball: keep the cube if
    ``|v0| - sqrt(3)*span <= pi`` (``jly_goicp.cpp:443-446``)."""
    r = jnp.sqrt(jnp.sum(center * center, axis=-1))
    return r - _SQRT3 * span <= jnp.pi


def axis_angle_max_angle(span):
    """``min(sqrt(3)*span, pi)`` — ``jly_goicp.cpp:153-157`` with
    ``sigma = span`` (half side)."""
    return jnp.minimum(_SQRT3 * span, jnp.pi)


def rotation_displacement(max_angle, norms):
    """Per-point rotation uncertainty radius ``[B,N]``.

    ``2*sin(min(theta,pi)/2)*|p|`` (``jly_goicp.cpp:159``); ``max_angle`` is
    ``[B]``, ``norms`` is ``[N]``.
    """
    half = jnp.minimum(max_angle, jnp.pi) / 2.0
    return (2.0 * jnp.sin(half))[..., None] * norms[None, :]
