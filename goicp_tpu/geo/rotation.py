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


def axis_angle_cube_max_angle(centers, spans, *, k_outer: int = 40,
                              k_side: int = 12):
    """Center-aware upper bound on the angle between ``exp(c)`` and ``exp(v)``
    over the axis-angle cube ``c ± s`` — strictly tighter than jly's chordal
    ``√3·σ`` table (``jly_goicp.cpp:153-159``) away from the origin.

    Derivation.  The exact relative angle is ``θ = 2·arccos|⟨q_c, q_v⟩|``
    with ``q_v = (cos(‖v‖/2), sin(‖v‖/2)·v̂)``; the dot depends on ``v`` only
    through the radial coordinate ``u = v·ĉ`` and the tangential distance
    ``p = ‖v − u·ĉ‖``, so the whole cube maps into a region ON the great
    2-sphere spanned by ``(1,0), (0,ĉ), (0,ê)``:

        ⟨q_c,q_v⟩ = cos(a/2)cos(b/2) + sin(a/2)sin(b/2)·u/b,  b = √(u²+p²)

    The exponential map contracts tangentially by ``2·sin(a/2)/a`` (→ 2/π at
    the π-shell), which the chordal bound ignores.  The cube's (u,p) image is
    contained in F' = { |u−a| ≤ s‖ĉ‖₁,  p ≤ min(√(3s²−(u−a)²), p_box) } with
    ``p_box`` the box's exact max tangential extent (corner enumeration).
    For ``u > 0`` the (u,p) ↦ (colatitude b/2, longitude) chart is a diffeo
    onto its image, and θ (twice the S² distance to {±q_c}) has no interior
    maxima below π — so ``max_F' θ`` is attained on ∂F', sampled here at
    ``k_outer`` points of the outer curve and ``k_side`` per vertical side,
    plus the exact Lipschitz slack (the map is ½-Lipschitz: θ moves at most
    the plane covering radius).  A θ=π equator crossing always reaches the
    sampled boundary (f cannot vanish on the p=0 edge for |u−a| < π).

    Falls back to ``min(√3·s, π)`` when the region touches the origin or the
    colatitude could wrap (both bounds are valid everywhere; the min is
    taken regardless).  Inputs ``centers [M,3]``, ``spans [M]`` → ``[M]``.
    """
    c = jnp.asarray(centers, jnp.float32)
    s = jnp.asarray(spans, jnp.float32)
    yang = jnp.minimum(_SQRT3 * s, jnp.pi)

    a = jnp.sqrt(jnp.sum(c * c, axis=-1))                  # [M]
    safe_a = jnp.maximum(a, 1e-12)
    l1 = jnp.sum(jnp.abs(c), axis=-1)
    h1s = s * l1 / safe_a                                  # radial half-extent
    # exact max tangential extent of the box: corners extremize ‖δ_perp‖² =
    # 3s² − (δ·ĉ)², so take the sign pattern minimizing |±c₁±c₂±c₃|
    c1, c2, c3 = jnp.abs(c[..., 0]), jnp.abs(c[..., 1]), jnp.abs(c[..., 2])
    m = jnp.minimum(
        jnp.minimum(jnp.abs(c1 + c2 + c3), jnp.abs(c1 + c2 - c3)),
        jnp.minimum(jnp.abs(c1 - c2 + c3), jnp.abs(c1 - c2 - c3)),
    ) / safe_a
    p_box = s * jnp.sqrt(jnp.maximum(3.0 - m * m, 0.0))

    # boundary samples in the (u_off = u−a, p) half-plane
    frac = jnp.linspace(-1.0, 1.0, k_outer)
    uo_o = h1s[:, None] * frac[None, :]                    # [M,Ko] outer curve
    po_o = jnp.minimum(
        jnp.sqrt(jnp.maximum(3.0 * (s * s)[:, None] - uo_o * uo_o, 0.0)),
        p_box[:, None],
    )
    fs = jnp.linspace(0.0, 1.0, k_side)
    p_end = jnp.minimum(
        jnp.sqrt(jnp.maximum(3.0 * s * s - h1s * h1s, 0.0)), p_box
    )
    uo_s = jnp.concatenate(
        [jnp.broadcast_to(-h1s[:, None], (h1s.shape[0], k_side)),
         jnp.broadcast_to(h1s[:, None], (h1s.shape[0], k_side))], axis=1
    )
    po_s = jnp.concatenate([p_end[:, None] * fs[None, :]] * 2, axis=1)
    uo = jnp.concatenate([uo_o, uo_s], axis=1)             # [M,K]
    po = jnp.concatenate([po_o, po_s], axis=1)

    u = a[:, None] + uo
    b = jnp.sqrt(jnp.maximum(u * u + po * po, 1e-30))
    t = u / b
    ha = (a / 2.0)[:, None]
    f = jnp.cos(ha) * jnp.cos(b / 2.0) + jnp.sin(ha) * jnp.sin(b / 2.0) * t
    theta = 2.0 * jnp.arccos(jnp.clip(jnp.abs(f), 0.0, 1.0))

    # Lipschitz slack: covering radius of the samples along each piece, ×1
    # (plane→θ amplification is 2 × the ½-Lipschitz chart = 1)
    d_out = jnp.sqrt(
        jnp.diff(uo_o, axis=1) ** 2 + jnp.diff(po_o, axis=1) ** 2
    )
    gap = jnp.maximum(jnp.max(d_out, axis=1), p_end / (k_side - 1))
    tight = jnp.max(theta, axis=1) + 0.5 * gap

    # region must exclude the origin (chart fold) and the colatitude must
    # not wrap past the antipode
    ok = (a - h1s > 1e-6) & (a + _SQRT3 * s < 2.0 * jnp.pi - 1e-3)
    return jnp.where(ok, jnp.minimum(tight, yang), yang)


def rotation_displacement(max_angle, norms):
    """Per-point rotation uncertainty radius ``[B,N]``.

    ``2*sin(min(theta,pi)/2)*|p|`` (``jly_goicp.cpp:159``); ``max_angle`` is
    ``[B]``, ``norms`` is ``[N]``.
    """
    half = jnp.minimum(max_angle, jnp.pi) / 2.0
    return (2.0 * jnp.sin(half))[..., None] * norms[None, :]


def random_rotations(n: int, rng) -> "np.ndarray":
    """``[n,3,3]`` Haar-ish uniform random rotations (sign-fixed QR with a
    det(+1) flip) — the shared host-numpy sampler for multistart seeds and
    synthetic queries (previously re-implemented at every call site)."""
    import numpy as np

    A = rng.normal(size=(n, 3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.einsum("bii->bi", R))[:, None, :]
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1.0
    return Q.astype(np.float32)
