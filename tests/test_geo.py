import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

import jax.numpy as jnp

from goicp_tpu.core.types import RigidTransform
from goicp_tpu.geo import (
    axis_angle_in_ball,
    axis_angle_max_angle,
    axis_angle_rotation,
    horn_quaternion,
    procrustes,
    quat_cube_in_SO3,
    quat_cube_max_angle,
    quat_cube_overlaps_SO3,
    quat_cube_rotation,
    rotation_displacement,
)
from tests.conftest import random_rotation


def test_quat_cube_rotation_matches_scipy(rng):
    v = rng.uniform(-0.57, 0.57, size=(32, 3)).astype(np.float32)
    R = np.asarray(quat_cube_rotation(v))
    w = np.sqrt(1 - np.sum(v**2, axis=1))
    # scipy uses (x, y, z, w) ordering
    R_ref = ScipyRot.from_quat(np.concatenate([v, w[:, None]], axis=1)).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_quat_cube_rotation_is_rotation(rng):
    v = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    R = np.asarray(quat_cube_rotation(v))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_axis_angle_matches_scipy(rng):
    v = rng.uniform(-np.pi, np.pi, size=(32, 3)).astype(np.float32)
    R = np.asarray(axis_angle_rotation(v))
    R_ref = ScipyRot.from_rotvec(v).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)
    # identity at zero (jly_goicp.cpp:468-472)
    R0 = np.asarray(axis_angle_rotation(np.zeros((1, 3), np.float32)))
    np.testing.assert_allclose(R0[0], np.eye(3), atol=1e-6)


def test_so3_membership_tests():
    c = np.array([[0.0, 0, 0], [0.9, 0.9, 0.9], [0.5, 0.5, 0.5]], np.float32)
    assert list(np.asarray(quat_cube_in_SO3(c))) == [True, False, True]
    s = np.array([0.25, 0.25, 0.25], np.float32)
    ov = np.asarray(quat_cube_overlaps_SO3(c, s))
    assert ov[0] and ov[2]
    assert not bool(
        np.asarray(quat_cube_overlaps_SO3(np.array([[1.5, 1.5, 1.5]], np.float32),
                                          np.array([0.1], np.float32)))[0]
    )


def test_quat_cube_max_angle_is_sound(rng):
    """For random cubes and random points inside, the actual rotation angle
    between center and sample must not exceed the bound."""
    for _ in range(50):
        c = rng.uniform(-0.5, 0.5, size=3)
        span = rng.uniform(0.01, 0.3)
        if np.linalg.norm(c) > 1:
            continue
        bound = float(
            np.asarray(
                quat_cube_max_angle(
                    jnp.asarray(c[None], jnp.float32),
                    jnp.asarray([span], jnp.float32),
                )
            )[0]
        )
        Rc = np.asarray(quat_cube_rotation(jnp.asarray(c[None], jnp.float32)))[0]
        for _ in range(20):
            v = c + rng.uniform(-span, span, size=3)
            if np.linalg.norm(v) > 1:
                continue
            Rv = np.asarray(
                quat_cube_rotation(jnp.asarray(v[None], jnp.float32))
            )[0]
            angle = np.arccos(np.clip((np.trace(Rc.T @ Rv) - 1) / 2, -1, 1))
            assert angle <= bound + 1e-4, (angle, bound, c, span, v)


def test_axis_angle_max_angle_is_sound(rng):
    """jly bound: rotation between cube center and any member <= sqrt(3)*span."""
    for _ in range(50):
        c = rng.uniform(-2, 2, size=3)
        span = rng.uniform(0.01, 0.5)
        bound = float(np.asarray(axis_angle_max_angle(jnp.asarray([span])))[0])
        Rc = ScipyRot.from_rotvec(c).as_matrix()
        for _ in range(10):
            v = c + rng.uniform(-span, span, size=3)
            Rv = ScipyRot.from_rotvec(v).as_matrix()
            angle = np.arccos(np.clip((np.trace(Rc.T @ Rv) - 1) / 2, -1, 1))
            assert angle <= bound + 1e-5


def test_axis_angle_cube_max_angle_is_sound_and_tighter():
    """The center-aware cube angle bound (boundary-sampled quaternion-dot,
    geo.rotation.axis_angle_cube_max_angle) must dominate the true relative
    angle for any cube member, never exceed the jly chordal √3·span bound,
    and actually engage (be strictly tighter) off the origin."""
    from goicp_tpu.geo.rotation import axis_angle_cube_max_angle

    rng = np.random.default_rng(99)
    cs, ss = [], []
    for i in range(140):
        # bias centers toward the outer shell, where the tightening matters;
        # include centers OUTSIDE the π-ball (valid() admits cubes out to
        # ‖c‖ ≈ π + √3·s, jly_goicp.cpp:443-446)
        rmax = np.pi + 1.0 if i % 4 == 0 else np.pi
        c = rng.uniform(-1, 1, size=3)
        c *= rng.uniform(0.0, rmax) / max(np.linalg.norm(c), 1e-9)
        cs.append(c)
        ss.append(rng.uniform(0.005, 0.8))
    cs = np.asarray(cs, np.float32)
    ss = np.asarray(ss, np.float32)
    bounds = np.asarray(axis_angle_cube_max_angle(cs, ss))

    tighter = 0
    for c, span, bound in zip(cs, ss, bounds):
        yang = min(np.sqrt(3.0) * span, np.pi)
        assert bound <= yang + 1e-5
        if bound < yang - 1e-3:
            tighter += 1
        Rc = ScipyRot.from_rotvec(c).as_matrix()
        for _ in range(40):
            v = c + rng.uniform(-span, span, size=3)
            Rv = ScipyRot.from_rotvec(v).as_matrix()
            angle = np.arccos(np.clip((np.trace(Rc.T @ Rv) - 1) / 2, -1, 1))
            assert angle <= bound + 1e-4, (angle, bound, c, span)
    assert tighter > 20  # the tightening actually engages off-origin


def test_rotation_displacement_formula():
    angles = jnp.asarray([np.pi / 3, 5.0])  # second gets clamped to pi
    norms = jnp.asarray([1.0, 2.0])
    d = np.asarray(rotation_displacement(angles, norms))
    np.testing.assert_allclose(d[0], [2 * np.sin(np.pi / 6), 4 * np.sin(np.pi / 6)], rtol=1e-6)
    np.testing.assert_allclose(d[1], [2.0, 4.0], rtol=1e-6)  # clamp at pi


def test_axis_angle_in_ball():
    keep = np.asarray(
        axis_angle_in_ball(
            np.array([[3.0, 3.0, 3.0], [0.5, 0, 0]], np.float32),
            np.array([0.1, 0.1], np.float32),
        )
    )
    assert not keep[0] and keep[1]


def test_horn_quaternion_identity():
    C = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    q = np.asarray(horn_quaternion(C))
    np.testing.assert_allclose(q, np.tile([1, 0, 0, 0], (4, 1)), atol=1e-5)


def test_procrustes_recovers_random_rigid(rng):
    """Property test from SURVEY §4: recover known random (R, t)."""
    B, N = 8, 200
    src = rng.normal(size=(B, N, 3)).astype(np.float32)
    R_true = np.stack([random_rotation(rng) for _ in range(B)])
    t_true = rng.normal(size=(B, 3)).astype(np.float32)
    dst = np.einsum("bij,bnj->bni", R_true, src) + t_true[:, None, :]
    R, t = procrustes(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=2e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=2e-4)


def test_procrustes_with_noise_matches_scipy(rng):
    N = 500
    src = rng.normal(size=(N, 3))
    R_true = random_rotation(rng)
    dst = src @ R_true.T + 0.3 + rng.normal(size=(N, 3)) * 0.01
    R, t = procrustes(jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32))
    # scipy oracle
    R_ref, _ = ScipyRot.align_vectors(
        dst - dst.mean(0), src - src.mean(0)
    )
    np.testing.assert_allclose(np.asarray(R), R_ref.as_matrix(), atol=1e-3)


def test_procrustes_weighted_trimming(rng):
    """Outliers with zero weight must not affect the solution."""
    N = 100
    src = rng.normal(size=(N, 3)).astype(np.float32)
    R_true = random_rotation(rng)
    dst = src @ R_true.T
    dst[:10] += 100.0  # corrupt
    w = np.ones(N, np.float32)
    w[:10] = 0.0
    R, t = procrustes(jnp.asarray(src), jnp.asarray(dst), weights=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-4)


def test_rigid_transform_compose_apply(rng):
    Ra, Rb = random_rotation(rng), random_rotation(rng)
    ta, tb = rng.normal(size=3).astype(np.float32), rng.normal(size=3).astype(np.float32)
    A = RigidTransform(jnp.asarray(Ra), jnp.asarray(ta))
    B = RigidTransform(jnp.asarray(Rb), jnp.asarray(tb))
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    out1 = A.apply(B.apply(jnp.asarray(pts)))
    out2 = A.compose(B).apply(jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    # inverse
    back = A.inverse().apply(A.apply(jnp.asarray(pts)))
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)


def test_quat_cube_max_angle_saturates_at_pi():
    """An upper-bound chordal distance >= 2 must yield angle pi, not wrap
    around through the quaternion double cover (which erased all rotation
    uncertainty for large cubes and could prune the global optimum)."""
    import jax.numpy as jnp
    from goicp_tpu.geo.rotation import quat_cube_max_angle, quat_cube_rotation

    c = jnp.zeros((1, 3))
    ang_root = float(quat_cube_max_angle(c, jnp.asarray([1.0]))[0])
    assert ang_root > 3.1  # the root cube contains 180-degree rotations
    # monotone in span
    spans = [0.05, 0.1, 0.3, 0.6, 0.9, 1.0]
    angs = [float(quat_cube_max_angle(c, jnp.asarray([s]))[0]) for s in spans]
    assert all(a2 >= a1 - 1e-6 for a1, a2 in zip(angs, angs[1:]))
    # bound actually covers sampled rotations in the cube
    import numpy as np

    rng = np.random.default_rng(0)
    for s in (0.3, 0.8):
        bound = float(quat_cube_max_angle(c, jnp.asarray([s]))[0])
        R0 = np.asarray(quat_cube_rotation(jnp.zeros(3)))
        for _ in range(50):
            v = (rng.random(3) - 0.5) * 2 * s
            if np.linalg.norm(v) > 1:
                continue
            R = np.asarray(quat_cube_rotation(jnp.asarray(v, jnp.float32)))
            cosang = (np.trace(R0.T @ R) - 1) / 2
            ang = float(np.arccos(np.clip(cosang, -1, 1)))
            assert ang <= bound + 1e-4


def test_quatparam_numpy_matches_jnp(rng):
    """The host-side numpy QuatParam adapters (bnb.solver) must agree with
    the canonical jnp implementations they were ported from."""
    from goicp_tpu.bnb.solver import QuatParam

    c = (rng.random((64, 3)).astype(np.float32) - 0.5) * 2.2  # some outside
    s = rng.random(64).astype(np.float32)
    R_np = QuatParam.rotation(c)
    R_j = np.asarray(quat_cube_rotation(jnp.asarray(c)))
    assert np.allclose(R_np, R_j, atol=1e-6)
    a_np = QuatParam.max_angle(c, s)
    a_j = np.asarray(quat_cube_max_angle(jnp.asarray(c), jnp.asarray(s)))
    assert np.allclose(a_np, a_j, atol=1e-6)
    v_np = QuatParam.valid(c, s)
    v_j = np.asarray(quat_cube_overlaps_SO3(jnp.asarray(c), jnp.asarray(s)))
    assert np.array_equal(v_np, v_j)
