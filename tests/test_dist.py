"""Sharded path vs single-device oracle on the virtual 8-device CPU mesh
(SURVEY §4: multi-host tests via xla_force_host_platform_device_count)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from goicp_tpu.bnb.bounds import BoundsEvaluator
from goicp_tpu.dist import (
    make_mesh,
    sharded_bounds_step,
    sharded_icp_step,
    sharded_sse,
)
from goicp_tpu.nn.grid import build_distance_grid
from tests.conftest import random_rotation


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    src = (rng.random((256, 3)).astype(np.float32) - 0.5) * 0.6
    tgt = (rng.random((200, 3)).astype(np.float32) - 0.5) * 0.6
    grid = build_distance_grid(
        tgt, n=64, cover=np.array([[1.5] * 3, [-1.5] * 3]), method="brute",
        with_index=True,
    )
    return src, tgt, grid


def _jobs(rng, M):
    from goicp_tpu.geo.rotation import quat_cube_max_angle, quat_cube_rotation

    q_c = (rng.random((M, 3)).astype(np.float32) - 0.5)
    q_s = rng.random(M).astype(np.float32) * 0.2 + 0.02
    R = np.asarray(quat_cube_rotation(jnp.asarray(q_c)))
    ang = np.asarray(quat_cube_max_angle(jnp.asarray(q_c), jnp.asarray(q_s)))
    t_c = (rng.random((M, 3)).astype(np.float32) - 0.5) * 0.3
    t_s = rng.random(M).astype(np.float32) * 0.1
    flag = (rng.random(M) > 0.5).astype(np.float32)
    return R, ang, t_c, t_s, flag


@pytest.mark.parametrize("mesh_shape", [(1, 8), (8, 1), (4, 2)])
def test_sharded_bounds_match_single_device(setup, rng, mesh_shape):
    src, tgt, grid = setup
    ev = BoundsEvaluator(src, grid, lookup="trilinear", conservative=True)
    M = 16
    R, ang, t_c, t_s, flag = _jobs(rng, M)
    mask = np.ones(M, bool)
    ref_cv, ref_lb = ev.evaluate(R, ang, t_c, t_s, flag, mask)

    mesh = make_mesh(*mesh_shape)
    step = sharded_bounds_step(
        mesh, grid, trim_drop=0, lookup="trilinear", slack=ev.slack
    )
    cv, lb = step(
        jnp.asarray(src), jnp.asarray(ev.norms),
        jnp.asarray(R), jnp.asarray(ang), jnp.asarray(t_c), jnp.asarray(t_s),
        jnp.asarray(flag), jnp.asarray(mask),
    )
    assert np.allclose(np.asarray(cv), ref_cv, rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(lb), ref_lb, rtol=1e-4, atol=1e-5)


def test_sharded_trimmed_bounds_match(setup, rng):
    src, tgt, grid = setup
    tf = 0.125
    ev = BoundsEvaluator(src, grid, trim_fraction=tf, conservative=True)
    drop = src.shape[0] - ev.h
    assert drop > 0
    M = 8
    R, ang, t_c, t_s, flag = _jobs(rng, M)
    mask = np.ones(M, bool)
    ref_cv, ref_lb = ev.evaluate(R, ang, t_c, t_s, flag, mask)

    mesh = make_mesh(2, 4)
    step = sharded_bounds_step(mesh, grid, trim_drop=drop, slack=ev.slack)
    cv, lb = step(
        jnp.asarray(src), jnp.asarray(ev.norms),
        jnp.asarray(R), jnp.asarray(ang), jnp.asarray(t_c), jnp.asarray(t_s),
        jnp.asarray(flag), jnp.asarray(mask),
    )
    assert np.allclose(np.asarray(cv), ref_cv, rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(lb), ref_lb, rtol=1e-4, atol=1e-5)


def test_sharded_icp_step_improves_batch(setup, rng):
    src, tgt, grid = setup
    # target = transformed src so ICP has a true optimum
    R_true = random_rotation(rng)
    t_true = np.array([0.05, -0.03, 0.08], np.float32)
    tgt2 = (src @ R_true.T + t_true).astype(np.float32)
    grid2 = build_distance_grid(
        tgt2, n=64, cover=np.array([[1.5] * 3, [-1.5] * 3]), method="brute",
        with_index=True,
    )
    mesh = make_mesh(2, 4)
    step = sharded_icp_step(mesh, grid2, tgt2)
    B = 8
    # small perturbations of the true pose
    Rs = np.tile(R_true[None], (B, 1, 1)).astype(np.float32)
    ts = (t_true[None] + (rng.random((B, 3)).astype(np.float32) - 0.5) * 0.02)
    R0, t0, sse0 = step(jnp.asarray(src), jnp.asarray(Rs), jnp.asarray(ts))
    R1, t1, sse1 = step(jnp.asarray(src), R0, t0)
    assert np.all(np.asarray(sse1) <= np.asarray(sse0) + 1e-7)
    # a few more iterations: converges to the true pose
    R, t = R1, t1
    for _ in range(10):
        R, t, sse = step(jnp.asarray(src), R, t)
    assert np.allclose(np.asarray(R)[0], R_true, atol=1e-3)
    assert np.allclose(np.asarray(t)[0], t_true, atol=1e-3)
