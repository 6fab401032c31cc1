"""ICP solver tests: recover known rigid transforms (SURVEY §4 implication —
property tests the reference never had)."""

import numpy as np
import jax.numpy as jnp
import pytest

from goicp_tpu.core.types import RigidTransform
from goicp_tpu.icp import (
    IcpParams,
    exact_correspondence,
    grid_correspondence,
    run_icp,
    trim_weights,
)
from goicp_tpu.nn.grid import build_distance_grid
from tests.conftest import random_rotation


def _cloud(rng, n=400):
    return rng.normal(size=(n, 3)).astype(np.float32) * 0.3


def _small_pose(rng, angle=0.25, tmag=0.1):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    v = (axis * angle).astype(np.float32)
    from goicp_tpu.geo.rotation import axis_angle_rotation

    R = np.asarray(axis_angle_rotation(jnp.asarray(v)))
    t = rng.normal(size=3).astype(np.float32) * tmag
    return R, t


def test_icp_recovers_small_perturbation(rng):
    src = _cloud(rng)
    R, t = _small_pose(rng)
    dst = src @ R.T + t  # target = R src + t
    res = run_icp(
        src,
        exact_correspondence(dst),
        RigidTransform.identity(),
        IcpParams(max_iter=100, rel_tol=1e-6),
    )
    R_est, t_est = np.asarray(res.transform.R), np.asarray(res.transform.t)
    assert np.allclose(R_est, R, atol=1e-3)
    assert np.allclose(t_est, t, atol=1e-3)
    assert float(res.sse) < 1e-6


def test_icp_batched_poses(rng):
    src = _cloud(rng)
    R, t = _small_pose(rng)
    dst = src @ R.T + t
    B = 5
    inits = RigidTransform.identity((B,))
    res = run_icp(
        src,
        exact_correspondence(dst),
        inits,
        IcpParams(max_iter=100, rel_tol=1e-6),
    )
    assert res.transform.R.shape == (B, 3, 3)
    assert np.all(np.asarray(res.sse) < 1e-5)


def test_icp_grid_correspondence(rng):
    src = _cloud(rng, 300)
    R, t = _small_pose(rng, angle=0.1, tmag=0.05)
    dst = src @ R.T + t
    grid = build_distance_grid(dst, n=64, with_index=True)
    res = run_icp(
        src,
        grid_correspondence(grid, dst),
        RigidTransform.identity(),
        IcpParams(max_iter=100, rel_tol=1e-6),
    )
    # grid correspondences are approximate; still should align well
    pts = np.asarray(res.transform.apply(jnp.asarray(src)))
    err = np.mean(np.sum((pts - dst) ** 2, axis=-1))
    assert err < 1e-4


def test_icp_trimming_ignores_outliers(rng):
    src = _cloud(rng, 500)
    R, t = _small_pose(rng, angle=0.1, tmag=0.05)
    dst = (src @ R.T + t).astype(np.float32)
    # corrupt the SOURCE with 10% far outliers; trimmed ICP should align the
    # clean 90% while untrimmed ICP is dragged off by the outlier residuals
    n_out = 50
    src_noisy = np.concatenate(
        [src, rng.normal(size=(n_out, 3)).astype(np.float32) * 0.5 + 4.0]
    ).astype(np.float32)

    def align_err(res):
        pts = np.asarray(res.transform.apply(jnp.asarray(src)))
        return float(np.mean(np.sum((pts - dst) ** 2, axis=-1)))

    trimmed = run_icp(
        src_noisy,
        exact_correspondence(dst),
        RigidTransform.identity(),
        IcpParams(max_iter=100, rel_tol=1e-6, trim_fraction=0.15),
    )
    plain = run_icp(
        src_noisy,
        exact_correspondence(dst),
        RigidTransform.identity(),
        IcpParams(max_iter=100, rel_tol=1e-6),
    )
    assert align_err(trimmed) < 1e-4
    assert align_err(trimmed) < align_err(plain)


def test_trim_weights_keeps_k_smallest():
    d2 = jnp.asarray([[5.0, 1.0, 3.0, 2.0, 4.0]])
    w = np.asarray(trim_weights(d2, trim_fraction=0.4))
    assert w.sum() == 3
    assert list(np.nonzero(w[0])[0]) == [1, 2, 3]


def test_icp_converges_faster_than_max_iter(rng):
    src = _cloud(rng)
    res = run_icp(
        src,
        exact_correspondence(src),  # already aligned
        RigidTransform.identity(),
        IcpParams(max_iter=64, rel_tol=1e-4),
    )
    assert int(res.iters) < 64


def test_icp_trace_max_iter_zero_scores_only(rng):
    """run_icp_trace(max_iter=0) mirrors run_icp's pure-scoring contract:
    no refinement step, iters=0 (review: it used to run one live step)."""
    import jax.numpy as jnp

    from goicp_tpu.core.types import RigidTransform
    from goicp_tpu.icp import IcpParams, exact_correspondence, run_icp
    from goicp_tpu.icp.solver import run_icp_trace

    src = (rng.random((40, 3)).astype(np.float32) - 0.5)
    tgt = (src + 0.05).astype(np.float32)
    corr = exact_correspondence(jnp.asarray(tgt))
    p0 = IcpParams(max_iter=0)
    res_t, trace = run_icp_trace(src, corr, RigidTransform.identity(), p0)
    res = run_icp(src, corr, RigidTransform.identity(), p0)
    assert int(res_t.iters) == 0 == int(res.iters)
    assert np.isclose(float(res_t.sse), float(res.sse))
    assert np.allclose(np.asarray(res_t.transform.R), np.eye(3))
    assert not bool(np.asarray(trace[3]).any())
