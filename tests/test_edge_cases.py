"""Degenerate-input robustness: tiny clouds, duplicates, colinear sources,
extreme trim counts.  The reference crashes or silently misbehaves on several
of these (no input validation anywhere in ``src/``); the framework must
return finite, correct results."""

import numpy as np

from goicp_tpu.bnb import BnbParams, register
from goicp_tpu.icp import IcpParams, exact_correspondence, run_icp
from goicp_tpu.core.types import RigidTransform
from tests.conftest import random_rotation


def _recover(src, tgt, **kw):
    params = BnbParams(mse_threshold=1e-6, se3_pop=32, max_rounds=60, **kw)
    res = register(src, tgt, params)
    pts = src @ np.asarray(res.transform.R).T + np.asarray(res.transform.t)
    return float(np.sqrt(np.mean(np.sum((pts - tgt) ** 2, axis=1)))), res


def test_tiny_cloud_recovers():
    """A 6-point cloud (smaller than every kernel tile) still solves — the
    128-lane padding must stay inert through bounds, trimming and ICP."""
    rng = np.random.default_rng(0)
    src = (rng.random((6, 3)).astype(np.float32) - 0.5) * 0.6
    R = random_rotation(rng)
    t = np.float32([0.1, -0.05, 0.08])
    tgt = (src @ R.T + t).astype(np.float32)
    rmse, res = _recover(src, tgt)
    assert np.isfinite(res.sse)
    assert rmse < 5e-3, (rmse, res.converged)


def test_duplicate_points_are_harmless():
    rng = np.random.default_rng(1)
    base = (rng.random((40, 3)).astype(np.float32) - 0.5) * 0.6
    src = np.concatenate([base, base[:10]]).astype(np.float32)  # 25% dupes
    R = random_rotation(rng)
    t = np.float32([0.05, 0.1, -0.04])
    tgt = (src @ R.T + t).astype(np.float32)
    rmse, res = _recover(src, tgt)
    assert rmse < 5e-3, (rmse, res.converged)


def test_colinear_source_icp_returns_proper_rotation():
    """Colinear points make the Procrustes covariance rank-1; the solver must
    still emit a PROPER rotation (det +1, orthonormal) and finite sse."""
    rng = np.random.default_rng(2)
    line = np.linspace(-0.5, 0.5, 30, dtype=np.float32)
    src = np.stack([line, 0.3 * line, -0.2 * line], axis=1)
    src = src + rng.normal(scale=1e-4, size=src.shape).astype(np.float32)
    tgt = (src + np.float32([0.1, 0.0, -0.05])).astype(np.float32)
    res = run_icp(
        src,
        exact_correspondence(tgt),
        RigidTransform(np.eye(3, dtype=np.float32)[None],
                       np.zeros((1, 3), np.float32)),
        IcpParams(max_iter=30),
    )
    Rm = np.asarray(res.transform.R)[0]
    assert np.allclose(Rm @ Rm.T, np.eye(3), atol=1e-4)
    assert np.linalg.det(Rm) > 0.5
    assert np.isfinite(float(np.asarray(res.sse)[0]))


def test_extreme_trim_keeps_one_inlier():
    """trim_fraction close to 1 must floor at h >= 1 and stay finite."""
    rng = np.random.default_rng(3)
    src = (rng.random((50, 3)).astype(np.float32) - 0.5) * 0.6
    tgt = (src + np.float32([0.02, -0.01, 0.03])).astype(np.float32)
    params = BnbParams(
        mse_threshold=1e-6, trim_fraction=0.95, se3_pop=16, max_rounds=20
    )
    res = register(src, tgt, params)
    assert np.isfinite(res.sse)
    assert np.isfinite(res.mse)
