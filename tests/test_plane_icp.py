"""Point-to-plane ICP + PCA normal estimation (capability upgrade — the
reference is point-to-point only, ``src/fgoicp/icp3d.cu:140-172``)."""

import numpy as np
import pytest

import jax.numpy as jnp

from goicp_tpu.core.types import RigidTransform
from goicp_tpu.geo.normals import _smallest_eigvec_3x3, estimate_normals
from goicp_tpu.icp import IcpParams, exact_correspondence, run_icp
from goicp_tpu.icp.solver import grid_correspondence, run_icp_trace


def _rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return (np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K).astype(
        np.float32
    )


def _surface(nx, ny, ox=0.0, oy=0.0):
    """Smooth curved sheet z = f(x,y), sampled on an offset grid."""
    x = np.linspace(-1, 1, nx) + ox
    y = np.linspace(-1, 1, ny) + oy
    X, Y = np.meshgrid(x, y)
    Z = 0.25 * np.sin(1.7 * X) * np.cos(1.3 * Y)
    return np.stack([X.ravel(), Y.ravel(), Z.ravel()], 1).astype(np.float32)


def test_smallest_eigvec_matches_numpy():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    C = np.einsum("bij,bkj->bik", A, A)  # SPD batch
    v = np.asarray(_smallest_eigvec_3x3(jnp.asarray(C)))
    w, V = np.linalg.eigh(C)
    ref = V[:, :, 0]  # eigh: ascending eigenvalues
    dots = np.abs(np.sum(v * ref, axis=-1))
    assert np.all(dots > 1 - 1e-3), dots.min()
    assert np.allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)


def test_normals_on_plane_and_sphere():
    rng = np.random.default_rng(1)
    # tilted plane: n = (1,2,3)/|.|
    n_true = np.array([1.0, 2.0, 3.0]) / np.sqrt(14.0)
    basis = np.linalg.svd(n_true[None])[2][1:]  # two in-plane directions
    uv = rng.normal(size=(400, 2)).astype(np.float32)
    plane_pts = (uv @ basis).astype(np.float32)
    n_est = np.asarray(estimate_normals(plane_pts, k=12))
    assert np.all(np.abs(n_est @ n_true) > 0.999)

    # unit sphere: normal == +-radial direction
    p = rng.normal(size=(2000, 3))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    n_est = np.asarray(estimate_normals(p.astype(np.float32), k=10))
    dots = np.abs(np.sum(n_est * p, axis=1))
    assert np.mean(dots > 0.95) > 0.98


def test_normals_degenerate_inputs():
    # all points identical: covariance 0 — must return finite unit vectors
    pts = np.zeros((8, 3), np.float32)
    n = np.asarray(estimate_normals(pts, k=4))
    assert np.isfinite(n).all()
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
    # collinear points: two zero eigenvalues (any orthogonal vector valid)
    t = np.linspace(0, 1, 16, dtype=np.float32)
    line = np.stack([t, 2 * t, -t], 1)
    n = np.asarray(estimate_normals(line, k=6))
    assert np.isfinite(n).all()
    dirs = line[-1] - line[0]
    assert np.all(np.abs(n @ (dirs / np.linalg.norm(dirs))) < 1e-2)


def test_plane_icp_recovers_pose_where_point_stalls():
    """Differently-sampled sheets of one surface: plane ICP reaches a far
    tighter pose than point-to-point from the same init (the classic
    Chen-Medioni advantage on smooth geometry)."""
    src = _surface(40, 40)
    tgt = _surface(47, 47, ox=0.013, oy=-0.009)  # distinct sampling
    R_true = _rot([0.2, 1.0, 0.1], np.deg2rad(12.0))
    t_true = np.array([0.08, -0.05, 0.06], np.float32)
    tgt = (tgt @ R_true.T + t_true).astype(np.float32)
    nrm = estimate_normals(tgt, k=12)

    init = RigidTransform.identity()
    point = run_icp(
        src, exact_correspondence(tgt), init,
        IcpParams(max_iter=60, rel_tol=1e-6),
    )
    plane = run_icp(
        src, exact_correspondence(tgt, normals=nrm), init,
        IcpParams(max_iter=60, rel_tol=1e-6, metric="plane"),
    )

    def rot_err(R):
        return np.linalg.norm(np.asarray(R) - R_true)

    assert rot_err(plane.transform.R) < 2e-2
    assert np.allclose(np.asarray(plane.transform.t), t_true, atol=2e-2)
    # plane metric must beat point-to-point substantially on this geometry
    assert rot_err(plane.transform.R) < 0.5 * rot_err(point.transform.R)
    # reported SSE stays the point-to-point metric: consistent with a direct
    # rescoring pass
    rescore = run_icp(
        src, exact_correspondence(tgt), plane.transform,
        IcpParams(max_iter=0),
    )
    assert np.isclose(float(plane.sse), float(rescore.sse), rtol=1e-3)


def test_plane_icp_batched_trimmed_and_grid():
    rng = np.random.default_rng(3)
    tgt = _surface(30, 30)
    nrm = estimate_normals(tgt, k=10)
    keep = rng.choice(tgt.shape[0], 500, replace=False)
    R_true = _rot([0, 0, 1], np.deg2rad(8.0))
    src = ((tgt[keep] - np.array([0.02, 0.0, 0.01], np.float32)) @ R_true).astype(
        np.float32
    )

    B = 3
    init = RigidTransform(
        np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)),
        np.zeros((B, 3), np.float32),
    )
    res = run_icp(
        src, exact_correspondence(tgt, normals=nrm), init,
        IcpParams(max_iter=50, rel_tol=1e-6, metric="plane",
                  trim_fraction=0.2),
    )
    assert res.transform.R.shape == (B, 3, 3)
    assert np.isfinite(np.asarray(res.sse)).all()
    # src = (q - d) @ R_true  =>  q = src @ R_true.T + d: solver R == R_true
    for b in range(B):
        assert np.allclose(np.asarray(res.transform.R[b]), R_true, atol=3e-2)

    # grid-backed correspondences carry normals too
    from goicp_tpu.nn.grid import build_distance_grid

    grid = build_distance_grid(
        tgt, n=48, cover=np.array([[1.6] * 3, [-1.6] * 3]), method="edt",
        with_index=True,
    )
    res_g = run_icp(
        src, grid_correspondence(grid, tgt, normals=nrm),
        RigidTransform.identity(),
        IcpParams(max_iter=50, rel_tol=1e-6, metric="plane"),
    )
    assert np.allclose(np.asarray(res_g.transform.R), R_true, atol=5e-2)


def test_plane_icp_trace_and_guards():
    tgt = _surface(20, 20)
    nrm = estimate_normals(tgt, k=8)
    src = (tgt + np.array([0.03, -0.02, 0.01], np.float32)).astype(np.float32)

    res, trace = run_icp_trace(
        src, exact_correspondence(tgt, normals=nrm),
        RigidTransform.identity(),
        IcpParams(max_iter=20, rel_tol=1e-6, metric="plane"),
    )
    assert np.allclose(np.asarray(res.transform.t), [-0.03, 0.02, -0.01],
                       atol=5e-3)
    assert int(res.iters) >= 1
    assert trace[0].shape == (20, 3, 3)

    # plane metric without normals in the closure is a hard error
    with pytest.raises(ValueError, match="normals"):
        run_icp(
            src, exact_correspondence(tgt), RigidTransform.identity(),
            IcpParams(max_iter=5, metric="plane"),
        )
    with pytest.raises(ValueError, match="metric"):
        run_icp(
            src, exact_correspondence(tgt), RigidTransform.identity(),
            IcpParams(max_iter=5, metric="tangent"),
        )

    # metric="point" with a normals-bearing closure ignores the normals
    res_pt = run_icp(
        src, exact_correspondence(tgt, normals=nrm),
        RigidTransform.identity(), IcpParams(max_iter=30, rel_tol=1e-6),
    )
    assert np.allclose(np.asarray(res_pt.transform.t), [-0.03, 0.02, -0.01],
                       atol=5e-3)

    # the traced runner carries the same guards as run_icp
    with pytest.raises(ValueError, match="normals"):
        run_icp_trace(
            src, exact_correspondence(tgt), RigidTransform.identity(),
            IcpParams(max_iter=5, metric="plane"),
        )
    with pytest.raises(ValueError, match="metric"):
        run_icp_trace(
            src, exact_correspondence(tgt), RigidTransform.identity(),
            IcpParams(max_iter=5, metric="plan"),
        )


def test_serve_plane_validation_and_normals_reuse():
    """Bad icp_metric strings fail fast at the param boundary (no poisoned
    refine cache); goicp-mode solves reuse the service's resident normals."""
    from goicp_tpu.bnb import BnbParams
    from goicp_tpu.serve import RegistrationService

    tgt = _surface(24, 24)
    svc = RegistrationService(
        tgt,
        BnbParams(mse_threshold=1e-4, grid_resolution=24, max_rounds=60,
                  icp_metric="plane", init_multistart=4),
        name="sheet2",
    )
    src = _surface(20, 20, ox=0.01).astype(np.float32)
    with pytest.raises(ValueError, match="icp_metric"):
        svc.refine(src, None, icp_metric="Plane")
    assert not svc._icp_cache  # the bad string never reached the cache

    # plane-default register(): normals computed once, then reused
    r1 = svc.register(src)
    assert 16 in svc._nrm_dev
    marker = svc._nrm_dev[16]
    r2 = svc.register(src)
    assert svc._nrm_dev[16] is marker  # same resident array, not recomputed
    assert r1.converged and r2.converged


def test_goicp_solver_plane_multistart():
    """icp_metric='plane' drives the multistart/polish ICP inside both BnB
    engines; incumbents stay point-SSE-scored so the certificate holds."""
    from goicp_tpu.bnb import BnbParams, make_solver

    rng = np.random.default_rng(5)
    tgt = _surface(18, 18)
    idx = rng.choice(tgt.shape[0], 200, replace=False)
    R_true = _rot([0.3, 0.2, 1.0], np.deg2rad(40.0))
    t_true = np.array([0.1, -0.06, 0.08], np.float32)
    src = ((tgt[idx] - t_true) @ R_true).astype(np.float32)

    for engine in ("se3", "nested"):
        res = make_solver(
            src, tgt,
            BnbParams(
                mse_threshold=1e-4, grid_resolution=24, max_rounds=200,
                engine=engine, icp_metric="plane", init_multistart=8,
                init_coarse_n=64,
            ),
        ).run()
        assert res.converged, engine
        assert np.allclose(np.asarray(res.transform.R), R_true, atol=3e-2), engine
        assert np.allclose(np.asarray(res.transform.t), t_true, atol=3e-2), engine


def test_cli_icp_plane_metric(tmp_path):
    """[tpu] icp_metric = "plane" drives modes 0-2 through the plane
    objective end-to-end (config → normals → traced plane refiner)."""
    from goicp_tpu.cli import run_scenario
    from goicp_tpu.io.ply import write_ply
    from goicp_tpu.io.txt import write_txt

    src = _surface(30, 30)
    tgt = _surface(36, 36, ox=0.011, oy=-0.008)
    R_true = _rot([0.1, 0.9, 0.2], np.deg2rad(9.0))
    t_true = np.array([0.06, -0.04, 0.05], np.float32)
    tgt = (tgt @ R_true.T + t_true).astype(np.float32)
    write_txt(tmp_path / "source.txt", src)
    write_ply(tmp_path / "target.ply", tgt)
    cfg = tmp_path / "plane.toml"
    cfg.write_text(
        """
[io]
target = "target.ply"
source = "source.txt"

[params]
mode = 1
mse_threshold = 1e-4

[tpu]
icp_metric = "plane"
normals_k = 12
"""
    )
    out = run_scenario(str(cfg), output_dir=str(tmp_path / "out"))
    R = np.asarray(out["R"], np.float32).reshape(3, 3)
    assert np.linalg.norm(R - R_true) < 3e-2
    assert np.allclose(np.asarray(out["t"]), t_true, atol=2e-2)


def test_serve_refine_plane_override():
    """The serving tracking path honors the icp_metric wire override and
    caches normals/refiner per metric."""
    from goicp_tpu.bnb import BnbParams
    from goicp_tpu.serve import RegistrationService

    tgt = _surface(30, 30)
    svc = RegistrationService(
        tgt,
        BnbParams(mse_threshold=1e-4, grid_resolution=24, max_rounds=50),
        name="sheet",
    )
    R_true = _rot([0.0, 0.3, 1.0], np.deg2rad(6.0))
    t_true = np.array([0.03, -0.02, 0.04], np.float32)
    src = ((_surface(26, 26, ox=0.01) - t_true) @ R_true).astype(np.float32)
    prior = RigidTransform(
        _rot([0, 0, 1], np.deg2rad(2.0)) @ R_true, t_true + 0.01
    )
    res_pt = svc.refine(src, prior)
    res_pl = svc.refine(src, prior, icp_metric="plane")
    assert np.allclose(np.asarray(res_pl.transform.R), R_true, atol=2e-2)
    # plane tracking must end at least as close as point tracking
    err_pl = np.linalg.norm(np.asarray(res_pl.transform.R) - R_true)
    err_pt = np.linalg.norm(np.asarray(res_pt.transform.R) - R_true)
    assert err_pl <= err_pt + 1e-3
    assert 16 in svc._nrm_dev  # normals computed once, resident
    # batched tracking with the same override
    batch = svc.refine_batch([src, src], inits=[prior, prior],
                             icp_metric="plane")
    assert np.allclose(
        np.asarray(batch[0].transform.R), np.asarray(res_pl.transform.R),
        atol=1e-4,
    )
