"""Fused MXU min-distance kernel (nn.mxu): correctness vs numpy oracles.

Runs in Pallas interpret mode on the CPU test mesh; the TPU-compiled path is
exercised by the hardware benchmarks (BENCH_r*.json) and shares the exact
same kernel jaxpr.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from goicp_tpu.nn import mxu
from tests.conftest import random_rotation


def _scene(rng, n=220, m=330, b=4):
    src = (rng.random((n, 3)).astype(np.float32) - 0.5) * 0.6
    tgt = (rng.random((m, 3)).astype(np.float32) - 0.5) * 0.6
    R = np.stack([random_rotation(rng) for _ in range(b)])
    t = (rng.random((b, 3)).astype(np.float32) - 0.5) * 0.3
    return src, tgt, R, t


def _oracle_d2(src, tgt, R, t):
    q = np.einsum("bij,nj->bni", R, src) + t[:, None, :]
    d = q[:, :, None, :] - tgt[None, None, :, :]
    return (d * d).sum(-1).min(-1), q


@pytest.mark.parametrize("variant", ["diff", "dot"])
def test_min_d2_nodes_matches_oracle(rng, variant):
    src, tgt, R, t = _scene(rng)
    d2_ref, _ = _oracle_d2(src, tgt, R, t)
    srcT = mxu.pack_sources(src)
    wm = mxu.pack_targets(tgt)
    params = mxu.pack_params(R, t)
    d2 = np.asarray(
        mxu.min_d2_nodes(srcT, wm, params, interpret=True, variant=variant)
    )[:, : src.shape[0]]
    assert np.allclose(d2, d2_ref, atol=2e-6), np.abs(d2 - d2_ref).max()


def test_nearest_neighbor_mxu_matches_brute(rng):
    src, tgt, R, t = _scene(rng, b=2)
    _, q = _oracle_d2(src, tgt, R, t)
    queries = q.reshape(-1, 3).astype(np.float32)
    d2, idx = mxu.nearest_neighbor_mxu(queries, tgt, interpret=True)
    d2, idx = np.asarray(d2), np.asarray(idx)
    d = queries[:, None, :] - tgt[None, :, :]
    d2_all = (d * d).sum(-1)
    assert np.array_equal(idx, d2_all.argmin(-1))
    # values recomputed from coordinate differences: exact
    assert np.allclose(d2, d2_all.min(-1), atol=1e-7)


def test_nearest_neighbor_mxu_batched_shape(rng):
    """Batched queries [B, N, 3] keep their batch shape (run_icp contract)."""
    tgt = (rng.random((150, 3)).astype(np.float32) - 0.5)
    q = (rng.random((3, 70, 3)).astype(np.float32) - 0.5)
    d2, idx = mxu.nearest_neighbor_mxu(q, tgt, interpret=True)
    assert d2.shape == (3, 70) and idx.shape == (3, 70)
    from goicp_tpu.nn.brute import nearest_neighbor

    d2_ref, idx_ref = nearest_neighbor(jnp.asarray(q), jnp.asarray(tgt))
    assert np.allclose(np.asarray(d2), np.asarray(d2_ref), atol=1e-7)


def test_evaluate_se3_nodes_mxu_matches_exact_backend(rng):
    """The fused-kernel bound evaluation agrees with the XLA exact backend
    (same (ub, lb) semantics, different compute path)."""
    import jax

    from goicp_tpu.bnb.se3 import evaluate_se3_nodes, evaluate_se3_nodes_mxu

    src, tgt, R, t = _scene(rng, n=150, m=200, b=8)
    norms = jnp.linalg.norm(jnp.asarray(src), axis=-1)
    max_angle = rng.random(8).astype(np.float32)
    t_span = (rng.random(8).astype(np.float32)) * 0.1
    mask = np.ones(8, bool)
    mask[-1] = False

    from goicp_tpu.nn.grid import build_distance_grid

    grid = build_distance_grid(tgt, n=8, method="brute")
    args = (
        jnp.asarray(src), norms, jnp.asarray(tgt), jnp.float32(0.0),
        jnp.asarray(R), jnp.asarray(max_angle), jnp.asarray(t),
        jnp.asarray(t_span), jnp.asarray(mask),
    )
    for h in (0, 120):
        ub_x, lb_x = evaluate_se3_nodes(
            args[0], args[1], grid, *args[2:], h=h, lookup="nearest",
            backend="exact", tile=128, tgt_tile=256,
        )
        ub_m, lb_m = evaluate_se3_nodes_mxu(*args, h=h)
        assert np.allclose(
            np.asarray(ub_m)[mask], np.asarray(ub_x)[mask], rtol=1e-4
        )
        assert np.allclose(
            np.asarray(lb_m)[mask], np.asarray(lb_x)[mask],
            rtol=1e-4, atol=1e-5,
        )
        assert np.isinf(np.asarray(ub_m)[~mask]).all()


def test_solver_runs_with_mxu_backend(rng):
    """End-to-end tiny solve on the interpret-mode kernel."""
    from goicp_tpu.bnb import BnbParams, register

    src = (rng.random((60, 3)).astype(np.float32) - 0.5) * 0.6
    R = random_rotation(rng)
    t = np.array([0.08, -0.05, 0.1], np.float32)
    tgt = (src @ R.T + t).astype(np.float32)
    res = register(
        src, tgt,
        BnbParams(
            mse_threshold=1e-5, bound_backend="mxu", se3_pop=8,
            max_rounds=60, init_multistart=4, refine_top_k=2,
        ),
    )
    pts = src @ np.asarray(res.transform.R).T + np.asarray(res.transform.t)
    rmse = float(np.sqrt(np.mean(np.sum((pts - tgt) ** 2, axis=1))))
    assert rmse < 5e-3, rmse


def _oracle_bounds(src, tgt, R, t, af, gt, slack=0.0):
    """Yang eq. 10 bounds from the exact oracle distances."""
    d2, _ = _oracle_d2(src, tgt, R, t)
    d = np.sqrt(d2)
    norms = np.linalg.norm(src, axis=1)
    ub = ((d + slack) ** 2).sum(-1)
    lb = (
        np.maximum(np.maximum(d - slack, 0.0) - (af[:, None] * norms + gt[:, None]), 0.0)
        ** 2
    ).sum(-1)
    return ub, lb


def test_bounds_nodes_unscreened_matches_oracle(rng):
    src, tgt, R, t = _scene(rng, b=6)
    af = rng.random(6).astype(np.float32) * 0.3
    gt = rng.random(6).astype(np.float32) * 0.1
    ub_ref, lb_ref = _oracle_bounds(src, tgt, R, t, af, gt)
    srcT = mxu.pack_sources_ext(src, np.linalg.norm(src, axis=1))
    wm = mxu.pack_targets(tgt)
    params = mxu.pack_params_bounds(R, t, af, gt, 0.0, 1e30)
    ub, lb = map(np.asarray, mxu.bounds_nodes(srcT, wm, params, interpret=True))
    assert np.allclose(ub, ub_ref, rtol=1e-5, atol=1e-5), np.abs(ub - ub_ref).max()
    assert np.allclose(lb, lb_ref, rtol=1e-5, atol=1e-5), np.abs(lb - lb_ref).max()


def test_bounds_nodes_screening_is_valid(rng):
    """With a finite threshold, screened nodes report a PARTIAL lb that is
    still a valid lower bound (≤ full lb) and ≥ the threshold; their ub is
    an inf sentinel.  Unscreened nodes match the full evaluation."""
    src, tgt, R, t = _scene(rng, n=512, b=8)
    t = t + np.float32([2.0, 0, 0])      # push far: large lb, screen fires
    t[0] = 0.0                           # ...except node 0 (small lb)
    af = np.full(8, 0.05, np.float32)
    gt = np.full(8, 0.02, np.float32)
    ub_ref, lb_ref = _oracle_bounds(src, tgt, R, t, af, gt)
    thresh = float(np.sort(lb_ref)[1] * 0.5)   # screens the far nodes only
    srcT = mxu.pack_sources_ext(src, np.linalg.norm(src, axis=1))
    wm = mxu.pack_targets(tgt)
    params = mxu.pack_params_bounds(R, t, af, gt, 0.0, thresh)
    ub, lb = map(np.asarray, mxu.bounds_nodes(srcT, wm, params, interpret=True))
    for b in range(8):
        if ub[b] >= 1e29:        # screened
            assert lb[b] >= thresh - 1e-4
            assert lb[b] <= lb_ref[b] + 1e-3
        else:
            assert np.isclose(ub[b], ub_ref[b], rtol=1e-5, atol=1e-5)
            assert np.isclose(lb[b], lb_ref[b], rtol=1e-5, atol=1e-5)
    assert ub[0] < 1e29          # the near node was fully evaluated


def _oracle_bounds_trimmed(src, tgt, R, t, af, gt, h, slack=0.0):
    """Trimmed Yang bounds: sums of the h smallest per-point contributions."""
    d2, _ = _oracle_d2(src, tgt, R, t)
    d = np.sqrt(d2)
    norms = np.linalg.norm(src, axis=1)
    ub_c = np.sort((d + slack) ** 2, axis=-1)[:, :h].sum(-1)
    lb_all = (
        np.maximum(np.maximum(d - slack, 0.0) - (af[:, None] * norms + gt[:, None]), 0.0)
        ** 2
    )
    lb_c = np.sort(lb_all, axis=-1)[:, :h].sum(-1)
    return ub_c, lb_c


def test_bounds_nodes_trimmed_unscreened_matches_oracle(rng):
    src, tgt, R, t = _scene(rng, b=6)
    h = int(src.shape[0] * 0.85)
    drop = src.shape[0] - h
    af = rng.random(6).astype(np.float32) * 0.3
    gt = rng.random(6).astype(np.float32) * 0.1
    ub_ref, lb_ref = _oracle_bounds_trimmed(src, tgt, R, t, af, gt, h)
    srcT = mxu.pack_sources_ext(src, np.linalg.norm(src, axis=1))
    wm = mxu.pack_targets(tgt)
    params = mxu.pack_params_bounds_trimmed(R, t, af, gt, 0.0, 1e30, 1e30)
    ub, lb = map(
        np.asarray,
        mxu.bounds_nodes_trimmed(srcT, wm, params, h=h, drop=drop,
                                 interpret=True),
    )
    # bisection sums bracket the exact trimmed sums from the right sides
    assert (ub >= ub_ref - 1e-4).all(), (ub - ub_ref).min()
    assert (lb <= lb_ref + 1e-4).all(), (lb - lb_ref).max()
    assert np.allclose(ub, ub_ref, rtol=1e-3, atol=1e-3)
    assert np.allclose(lb, lb_ref, rtol=1e-3, atol=1e-3)


def test_bounds_nodes_trimmed_screening_is_valid(rng):
    """Screened trimmed nodes report the clamped-sum bound: ≥ thresh (so the
    engine prunes them) AND ≤ the exact trimmed lb (so pruning is sound)."""
    src, tgt, R, t = _scene(rng, n=512, b=8)
    t = t + np.float32([2.0, 0, 0])
    t[0] = 0.0
    h = int(src.shape[0] * 0.9)
    drop = src.shape[0] - h
    af = np.full(8, 0.05, np.float32)
    gt = np.full(8, 0.02, np.float32)
    ub_ref, lb_ref = _oracle_bounds_trimmed(src, tgt, R, t, af, gt, h)
    thresh = float(np.sort(lb_ref)[1] * 0.5)
    tau = 2.0 * thresh / h
    srcT = mxu.pack_sources_ext(src, np.linalg.norm(src, axis=1))
    wm = mxu.pack_targets(tgt)
    params = mxu.pack_params_bounds_trimmed(
        R, t, af, gt, 0.0, thresh + drop * tau, tau
    )
    ub, lb = map(
        np.asarray,
        mxu.bounds_nodes_trimmed(srcT, wm, params, h=h, drop=drop,
                                 interpret=True),
    )
    screened = 0
    for b in range(8):
        if ub[b] >= 1e29:        # screened
            screened += 1
            assert lb[b] >= thresh - 1e-4
            assert lb[b] <= lb_ref[b] + 1e-3
        else:
            assert np.isclose(ub[b], ub_ref[b], rtol=1e-3, atol=1e-3)
            assert np.isclose(lb[b], lb_ref[b], rtol=1e-3, atol=1e-3)
    assert screened >= 6         # the far nodes actually screen
    assert ub[0] < 1e29          # the near node was fully evaluated


def test_trimmed_screened_solve_matches_unscreened(rng):
    """End-to-end: a trimmed solve with the screened kernel converges to the
    same pose as the unscreened mxu path."""
    from goicp_tpu.bnb import BnbParams, register

    src = (rng.random((200, 3)).astype(np.float32) - 0.5) * 0.6
    R_true = random_rotation(rng)
    t_true = (rng.random(3).astype(np.float32) - 0.5) * 0.3
    src_noisy = np.concatenate(
        [src, (rng.random((20, 3)).astype(np.float32) - 0.5) * 2.0]
    ).astype(np.float32)
    tgt = (src @ R_true.T + t_true).astype(np.float32)

    kw = dict(mse_threshold=1e-5, trim_fraction=0.15, se3_pop=64,
              max_rounds=80)
    # trimmed solves default to the unfused kernel (measured faster);
    # bound_backend="screen" opts in to the clamped-sum screened kernel
    res_s = register(src_noisy, tgt, BnbParams(bound_backend="screen", **kw))
    res_u = register(src_noisy, tgt, BnbParams(bound_backend="mxu", **kw))
    for res in (res_s, res_u):
        pts = src @ np.asarray(res.transform.R).T + np.asarray(res.transform.t)
        rmse = float(np.sqrt(np.mean(np.sum((pts - tgt) ** 2, axis=1))))
        assert rmse < 5e-3, (rmse, res.converged)


def test_bounds_groups_matches_oracle(rng):
    src, tgt, Rg, _ = _scene(rng, b=3)
    G = 3
    t8 = (rng.random((G, 8, 3)).astype(np.float32) - 0.5) * 0.3
    af = rng.random(G).astype(np.float32) * 0.3
    gt8 = rng.random((G, 8)).astype(np.float32) * 0.1
    R_flat = np.repeat(Rg, 8, axis=0)
    t_flat = t8.reshape(-1, 3)
    ub_ref, lb_ref = _oracle_bounds(
        src, tgt, R_flat, t_flat, np.repeat(af, 8), gt8.reshape(-1)
    )
    srcT = mxu.pack_sources_ext(src, np.linalg.norm(src, axis=1))
    wm = mxu.pack_targets(tgt)
    gparams = mxu.pack_group_params_bounds(Rg, t8, af, gt8, 0.0, 1e30)
    ub, lb = map(np.asarray, mxu.bounds_groups(srcT, wm, gparams, interpret=True))
    assert np.allclose(ub, ub_ref, rtol=1e-5, atol=1e-5), np.abs(ub - ub_ref).max()
    assert np.allclose(lb, lb_ref, rtol=1e-5, atol=1e-5), np.abs(lb - lb_ref).max()


def test_bounds_groups_screening_is_valid(rng):
    src, tgt, Rg, _ = _scene(rng, n=512, b=2)
    G = 2
    t8 = (rng.random((G, 8, 3)).astype(np.float32) - 0.5) * 0.1
    t8[1] += 2.0                          # far group: every sibling screens
    af = np.full(G, 0.05, np.float32)
    gt8 = np.full((G, 8), 0.02, np.float32)
    ub_ref, lb_ref = _oracle_bounds(
        src, tgt, np.repeat(Rg, 8, axis=0), t8.reshape(-1, 3),
        np.repeat(af, 8), gt8.reshape(-1)
    )
    thresh = float(lb_ref[8:].min() * 0.3)
    srcT = mxu.pack_sources_ext(src, np.linalg.norm(src, axis=1))
    wm = mxu.pack_targets(tgt)
    gparams = mxu.pack_group_params_bounds(Rg, t8, af, gt8, 0.0, thresh)
    ub, lb = map(np.asarray, mxu.bounds_groups(srcT, wm, gparams, interpret=True))
    # near group fully evaluated
    assert np.allclose(ub[:8], ub_ref[:8], rtol=1e-5, atol=1e-5)
    assert np.allclose(lb[:8], lb_ref[:8], rtol=1e-5, atol=1e-5)
    # far group screened: partial lbs ≥ thresh, ubs sentinel
    assert (ub[8:] >= 1e29).all()
    assert (lb[8:] >= thresh - 1e-4).all()
    assert (lb[8:] <= lb_ref[8:] + 1e-3).all()


def test_bounds_groups_trimmed_unscreened_matches_oracle(rng):
    """Grouped trimmed kernel (VERDICT r4 item 2) vs the numpy trimmed
    oracle, no screening (thresh=inf): exact within bisection tolerance,
    bracketing from the sound sides."""
    src, tgt, Rg, _ = _scene(rng, b=3)
    G = 3
    h = int(src.shape[0] * 0.85)
    drop = src.shape[0] - h
    t8 = (rng.random((G, 8, 3)).astype(np.float32) - 0.5) * 0.3
    af = rng.random(G).astype(np.float32) * 0.3
    gt8 = rng.random((G, 8)).astype(np.float32) * 0.1
    ub_ref, lb_ref = _oracle_bounds_trimmed(
        src, tgt, np.repeat(Rg, 8, axis=0), t8.reshape(-1, 3),
        np.repeat(af, 8), gt8.reshape(-1), h,
    )
    srcT = mxu.pack_sources_ext(src, np.linalg.norm(src, axis=1))
    wm = mxu.pack_targets(tgt)
    gparams = mxu.pack_group_params_bounds_trimmed(
        Rg, t8, af, gt8, 0.0, 1e30, 1e30
    )
    ub, lb = map(
        np.asarray,
        mxu.bounds_groups_trimmed(srcT, wm, gparams, h=h, drop=drop,
                                  interpret=True),
    )
    assert (ub >= ub_ref - 1e-4).all(), (ub - ub_ref).min()
    assert (lb <= lb_ref + 1e-4).all(), (lb - lb_ref).max()
    assert np.allclose(ub, ub_ref, rtol=1e-3, atol=1e-3)
    assert np.allclose(lb, lb_ref, rtol=1e-3, atol=1e-3)


def test_bounds_groups_trimmed_screening_is_valid(rng):
    """Group-level screening on the trimmed grouped kernel: screened
    groups report per-sibling clamped-sum lbs that are ≥ thresh (prunable)
    AND ≤ the exact trimmed lbs (sound); survivor groups are exact."""
    src, tgt, Rg, _ = _scene(rng, n=512, b=4)
    G = 4
    h = int(src.shape[0] * 0.9)
    drop = src.shape[0] - h
    t8 = np.tile(np.float32([2.0, 0, 0]), (G, 8, 1)) + (
        rng.random((G, 8, 3)).astype(np.float32) - 0.5
    ) * 0.1
    t8[0] *= 0.0                             # group 0 near: must NOT screen
    af = np.full(G, 0.05, np.float32)
    gt8 = np.full((G, 8), 0.02, np.float32)
    ub_ref, lb_ref = _oracle_bounds_trimmed(
        src, tgt, np.repeat(Rg, 8, axis=0), t8.reshape(-1, 3),
        np.repeat(af, 8), gt8.reshape(-1), h,
    )
    thresh = float(np.sort(lb_ref)[8] * 0.5)   # past group 0's siblings
    tau = 2.0 * thresh / h
    srcT = mxu.pack_sources_ext(src, np.linalg.norm(src, axis=1))
    wm = mxu.pack_targets(tgt)
    gparams = mxu.pack_group_params_bounds_trimmed(
        Rg, t8, af, gt8, 0.0, thresh + drop * tau, tau
    )
    ub, lb = map(
        np.asarray,
        mxu.bounds_groups_trimmed(srcT, wm, gparams, h=h, drop=drop,
                                  interpret=True),
    )
    screened = 0
    for b in range(8 * G):
        if ub[b] >= 1e29:        # the whole group screened
            screened += 1
            assert lb[b] >= thresh - 1e-4
            assert lb[b] <= lb_ref[b] + 1e-3
        else:
            assert np.isclose(ub[b], ub_ref[b], rtol=1e-3, atol=1e-3)
            assert np.isclose(lb[b], lb_ref[b], rtol=1e-3, atol=1e-3)
    assert screened >= 16        # the far groups actually screen
    assert (ub[0:8] < 1e29).all()  # the near group fully evaluated
