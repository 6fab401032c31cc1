"""Full-cloud ε-certification by adaptive subset refinement
(``bnb/fullcert.py`` — VERDICT r4 item 3): the transfer inequalities, the
refinement loop, and certificate soundness vs the independent oracle."""

import numpy as np
import pytest

from goicp_tpu.bnb import BnbParams, register, register_full_cert
from tests.conftest import random_rotation
from tests.oracle_goicp import oracle_min_sse, _sse


def _trimmed_sum(d2, h):
    return float(np.sort(d2)[:h].sum())


def test_trimmed_transfer_inequality_property(rng):
    """For every pose: trimmed_full_{h_f}(T) ≥ trimmed_sub_{h_s}(T) with
    h_s = N_s − (N_f − h_f) — the counting argument behind the trimmed
    transfer (fullcert module docs), checked numerically over random
    clouds, subsets, and poses."""
    for _ in range(40):
        N_f = int(rng.integers(20, 60))
        N_s = int(rng.integers(8, N_f))
        trim = float(rng.uniform(0.05, 0.4))
        h_f = max(1, int(round(N_f * (1.0 - trim))))
        h_s = N_s - (N_f - h_f)
        if h_s < 1:
            continue
        full = rng.random((N_f, 3)).astype(np.float32) - 0.5
        sub_idx = rng.choice(N_f, N_s, replace=False)
        tgt = rng.random((30, 3)).astype(np.float32) - 0.5
        Q = random_rotation(rng)
        t = (rng.random(3) - 0.5).astype(np.float32)
        moved = full @ Q.T + t
        d2 = ((moved[:, None, :] - tgt[None]) ** 2).sum(-1).min(1)
        assert (
            _trimmed_sum(d2, h_f)
            >= _trimmed_sum(d2[sub_idx], h_s) - 1e-6
        )


def test_fullcert_untrimmed_meets_target_and_is_sound(rng):
    """A bound_points-capped solve refined to the full-cloud ε: gap_full
    meets the default target and the certificate is SOUND against the
    uncapped solve's optimum."""
    base = (rng.random((160, 3)).astype(np.float32) - 0.5) * 0.6
    Q = random_rotation(rng)
    t = np.float32([0.1, -0.06, 0.12])
    tgt = (base @ Q.T + t
           + rng.normal(0, 0.004, base.shape).astype(np.float32))
    p = BnbParams(
        mse_threshold=2e-4, grid_resolution=24, init_multistart=4,
        se3_pop=64, max_rounds=3000, bound_points=40,
        bound_backend="exact", trans_span=0.5,
    )
    res = register_full_cert(base, tgt, p, max_refinements=3)
    assert res.gap_full is not None and res.sse_full is not None
    h_full = base.shape[0]
    assert res.gap_full <= p.mse_threshold * h_full + 1e-9, res.gap_full
    # soundness: the UNCAPPED optimum can not beat the transferred bound
    import dataclasses

    full = register(base, tgt, dataclasses.replace(p, bound_points=1 << 30))
    opt_bound = res.sse_full - res.gap_full
    assert full.sse >= opt_bound - 1e-6, (full.sse, opt_bound)


def test_fullcert_growth_on_tight_target(rng):
    """A target below what the starting subset can certify forces the
    adaptive loop to GROW the subset with the worst-covered points (and
    the grown certificate then meets the tighter target)."""
    rng2 = np.random.default_rng(9)
    base = (rng2.random((60, 3)).astype(np.float32) - 0.5) * 0.6
    Q = random_rotation(rng2)
    t = np.float32([0.08, -0.04, 0.1])
    tgt = (base @ Q.T + t
           + rng2.normal(0, 0.01, base.shape).astype(np.float32))
    p = BnbParams(
        mse_threshold=5e-4, grid_resolution=24, init_multistart=4,
        se3_pop=64, max_rounds=6000, bound_points=16,
        bound_backend="exact", trans_span=0.5,
    )
    # the 16-point subset leaves ~44 uncovered noisy points: their
    # residual alone (~44·3σ² ≈ 1.3e-2 sse) exceeds this target, so the
    # first transfer CANNOT pass and the subset must grow
    res = register_full_cert(
        base, tgt, p, target_gap_mse=2.2e-4, max_refinements=3
    )
    assert res.metrics.counters["fullcert_refinements"] >= 1
    assert res.metrics.counters["fullcert_subset"] > 16
    assert res.gap_full is not None
    assert res.gap_full <= 2.2e-4 * base.shape[0] + 1e-9, res.gap_full


def test_fullcert_trimmed_certificate_vs_oracle(rng):
    """Trimmed full-cloud certificate: finite gap_full (round 4 reported
    None), and SOUND — the independent trimmed oracle's optimum respects
    the transferred lower bound."""
    rng2 = np.random.default_rng(5)
    src = (rng2.random((26, 3)).astype(np.float32) - 0.5) * 0.6
    Q = random_rotation(rng2)
    t = np.float32([0.08, -0.05, 0.1])
    trim = 0.25
    keep = rng2.choice(26, 20, replace=False)       # 6 source outliers
    tgt = ((src[keep] @ Q.T) + t).astype(np.float32)
    mse = 2e-4
    p = BnbParams(
        mse_threshold=mse, trim_fraction=trim, trans_span=0.5,
        se3_pop=48, max_rounds=2000, init_multistart=4,
        bound_points=16, bound_backend="exact", grid_resolution=24,
    )
    res = register_full_cert(src, tgt, p, max_refinements=3)
    assert res.gap_full is not None, "trimmed transfer must yield a gap"
    h_f = max(1, int(round(src.shape[0] * (1.0 - trim))))
    # soundness vs the oracle's trimmed optimum on the FULL cloud
    o_sse, _, _ = oracle_min_sse(
        src, tgt, trans_span=0.5, mse_threshold=mse, trim_fraction=trim
    )
    opt_bound = res.sse_full - res.gap_full
    assert o_sse >= opt_bound - 2 * mse * h_f, (o_sse, opt_bound)


def test_fullcert_uncapped_passthrough(rng):
    """bound_points ≥ N: one solve, certificate fields filled directly."""
    src = (rng.random((30, 3)).astype(np.float32) - 0.5) * 0.6
    Q = random_rotation(rng)
    tgt = (src @ Q.T).astype(np.float32)
    p = BnbParams(
        mse_threshold=1e-4, trans_span=0.5, se3_pop=32,
        init_multistart=4, bound_backend="exact", grid_resolution=24,
    )
    res = register_full_cert(src, tgt, p)
    assert res.converged and res.gap_full is not None
    assert res.gap_full <= 1e-4 * src.shape[0]
    assert res.sse_full == res.sse


def test_full_cert_slack_ladder_is_sound(rng):
    """Round-5 review fix: the subset-optimum slack must follow the
    termination rule — an EMPTIED frontier (gap = −inf) only guarantees
    opt ≥ best − ε (slack ε, never 0); the min(gap, ε) tightening applies
    only when the threshold rule provably fired (best ≤ ε); otherwise the
    raw gap form holds."""
    src = (rng.random((80, 3)).astype(np.float32) - 0.5) * 0.6
    Q = random_rotation(rng)
    tgt = (src @ Q.T).astype(np.float32)
    import dataclasses

    from goicp_tpu.bnb import BnbParams, make_solver

    p = BnbParams(
        mse_threshold=1e-4, bound_points=40, bound_backend="exact",
        grid_resolution=16, init_multistart=2, trans_span=0.5,
    )
    s = make_solver(src, tgt, p)
    eps = s.sse_thresh
    R, t = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    sse_full = s.score_full(R, t)

    # emptied frontier, best ABOVE the threshold: slack must be eps
    best = 5.0 * eps
    _, _, gap_inf = s._full_cert(R, t, best, float("-inf"))
    expect = sse_full - max(best - 1.01 * eps, 0.0)
    assert abs(gap_inf - expect) < 1e-6 * max(1.0, sse_full), (
        gap_inf, expect,
    )

    # finite gap > eps with best > eps: the gap form (no min tightening)
    g = 3.0 * eps
    _, _, gap_g = s._full_cert(R, t, best, g)
    expect = sse_full - max(best - g - 0.01 * eps, 0.0)
    assert abs(gap_g - expect) < 1e-6 * max(1.0, sse_full)

    # threshold rule (best <= eps): min(gap, eps) applies
    best2 = 0.5 * eps
    _, _, gap_t = s._full_cert(R, t, best2, 3.0 * eps)
    expect = sse_full - max(best2 - 1.01 * eps, 0.0)
    assert abs(gap_t - expect) < 1e-6 * max(1.0, sse_full)
