"""Checkpoint/resume: restart-based recovery (SURVEY §5 — absent in the
reference, whose io.output was never even written)."""

import numpy as np
import pytest

from goicp_tpu.bnb import BnbParams, make_solver
from tests.conftest import random_rotation


def _scene():
    rng = np.random.default_rng(9)
    src = (rng.random((250, 3)).astype(np.float32) - 0.5) * 0.6
    R = random_rotation(rng)
    t = np.array([0.1, -0.05, 0.15], np.float32)
    tgt = (src @ R.T + t).astype(np.float32)
    return src, tgt


def test_checkpoint_resume(tmp_path):
    # unrelated clouds: no pose satisfies the threshold, so the search is
    # guaranteed to be interrupted mid-flight by max_rounds
    rng = np.random.default_rng(4)
    src = (rng.random((150, 3)).astype(np.float32) - 0.5) * 0.6
    tgt = (rng.random((150, 3)).astype(np.float32) - 0.5) * 0.6
    ck = str(tmp_path / "bnb.ckpt.npz")
    hard = dict(
        mse_threshold=1e-9,
        init_multistart=1,
        se3_pop=32,
        refine_top_k=2,
    )
    p1 = BnbParams(**hard, max_rounds=6, checkpoint_path=ck, checkpoint_every=2)
    r1 = make_solver(src, tgt, p1).run()
    assert not r1.converged  # interrupted mid-search
    import os

    assert os.path.exists(ck)

    # resume: picks up frontier + incumbent + round counter and continues
    p2 = BnbParams(**hard, max_rounds=12, checkpoint_path=ck, checkpoint_every=2)
    r2 = make_solver(src, tgt, p2).run()
    assert r2.rounds > 6          # continued beyond the checkpointed rounds
    assert r2.sse <= r1.sse + 1e-6  # incumbent carried over, never regresses


def test_checkpoint_resume_nested_engine(tmp_path):
    """The nested (reference-shaped) engine checkpoints too (VERDICT r1 §7)."""
    rng = np.random.default_rng(4)
    src = (rng.random((150, 3)).astype(np.float32) - 0.5) * 0.6
    tgt = (rng.random((150, 3)).astype(np.float32) - 0.5) * 0.6
    ck = str(tmp_path / "nested.ckpt.npz")
    hard = dict(
        engine="nested",
        mse_threshold=1e-9,
        init_multistart=1,
        rot_pop=4,
        inner_levels=3,
        refine_top_k=2,
    )
    p1 = BnbParams(**hard, max_rounds=4, checkpoint_path=ck, checkpoint_every=1)
    r1 = make_solver(src, tgt, p1).run()
    assert not r1.converged
    import os

    assert os.path.exists(ck)
    p2 = BnbParams(**hard, max_rounds=8, checkpoint_path=ck, checkpoint_every=1)
    r2 = make_solver(src, tgt, p2).run()
    assert r2.rounds > 4
    assert r2.sse <= r1.sse + 1e-6


def test_checkpoint_covers_inflight_rounds(tmp_path):
    """A snapshot taken while pipelined rounds are in flight must still
    cover their popped nodes (as re-pushed parents): resuming from ANY
    checkpoint and finishing must find the true optimum (ADVICE r1 medium:
    dropped in-flight regions made resumed solves silently non-optimal)."""
    rng = np.random.default_rng(11)
    src = (rng.random((60, 3)).astype(np.float32) - 0.5) * 0.6
    R = random_rotation(rng)
    t = np.array([0.12, -0.07, 0.1], np.float32)
    tgt = (src @ R.T + t).astype(np.float32)
    ck = str(tmp_path / "inflight.ckpt.npz")
    hard = dict(
        mse_threshold=1e-6,
        init_multistart=1,   # forbid the multistart shortcut: BnB must search
        refine_top_k=1,
        se3_pop=16,
        pipeline_depth=3,    # checkpoints WILL be written with rounds in flight
    )
    p1 = BnbParams(**hard, max_rounds=8, checkpoint_path=ck, checkpoint_every=1)
    r1 = make_solver(src, tgt, p1).run()
    if r1.converged:  # search finished before the interrupt: nothing to test
        return
    p2 = BnbParams(
        **hard, max_rounds=100000, checkpoint_path=ck, checkpoint_every=1
    )
    r2 = make_solver(src, tgt, p2).run()
    assert r2.converged
    # exact-pose recovery: the optimal region must not have been dropped
    pts = src @ np.asarray(r2.transform.R).T + np.asarray(r2.transform.t)
    rmse = float(np.sqrt(np.mean(np.sum((pts - tgt) ** 2, axis=1))))
    assert rmse < 5e-3, rmse


def test_frontier_dump_roundtrip(rng):
    from goicp_tpu.bnb.frontier import make_frontier

    f = make_frontier(8)
    pay = rng.random((40, 8)).astype(np.float32)
    lb = rng.random(40).astype(np.float32)
    ub = rng.random(40).astype(np.float32)
    f.push(pay, lb, ub)
    p2, l2, u2 = f.dump()
    assert len(f) == 40  # dump is non-destructive
    assert np.allclose(np.sort(l2), np.sort(lb))
    assert p2.shape == (40, 8)
