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
