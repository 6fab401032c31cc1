"""Batched multi-pair registration (pod-scale serving surface)."""

import numpy as np
import pytest

from goicp_tpu.bnb import BnbParams
from goicp_tpu.core.types import RigidTransform
from goicp_tpu.icp import IcpParams
from goicp_tpu.multipair import icp_pairs, register_pairs
from tests.conftest import random_rotation


def _pair(rng, n, angle=0.1):
    src = (rng.random((n, 3)).astype(np.float32) - 0.5) * 0.6
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    from goicp_tpu.geo.rotation import axis_angle_rotation
    import jax.numpy as jnp

    R = np.asarray(axis_angle_rotation(jnp.asarray((axis * angle).astype(np.float32))))
    t = (rng.random(3).astype(np.float32) - 0.5) * 0.1
    return src, (src @ R.T + t).astype(np.float32), R, t


def test_icp_pairs_mixed_sizes(rng):
    pairs, gts = [], []
    for n in (150, 230, 310):
        s, t, R, tv = _pair(rng, n)
        pairs.append((s, t))
        gts.append((R, tv))
    T, sse, iters = icp_pairs(pairs, params=IcpParams(max_iter=80, rel_tol=1e-6))
    for b, ((s, t), (R, tv)) in enumerate(zip(pairs, gts)):
        Rb = np.asarray(T.R)[b]
        tb = np.asarray(T.t)[b]
        pts = s @ Rb.T + tb
        rmse = float(np.sqrt(np.mean(np.sum((pts - t) ** 2, axis=1))))
        assert rmse < 1e-3, (b, rmse)


def test_register_pairs_lockstep_single_executable(rng):
    """≥2 pairs advance per BnB dispatch and every round reuses ONE compiled
    executable (VERDICT r1 item 4: the pod-scale batched multi-pair path)."""
    from goicp_tpu import multipair as mp

    pairs = []
    for i in range(3):
        src = (rng.random((120, 3)).astype(np.float32) - 0.5) * 0.6
        R = random_rotation(rng)
        t = (rng.random(3).astype(np.float32) - 0.5) * 0.2
        pairs.append((src, (src @ R.T + t).astype(np.float32)))

    mp._pairs_round.clear_cache()
    results = mp.register_pairs(
        pairs, BnbParams(mse_threshold=1e-4, se3_pop=32, max_rounds=40)
    )
    assert len(results) == 3
    # all pairs share one lockstep executable (jit cache has exactly one entry)
    assert mp._pairs_round._cache_size() == 1
    for (s, t), res in zip(pairs, results):
        pts = s @ np.asarray(res.transform.R).T + np.asarray(res.transform.t)
        rmse = float(np.sqrt(np.mean(np.sum((pts - t) ** 2, axis=1))))
        assert rmse < 5e-3, rmse
        assert res.rounds >= 1 or res.converged


def _trimmed_pair(rng, n=90, overlap=60, scale=0.6):
    """Partial-overlap pair: target = rigidly-moved SUBSET of the source
    (the remaining source points have no correspondence — the trimmed
    registration setting, ≙ jly trimming, jly_icp3d.hpp:189-196)."""
    src = (rng.random((n, 3)).astype(np.float32) - 0.5) * scale
    R = random_rotation(rng)
    t = (rng.random(3).astype(np.float32) - 0.5) * 0.2
    idx = rng.choice(n, overlap, replace=False)
    tgt = (src[idx] @ R.T + t).astype(np.float32)
    return src, tgt, R, t


def test_register_pairs_lockstep_trimmed(rng):
    """Trimmed pairs now ride the LOCKSTEP driver (previously a serial
    fallback): batched partial-overlap registration recovers every GT."""
    from goicp_tpu import multipair as mp

    pairs, gts = [], []
    for _ in range(3):
        s, t, R, tv = _trimmed_pair(rng)
        pairs.append((s, t))
        gts.append((R, tv))

    calls = []
    orig = mp._register_pairs_lockstep

    def spy(pairs_, p, mesh=None, **kw):
        calls.append(len(pairs_))
        return orig(pairs_, p, mesh=mesh, **kw)

    mp._register_pairs_lockstep = spy
    try:
        results = mp.register_pairs(
            pairs,
            BnbParams(
                mse_threshold=2e-5, trim_fraction=0.4, se3_pop=32,
                max_rounds=120,
            ),
        )
    finally:
        mp._register_pairs_lockstep = orig
    assert calls == [3]          # the trimmed batch took the lockstep path
    for (s, _), res, (R, tv) in zip(pairs, results, gts):
        assert res.converged
        a = s @ np.asarray(res.transform.R).T + np.asarray(res.transform.t)
        b = s @ R.T + tv
        rmse = float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=1))))
        assert rmse < 5e-3, rmse


def test_pairs_round_trimmed_bounds_bracket(rng):
    """Trimmed lockstep bounds are VALID: for random SE(3) cubes,
    lb ≤ trimmed-SSE(any pose in cube) and ub ≥ trimmed-SSE(center)."""
    import jax.numpy as jnp

    from goicp_tpu import multipair as mp
    from goicp_tpu.geo.rotation import axis_angle_rotation

    src, tgt, _, _ = _trimmed_pair(rng, n=50, overlap=35)
    N, Nt = src.shape[0], tgt.shape[0]
    h = int(round(N * 0.7))
    norms = np.linalg.norm(src, axis=1).astype(np.float32)

    def trimmed_sse(R, t):
        pts = src @ R.T + t
        d2 = ((pts[:, None, :] - tgt[None]) ** 2).sum(-1).min(1)
        return float(np.sort(d2)[:h].sum())

    M = 8
    r_c = (rng.random((M, 3)).astype(np.float32) - 0.5) * 2.0
    r_s = rng.random(M).astype(np.float32) * 0.4 + 0.05
    t_c = (rng.random((M, 3)).astype(np.float32) - 0.5) * 0.2
    t_s = rng.random(M).astype(np.float32) * 0.08 + 0.01
    R_c = np.stack([
        np.asarray(axis_angle_rotation(jnp.asarray(r))) for r in r_c
    ])
    ang = np.sqrt(3.0) * r_s  # uniform axis-angle cube bound angle

    ub, lb = mp._bounds_one_pair(
        jnp.asarray(src), jnp.ones(N, jnp.float32), jnp.asarray(norms),
        jnp.asarray(tgt), jnp.float32(0.0), jnp.asarray(R_c),
        jnp.asarray(np.minimum(ang, np.pi).astype(np.float32)),
        jnp.asarray(t_c), jnp.asarray(t_s),
        jnp.ones(M, bool), jnp.float32(h), trim=True,
    )
    ub, lb = np.asarray(ub), np.asarray(lb)
    for m in range(M):
        center = trimmed_sse(R_c[m], t_c[m])
        assert ub[m] >= center - 1e-4, (m, ub[m], center)
        assert lb[m] <= center + 1e-4
        for _ in range(6):  # random poses inside the cube
            rr = r_c[m] + (rng.random(3).astype(np.float32) - 0.5) * 2 * r_s[m]
            tt = t_c[m] + (rng.random(3).astype(np.float32) - 0.5) * 2 * t_s[m]
            Rr = np.asarray(axis_angle_rotation(jnp.asarray(rr)))
            val = trimmed_sse(Rr, tt)
            assert lb[m] <= val + 1e-4, (m, lb[m], val)


def test_register_pairs_lockstep_quaternion(rng):
    """Quaternion-cube pairs (fgoicp's parametrization, common.h:40-60)
    ride the lockstep driver too and recover every GT pose."""
    from goicp_tpu import multipair as mp

    pairs, gts = [], []
    for _ in range(2):
        src = (rng.random((100, 3)).astype(np.float32) - 0.5) * 0.6
        R = random_rotation(rng)
        t = (rng.random(3).astype(np.float32) - 0.5) * 0.2
        pairs.append((src, (src @ R.T + t).astype(np.float32)))
        gts.append((R, t))

    calls = []
    orig = mp._register_pairs_lockstep

    def spy(pairs_, p, mesh=None, **kw):
        calls.append(len(pairs_))
        return orig(pairs_, p, mesh=mesh, **kw)

    mp._register_pairs_lockstep = spy
    try:
        results = mp.register_pairs(
            pairs,
            BnbParams(
                mse_threshold=1e-4, rotation_param="quaternion",
                se3_pop=32, max_rounds=120,
            ),
        )
    finally:
        mp._register_pairs_lockstep = orig
    assert calls == [2]
    for (s, t), res, (R, tv) in zip(pairs, results, gts):
        assert res.converged
        a = s @ np.asarray(res.transform.R).T + np.asarray(res.transform.t)
        b = s @ R.T + tv
        assert float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=1)))) < 5e-3


def _surface_pair(rng, n=220, angle_scale=1.0):
    """Smooth-surface pair (meaningful normals): z = f(x, y) heightfield."""
    xy = (rng.random((n, 2)).astype(np.float32) - 0.5) * 0.8
    z = 0.12 * np.sin(4.0 * xy[:, 0]) * np.cos(3.0 * xy[:, 1])
    src = np.column_stack([xy, z]).astype(np.float32)
    from goicp_tpu.geo.rotation import axis_angle_rotation
    import jax.numpy as jnp

    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    R = np.asarray(axis_angle_rotation(
        jnp.asarray((axis * angle_scale * rng.random()).astype(np.float32))
    ))
    t = (rng.random(3).astype(np.float32) - 0.5) * 0.2
    return src, (src @ R.T + t).astype(np.float32), R, t


def test_register_pairs_lockstep_plane_metric(rng):
    """VERDICT r4 item 1: icp_metric='plane' rides the LOCKSTEP driver
    (per-pair [B,N,3] normals through the fused dispatches) — no silent
    point-to-point downgrade — and matches the solo plane path's pose."""
    from goicp_tpu import multipair as mp
    from goicp_tpu.bnb import make_solver

    pairs, gts = [], []
    for _ in range(3):
        s, t, R, tv = _surface_pair(rng)
        pairs.append((s, t))
        gts.append((R, tv))

    calls = []
    orig = mp._register_pairs_lockstep

    def spy(pairs_, p, mesh=None, **kw):
        calls.append(len(pairs_))
        return orig(pairs_, p, mesh=mesh, **kw)

    mp._register_pairs_lockstep = spy
    params = BnbParams(
        mse_threshold=1e-5, icp_metric="plane", se3_pop=32, max_rounds=120,
    )
    try:
        results = mp.register_pairs(pairs, params)
    finally:
        mp._register_pairs_lockstep = orig
    assert calls == [3]          # plane batches take the lockstep path now
    for (s, t), res, (R, tv) in zip(pairs, results, gts):
        assert res.converged
        a = s @ np.asarray(res.transform.R).T + np.asarray(res.transform.t)
        b = s @ R.T + tv
        assert float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=1)))) < 2e-3
    # pose parity with the SOLO plane path (same metric, same target)
    solo = make_solver(pairs[0][0], pairs[0][1], params).run()
    a = pairs[0][0] @ np.asarray(results[0].transform.R).T + np.asarray(
        results[0].transform.t
    )
    b = pairs[0][0] @ np.asarray(solo.transform.R).T + np.asarray(
        solo.transform.t
    )
    assert float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=1)))) < 2e-3


def test_register_pairs_lockstep_priors(rng):
    """VERDICT r4 item 4: per-pair prior seeds ride the lockstep driver
    (the batched form of fgoicp.cpp:11-18's initial pose).  With a hard
    pose, few random seeds, and a near-GT prior, every pair must converge
    in the prior's basin without BnB rounds."""
    from goicp_tpu import multipair as mp
    from goicp_tpu.geo.rotation import axis_angle_rotation
    import jax.numpy as jnp

    pairs, gts, priors = [], [], []
    for _ in range(3):
        src = (rng.random((150, 3)).astype(np.float32) - 0.5) * 0.6
        R = random_rotation(rng)        # arbitrary large rotation
        t = (rng.random(3).astype(np.float32) - 0.5) * 0.3
        pairs.append((src, (src @ R.T + t).astype(np.float32)))
        gts.append((R, t))
        # rough prior: GT perturbed by a ~0.05 rad wobble
        d = rng.normal(size=3).astype(np.float32)
        d *= 0.05 / np.linalg.norm(d)
        Rp = np.asarray(axis_angle_rotation(jnp.asarray(d))) @ R
        priors.append(RigidTransform(Rp.astype(np.float32), t))

    results = mp.register_pairs(
        pairs,
        BnbParams(mse_threshold=1e-5, init_multistart=2, se3_pop=32,
                  max_rounds=120),
        inits=priors,
    )
    for (s, t), res, (R, tv) in zip(pairs, results, gts):
        assert res.converged
        assert res.rot_nodes == 0        # the prior seed met the threshold
        a = s @ np.asarray(res.transform.R).T + np.asarray(res.transform.t)
        b = s @ R.T + tv
        assert float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=1)))) < 2e-3


def test_lockstep_then_single_solver_same_process(rng):
    """Regression: a lockstep batch must not poison a later single-pair
    solve.  (Module-level jnp constants in bnb.device_inner/bnb.se3 used to
    be created during the lockstep's jit trace — their first import happened
    inside it — leaking tracers that corrupted the later se3_round compile:
    'Execution supplied 9 buffers but compiled program expected 12'.)"""
    from goicp_tpu.bnb import make_solver

    pairs = []
    for _ in range(2):
        src = (rng.random((100, 3)).astype(np.float32) - 0.5) * 0.6
        R = random_rotation(rng)
        t = (rng.random(3).astype(np.float32) - 0.5) * 0.2
        pairs.append((src, (src @ R.T + t).astype(np.float32)))
    register_pairs(pairs, BnbParams(mse_threshold=1e-4, se3_pop=32,
                                    max_rounds=40))

    tgt = (rng.random((120, 3)).astype(np.float32) - 0.5)
    Q = random_rotation(rng)
    src = (tgt[rng.choice(120, 90, replace=False)] @ Q).astype(np.float32)
    res = make_solver(
        src, tgt,
        BnbParams(mse_threshold=1e-4, grid_resolution=24, max_rounds=400,
                  init_multistart=4, se3_pop=64),
    ).run()
    assert res.converged


def test_register_pairs_global(rng):
    pairs, gts = [], []
    for i in range(2):
        src = (rng.random((200, 3)).astype(np.float32) - 0.5) * 0.6
        R = random_rotation(rng)
        t = (rng.random(3).astype(np.float32) - 0.5) * 0.3
        pairs.append((src, (src @ R.T + t).astype(np.float32)))
        gts.append((R, t))
    results = register_pairs(
        pairs,
        BnbParams(mse_threshold=1e-5, se3_pop=64, max_rounds=200),
    )
    for (s, t), res in zip(pairs, results):
        pts = s @ np.asarray(res.transform.R).T + np.asarray(res.transform.t)
        rmse = float(np.sqrt(np.mean(np.sum((pts - t) ** 2, axis=1))))
        assert rmse < 2e-3


def test_register_pairs_mesh_sharded(rng):
    """Lockstep multipair with the pair axis sharded over a device mesh —
    the north-star 'batched multi-pair across a pod slice' scenario on the
    virtual CPU mesh."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = Mesh(np.array(devs[:4]), ("pairs",))

    from goicp_tpu.multipair import register_pairs as rp

    pairs = []
    for i in range(4):
        src = (rng.random((100, 3)).astype(np.float32) - 0.5) * 0.6
        R = random_rotation(rng)
        t = (rng.random(3).astype(np.float32) - 0.5) * 0.2
        pairs.append((src, (src @ R.T + t).astype(np.float32)))

    results = rp(
        pairs,
        BnbParams(mse_threshold=1e-4, se3_pop=32, max_rounds=40),
        mesh=mesh,
    )
    assert len(results) == 4
    for (s, t), res in zip(pairs, results):
        pts = s @ np.asarray(res.transform.R).T + np.asarray(res.transform.t)
        rmse = float(np.sqrt(np.mean(np.sum((pts - t) ** 2, axis=1))))
        assert rmse < 5e-3, rmse


def test_register_pairs_distributed_two_hosts(tmp_path):
    """Pod-scale multipair: pairs sharded across 2 real processes (Gloo),
    every process returns the FULL converged result list identically."""
    import json
    import os
    import socket
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multipair_worker.py")
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(here) + os.pathsep + env.get("PYTHONPATH", "")
    )
    outs, procs = [], []
    for pid in range(2):
        out = tmp_path / f"mp_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    recs = []
    for pr, out in zip(procs, outs):
        stdout, _ = pr.communicate(timeout=420)
        assert pr.returncode == 0, stdout.decode()[-2000:]
        with open(out) as f:
            recs.append(json.load(f))
    assert len(recs[0]) == len(recs[1]) == 3
    for a, b in zip(recs[0], recs[1]):
        assert a["converged"] and b["converged"]
        assert a["rmse_vs_gt"] < 1e-3 and b["rmse_vs_gt"] < 1e-3
        assert np.allclose(a["R"], b["R"], atol=1e-6)


def test_lockstep_pipelined_budget_exit(rng):
    """The pipelined lockstep driver honors max_rounds, drains its
    in-flight rounds, and returns well-formed (possibly non-converged)
    results with true gaps."""
    from goicp_tpu import multipair as mp

    pairs = []
    for _ in range(3):
        src = (rng.random((150, 3)).astype(np.float32) - 0.5) * 0.6
        R = random_rotation(rng)
        t = (rng.random(3).astype(np.float32) - 0.5) * 0.2
        tgt = (
            src @ R.T + t
            + rng.normal(size=src.shape).astype(np.float32) * 0.02
        ).astype(np.float32)
        pairs.append((src, tgt))
    # threshold far below the noise floor: BnB must engage and then hit
    # the round budget
    res = mp.register_pairs(
        pairs,
        BnbParams(mse_threshold=1e-9, init_multistart=4, se3_pop=16,
                  max_rounds=3, pipeline_depth=3),
    )
    assert len(res) == 3
    for r in res:
        assert r.rounds <= 3
        assert np.isfinite(r.sse) and np.isfinite(r.gap) and r.gap >= 0
        assert r.rot_nodes > 0            # rounds actually ran
        assert not r.converged            # 1e-9 is unreachable
