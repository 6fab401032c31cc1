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
