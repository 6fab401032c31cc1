"""Worker process for tests/test_multihost.py: one simulated host of a
frontier-sharded Go-ICP solve (Gloo CPU backend).  Not a test module.

Usage: python multihost_worker.py <pid> <nproc> <port> <out.json> \
           [mesh_cubes] [checkpoint_path] [max_rounds]

``mesh_cubes > 1`` composes the between-hosts frontier sharding with a
within-host (cubes × 1) local device mesh — every process runs its rounds
through ``dist.se3.make_sharded_se3_round`` over its own virtual devices.
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid, nproc, port, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)
mesh_cubes = int(sys.argv[5]) if len(sys.argv) > 5 else 1
checkpoint_path = sys.argv[6] if len(sys.argv) > 6 else ""
max_rounds = int(sys.argv[7]) if len(sys.argv) > 7 else 600
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )

import numpy as np

from goicp_tpu.bnb import BnbParams, make_solver


import os

_HARD = os.environ.get("GOICP_MH_HARD", "") == "1"
_TRIM = float(os.environ.get("GOICP_MH_TRIM", "0") or 0)


def _problem():
    rng = np.random.default_rng(77)
    src = (rng.random((150, 3)).astype(np.float32) - 0.5) * 0.6
    A = rng.normal(size=(3, 3))
    Q, Ru = np.linalg.qr(A)
    Q = (Q * np.sign(np.diag(Ru))).astype(np.float32)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = np.float32([0.12, -0.07, 0.09])
    noise = (
        rng.normal(size=src.shape).astype(np.float32) * 0.01 if _HARD else 0.0
    )
    tgt = (src @ Q.T + t + noise).astype(np.float32)
    if _TRIM > 0:
        # corrupt ~TRIM/2 of the target with far outliers: the trimmed
        # multi-host solve must still land on the ground truth
        k = max(1, int(tgt.shape[0] * _TRIM / 2))
        tgt[:k] += rng.normal(size=(k, 3)).astype(np.float32) * 2.0
    return src, tgt, Q, t


src, tgt, Q, t_true = _problem()
# GOICP_MH_HARD=1 (scaling tool): noisy pair + threshold below the optimal
# mse → a pure ε-CERTIFICATION workload (fat, balanced lockstep rounds —
# the real headline solve is ~95% certification).  Default: noise-free
# pair with an identity-only start (the reference's own start,
# fgoicp.cpp:11) — the multistart must NOT find the far-away global basin,
# so the BnB has to DISCOVER it and the frontier slices carry real
# distributed search work.
params = BnbParams(
    # hard: optimal mse ≈ 3.1e-4 (σ=0.01 noise, N=150) → margin
    # best − thresh ≈ 150·(3.1−2.85)e-4 ≈ 0.004 sse: a bounded
    # certification tree (~10^5 nodes) with full-width rounds
    mse_threshold=2.85e-4 if _HARD else (1e-4 if _TRIM else 1e-5),
    bound_backend="exact",
    se3_pop=64 if _HARD else 32,
    init_multistart=16 if _HARD else 1,
    refine_top_k=4,
    max_rounds=max_rounds,
    trim_fraction=_TRIM,
    max_wall_s=600.0 if _HARD else 240.0,
    mesh_cubes=mesh_cubes,
    checkpoint_path=checkpoint_path or None,
    checkpoint_every=3,
)
# make_solver auto-routes: multi-process launches get the frontier-sharded
# multi-host engine, single-process the production SE(3) engine
res = make_solver(src, tgt, params).run()
pts = src @ np.asarray(res.transform.R).T + np.asarray(res.transform.t)
gt = src @ Q.T + t_true
rmse = float(np.sqrt(np.mean(np.sum((pts - gt) ** 2, axis=1))))
with open(out_path, "w") as f:
    json.dump(
        {
            "pid": pid,
            "converged": bool(res.converged),
            "mse": float(res.mse),
            "rmse_vs_gt": rmse,
            "rounds": res.rounds,
            "solver_wall_s": res.wall_s,
            "local_nodes": res.rot_nodes,
            "rebalances": int(res.metrics.counters.get("rebalances", 0)),
            "R": np.asarray(res.transform.R).tolist(),
            "t": np.asarray(res.transform.t).tolist(),
        },
        f,
    )
print(f"[p{pid}] done", flush=True)
