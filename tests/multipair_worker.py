"""Worker for the distributed multipair test (not a test module).

Usage: python multipair_worker.py <pid> <nproc> <port> <out.json>
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid, nproc, port, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )

import numpy as np

from goicp_tpu.bnb import BnbParams
from goicp_tpu.multipair import register_pairs_distributed


def _pairs(n):
    out = []
    rng = np.random.default_rng(5)
    for k in range(n):
        src = (rng.random((40 + 8 * k, 3)).astype(np.float32) - 0.5)
        A = rng.normal(size=(3, 3))
        Q, Ru = np.linalg.qr(A)
        Q = (Q * np.sign(np.diag(Ru))).astype(np.float32)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        t = (rng.random(3).astype(np.float32) - 0.5) * 0.3
        out.append(((src, (src @ Q.T + t).astype(np.float32)), (Q, t)))
    return out


data = _pairs(3)
pairs = [d[0] for d in data]
params = BnbParams(
    mse_threshold=1e-4, bound_backend="exact", se3_pop=32,
    init_multistart=8, refine_top_k=4, max_rounds=400, max_wall_s=180.0,
)
results = register_pairs_distributed(pairs, params)
rec = []
for (pair, (Q, t_true)), res in zip(data, results):
    src = pair[0]
    pts = src @ np.asarray(res.transform.R).T + np.asarray(res.transform.t)
    gt = src @ Q.T + t_true
    rec.append({
        "converged": bool(res.converged),
        "rmse_vs_gt": float(np.sqrt(np.mean(np.sum((pts - gt) ** 2, axis=1)))),
        "R": np.asarray(res.transform.R).tolist(),
    })
with open(out_path, "w") as f:
    json.dump(rec, f)
print(f"[p{pid}] done", flush=True)
