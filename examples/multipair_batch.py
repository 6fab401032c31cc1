"""Batched multi-pair Go-ICP: every pair's BnB advances through ONE fused
device dispatch per round (the pod-scale shape; see multipair.py).

Run from the repo root:  python examples/multipair_batch.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from goicp_tpu.bnb import BnbParams
from goicp_tpu.core.cache import enable_persistent_cache
from goicp_tpu.io import load_cloud
from goicp_tpu.multipair import register_pairs

enable_persistent_cache()

base = load_cloud("data/bunny/model_bunny.txt", subsample=0.05, seed=0)
rng = np.random.default_rng(7)
pairs = []
for _ in range(4):
    A = rng.normal(size=(3, 3))
    Q, R_ = np.linalg.qr(A)
    Q = (Q * np.sign(np.diag(R_))).astype(np.float32)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = (rng.random(3).astype(np.float32) - 0.5) * 0.3
    src = base[rng.choice(base.shape[0], 1000, replace=False)]
    keep = rng.choice(1000, 650, replace=False)   # 65% overlap: trimmed case
    pairs.append((src, (src[keep] @ Q.T + t).astype(np.float32)))

params = BnbParams(mse_threshold=2e-5, trim_fraction=0.4, max_rounds=600)
register_pairs(pairs, params)            # warm the jit caches
t0 = time.perf_counter()
results = register_pairs(pairs, params)  # one lockstep dispatch per round
wall = time.perf_counter() - t0

for i, r in enumerate(results):
    print(f"pair {i}: converged={r.converged} mse={r.mse:.3g}")
print(f"{len(pairs)} pairs in {wall:.2f}s ({wall / len(pairs):.2f}s/pair)")

# To shard the pair axis over a pod slice:
#   from jax.sharding import Mesh
#   import jax
#   mesh = Mesh(np.array(jax.devices()), ("pairs",))
#   results = register_pairs(pairs, params, mesh=mesh)
