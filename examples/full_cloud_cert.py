"""Full-cloud ε-certification: register the FULL-resolution bunny source
(30,379 points — no subsample) and carry the optimality certificate to
every point, not just the solve subset.

``register_full_cert`` solves the ``bound_points`` subset, transfers the
gap via the subset-⊆-full inequality, and — if the full-cloud gap misses
the target — grows the subset with the worst-covered points and re-solves
from the warm incumbent.  The reference's own subsample certifies nothing
(``common.cpp:110-132``); here ``gap_full ≤ mse_threshold · N`` on exit.

Run from the repo root:  python examples/full_cloud_cert.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

from goicp_tpu.bnb import BnbParams, register_full_cert
from goicp_tpu.core.cache import enable_persistent_cache
from goicp_tpu.io import load_cloud

enable_persistent_cache()

src = load_cloud("data/bunny/data_bunny.txt", subsample=1.0, seed=0)
tgt = load_cloud("data/bunny/model_bunny.txt", subsample=0.9, seed=0)
print(f"source {src.shape[0]} pts (full resolution), target {tgt.shape[0]}")

params = BnbParams(mse_threshold=1e-3, max_rounds=2000)
t0 = time.perf_counter()
res = register_full_cert(src, tgt, params)
wall = time.perf_counter() - t0

eps_full = params.mse_threshold * src.shape[0]
print(f"wall            {wall:.2f} s (first run includes compiles)")
print(f"solve subset    {int(res.metrics.counters['fullcert_subset'])} pts, "
      f"{int(res.metrics.counters['fullcert_refinements'])} refinements")
print(f"mse_full        {res.mse_full:.6g}")
print(f"gap_full        {res.gap_full:.6g}  (target eps*N = {eps_full:.4g})")
print(f"certified       {res.gap_full <= eps_full}")
