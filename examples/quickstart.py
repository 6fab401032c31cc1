"""Minimal library usage: globally-optimal registration of the bunny pair.

Run from the repo root:  python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from goicp_tpu.bnb import BnbParams, register
from goicp_tpu.core.cache import enable_persistent_cache
from goicp_tpu.io import load_cloud

enable_persistent_cache()   # 20-40 s TPU compiles cache across runs

src = load_cloud("data/bunny/data_bunny.txt", subsample=0.1, seed=0)
tgt = load_cloud("data/bunny/model_bunny.txt", subsample=0.1, seed=0)

# icp_metric="plane": point-to-plane multistart/polish (PCA normals on
# device) — measured 2-3x faster scenario walls on real scans; incumbents
# and the certificate stay point-SSE-scored either way
res = register(src, tgt, BnbParams(mse_threshold=1e-3, icp_metric="plane"))

print("converged:", res.converged, " mse:", res.mse, " gap:", res.gap)
print("R =\n", np.asarray(res.transform.R))
print("t =", np.asarray(res.transform.t))
print(f"{res.rot_nodes} nodes in {res.wall_s:.2f}s "
      f"({res.rounds} rounds, {res.icp_iters} ICP iters)")
