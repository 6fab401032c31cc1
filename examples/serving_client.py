"""Client for the registration service (docs/SERVING.md).

Terminal 1 — start the service (one resident target, TCP):

    python -m goicp_tpu serve data/bunny/model_bunny.txt \
        --subsample 0.1 --port 7345 --warmup 1500

Terminal 2 — register query scans against it:

    python examples/serving_client.py 7345
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import socket

import numpy as np

port = int(sys.argv[1]) if len(sys.argv) > 1 else 7345

# a synthetic query: the bunny moved by a known rigid transform
from goicp_tpu.io import load_cloud  # noqa: E402

cloud = load_cloud("data/bunny/model_bunny.txt", subsample=0.1, seed=0)
rng = np.random.default_rng(0)
A = rng.normal(size=(3, 3))
Q, R_ = np.linalg.qr(A)
Q = (Q * np.sign(np.diag(R_))).astype(np.float32)
if np.linalg.det(Q) < 0:
    Q[:, 0] *= -1
t_true = np.float32([0.1, -0.05, 0.02])
query = ((cloud - t_true) @ Q).astype(np.float32)

with socket.create_connection(("127.0.0.1", port)) as s:
    f = s.makefile("rw")

    def call(req):
        f.write(json.dumps(req) + "\n")
        f.flush()
        return json.loads(f.readline())

    print("info:", call({"cmd": "info"}))

    # globally-optimal solve
    r = call({"id": 1, "points": query.round(6).tolist()})
    print("goicp:", r["converged"], "mse", r["mse"], "wall", r["wall_s"])
    print("R error vs truth:", float(np.abs(np.array(r["R"]) - Q).max()))

    # tracking: local ICP from the previous pose (milliseconds warm)
    r2 = call({
        "id": 2, "points": query.round(6).tolist(), "mode": "icp",
        "init": {"R": r["R"], "t": r["t"]},
    })
    print("track:", r2["converged"], "iters", r2["icp_iters"],
          "wall", r2["wall_s"])

    # point-to-plane tracking: tighter poses / fewer iterations on smooth
    # scan geometry (target normals are PCA-estimated once, held resident)
    r3 = call({
        "id": 3, "points": query.round(6).tolist(), "mode": "icp",
        "init": {"R": r["R"], "t": r["t"]},
        "icp_metric": "plane",   # whitelisted per-query override
    })
    print("track/plane:", r3["converged"], "iters", r3["icp_iters"],
          "wall", r3["wall_s"])

    # re-localization burst: prior-bearing goicp queries BATCH — all items
    # share ONE lockstep BnB dispatch per round, each prior pinned as that
    # query's multistart seed (still globally optimal)
    burst = {"batch": [
        {"id": 10 + i, "points": query.round(6).tolist(),
         "init": {"R": r["R"], "t": r["t"]}}
        for i in range(4)
    ]}
    f.write(json.dumps(burst) + "\n")
    f.flush()
    for _ in range(4):
        ri = json.loads(f.readline())
        print("burst:", ri["id"], ri["converged"], "wall", ri["wall_s"])
