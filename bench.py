"""Headline benchmark: bunny Go-ICP wall-clock (≙ Performance.xlsx sheet1,
"Best/worst Performance of Go-ICP sample ratio = 0.05": reference GPU-LUT
best/worst 0.05 s / 6 s on RTX 4080 Laptop; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` = reference worst-case seconds / our seconds (speedup ×).

Protocol: subsample 0.05 to match the reference measurement; one warmup
solve (compile caches), then the median of 3 timed solves.  Each timed solve
includes the distance-grid build and the full BnB+ICP pipeline (the
reference numbers likewise include per-run work after data load).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_WORST_S = 6.0   # Performance.xlsx GPU-LUT worst, bunny @0.05
REF_BEST_S = 0.05   # Performance.xlsx GPU-LUT best


def main():
    from goicp_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    from goicp_tpu.bnb import BnbParams, make_solver
    from goicp_tpu.io import load_cloud

    base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "bunny")
    src = load_cloud(os.path.join(base, "data_bunny.txt"), subsample=0.05, seed=0)
    tgt = load_cloud(os.path.join(base, "model_bunny.txt"), subsample=0.05, seed=0)

    params = BnbParams(
        mse_threshold=1e-3,       # test/bunny_goicp.toml mse_threshold
        grid_resolution=256,
        trans_span=0.5,           # jly translation cube (jly_goicp.cpp:50-53)
        max_rounds=2000,
    )

    def solve():
        t0 = time.perf_counter()
        res = make_solver(src, tgt, params).run()
        return time.perf_counter() - t0, res

    # warmup: populate jit caches (first TPU compile is 20-40 s)
    _, res0 = solve()
    times = []
    for _ in range(3):
        dt, res = solve()
        times.append(dt)
    wall = float(np.median(times))

    # the reference's SHIPPED scenario config (test/bunny_goicp.toml) uses
    # subsample 0.1; measure it too for context
    src1 = load_cloud(os.path.join(base, "data_bunny.txt"), subsample=0.1, seed=0)
    tgt1 = load_cloud(os.path.join(base, "model_bunny.txt"), subsample=0.1, seed=0)
    t0 = time.perf_counter()
    res1 = make_solver(src1, tgt1, params).run()
    wall_01 = time.perf_counter() - t0

    out = {
        "metric": "bunny_goicp_wall_s",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": round(REF_WORST_S / wall, 2),
        "detail": {
            "protocol": "subsample 0.05 (Performance.xlsx), full epsilon-"
                        "certification with CORRECT rotation radii; the "
                        "reference GPU's 0.05-6 s band rests on the |p|^2 "
                        "uncertainty bug (registration.cu:39-43); its CPU "
                        "solver (valid bounds) runs 10-35 s",
            "ref_best_s": REF_BEST_S,
            "ref_worst_s": REF_WORST_S,
            "ref_cpu_s": [10.0, 35.0],
            "runs_s": [round(t, 4) for t in times],
            "mse": res.mse,
            "converged": bool(res.converged),
            "gap": res.gap,
            "nodes": res.rot_nodes,
            "nodes_per_s": round(res.rot_nodes / max(res.wall_s, 1e-9)),
            "n_src": int(src.shape[0]),
            "n_tgt": int(tgt.shape[0]),
            "shipped_config_subsample01_wall_s": round(wall_01, 4),
            "shipped_config_subsample01_converged": bool(res1.converged),
            "shipped_config_subsample01_mse": res1.mse,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
