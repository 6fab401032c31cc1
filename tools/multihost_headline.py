"""Multi-host HEADLINE certification: a real-bunny full ε-certification
through ``GoIcpSolverMultiHost`` at 1, 2, and 4 Gloo processes
(VERDICT r4 item 2).

Every process is pinned to ONE core (``taskset``) — this box has 4 cores,
so the 1-process baseline gets the same per-host compute as each of the 4
distributed hosts and the ratios isolate the multihost protocol (lockstep
allgather cadence, root-partition skew, rebalancing), which is what
carries to real pods.  CPU Gloo allgather latency is 10²–10³× ICI, so
these efficiencies are LOWER bounds for TPU-pod efficiency.

``run_headline()`` re-executes the full 1/2/4 sweep and returns the
record ``bench.py`` embeds (fresh every bench run, never read from a
stale doc); asserts pose agreement with the single-host solve and gap 0.

Usage: python tools/multihost_headline.py [subsample] [mse_threshold]
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
WORKER = os.path.join(HERE, "multihost_bunny_worker.py")

SUBSAMPLE = 0.01       # 301 real bunny points — the largest subsample
                       # whose full certification fits a per-bench-run CPU
                       # budget (~190 s/core; see the worker docstring for
                       # why the data-vs-model pair itself is infeasible)
THRESHOLD = 2.6e-4     # just under the σ=0.01 noise-floor optimum
                       # (≈2.7e-4): convergence is via the gap rule —
                       # a pure ε-certification (~10^5 nodes)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(nproc: int, subsample: float, thr: float) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # each worker is pinned to ONE core: a multi-threaded XLA CPU
    # threadpool would just context-switch against itself
    env["XLA_FLAGS"] = (
        "--xla_cpu_multi_thread_eigen=false "
        + env.get("XLA_FLAGS", "")
    ).strip()
    env["OMP_NUM_THREADS"] = "1"
    # round quantum per configuration (measured sweep 2026-08-20, this
    # box): single-host prefers fat rounds (128·8 jobs/dispatch); the
    # distributed hosts prefer finer quanta (64) — partial rounds during
    # ramp-up/drain then waste less padded compute (the job-count buckets
    # in dist/multihost.py cap that waste at 256-node steps)
    env["GOICP_MH_POP"] = "128" if nproc == 1 else "64"
    port = _free_port()
    procs, outs = [], []
    t0 = time.perf_counter()
    for pid in range(nproc):
        out = f"/tmp/mh_headline_{nproc}_{pid}.json"
        if os.path.exists(out):
            os.remove(out)
        outs.append(out)
        cmd = [
            "taskset", "-c", str(pid),
            # the embedding process (bench.py + the TPU tunnel helper)
            # idles on subprocess.wait during the sweep but still steals
            # cycles on this 4-core box — measured ~15% 4-proc inflation
            # vs a standalone sweep.  Prioritize the pinned workers
            # (root, so negative nice is available; harmless otherwise).
            "nice", "-n", "-10",
            sys.executable, WORKER, str(pid), str(nproc), str(port), out,
            str(subsample), str(thr),
        ]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        ))
    for pr in procs:
        rc = pr.wait(timeout=1800)
        if rc != 0:
            raise RuntimeError(f"worker exited {rc} (nproc={nproc})")
    wall = time.perf_counter() - t0
    recs = [json.load(open(o)) for o in outs]
    assert all(r["converged"] for r in recs), recs
    # gap-rule convergence may legitimately leave a small positive gap
    # (<= the epsilon the certificate promises): the fused lockstep
    # gathers min_lb BEFORE the final incumbent prune, so stale in-flight
    # lbs in (best-eps, best] can survive into the reported gap
    assert all(
        r["gap"] <= thr * r["n_src"] + 1e-6 for r in recs
    ), [r["gap"] for r in recs]
    # every process of one run must report the identical exchanged pose
    for r in recs[1:]:
        assert r["R"] == recs[0]["R"] and r["t"] == recs[0]["t"]
    total_nodes = sum(r["local_nodes"] for r in recs)
    solver_wall = max(r["solver_wall_s"] for r in recs)
    out = {
        "processes": nproc,
        "total_wall_s": round(wall, 2),          # incl. startup/compiles
        "solver_wall_s": round(solver_wall, 2),  # the scaling quantity
        "total_nodes": total_nodes,
        "nodes_per_s": round(total_nodes / solver_wall, 1),
        "node_split": [r["local_nodes"] for r in recs],
        "rebalances": max(r["rebalances"] for r in recs),
        "n_src": recs[0]["n_src"],
        "mse": recs[0]["mse"],
        "gap": recs[0]["gap"],
        "rmse_vs_gt": recs[0]["rmse_vs_gt"],
        "R": recs[0]["R"],
        "t": recs[0]["t"],
    }
    if nproc > 1 and "phases" in recs[0]:
        # per-phase wall breakdown, MEAN over hosts (VERDICT r4 item 1):
        # dispatch = host-side expansion, absorb = device wait, gather =
        # allgather barrier incl. straggler skew, rebalance = exchange
        out["phases_mean_s"] = {
            k.replace("mh_", "").replace("_s", ""): round(
                sum(r["phases"][k] for r in recs) / nproc, 2
            )
            for k in recs[0]["phases"]
        }
        out["lockstep_iters"] = recs[0]["lockstep_iters"]
        out["starved_round_frac"] = round(
            sum(r["starved_rounds"] for r in recs)
            / max(sum(r["rounds"] for r in recs), 1), 3,
        )
        jobs = sum(r["jobs"] for r in recs)
        padded = sum(r["padded_jobs"] for r in recs)
        out["padded_waste_frac"] = round(1.0 - jobs / max(padded, 1), 3)
        out["nodes_per_iter"] = round(
            total_nodes / max(recs[0]["lockstep_iters"], 1), 1
        )
    return out


def run_headline(subsample: float = SUBSAMPLE, thr: float = THRESHOLD) -> dict:
    import numpy as np

    def _median_of_three(nproc):
        # the certification is deterministic per configuration, so the
        # run-to-run spread is OS noise on this shared box.  MEDIAN of 3
        # with the spread recorded — a best-of-N convention can cherry-pick
        # exactly the variance this record exists to expose (VERDICT r4
        # weak #1), so the bench-of-record quantity is the median wall,
        # applied symmetrically to every configuration incl. the baseline
        runs = sorted(
            (_run(nproc, subsample, thr) for _ in range(3)),
            key=lambda r: r["solver_wall_s"],
        )
        med = runs[1]
        med["wall_spread_s"] = [
            runs[0]["solver_wall_s"], runs[2]["solver_wall_s"]
        ]
        return med

    # when embedded in bench.py the parent (and its TPU-tunnel helper
    # threads) idles on subprocess.wait but still competes for the 4
    # cores the workers are pinned to; deprioritize it for the sweep
    # (workers additionally run at nice -10 — see _run)
    prio0 = os.getpriority(os.PRIO_PROCESS, 0)
    try:
        os.setpriority(os.PRIO_PROCESS, 0, 19)
    except OSError:
        prio0 = None
    try:
        rows = [_median_of_three(p) for p in (1, 2, 4)]
    finally:
        if prio0 is not None:
            try:
                os.setpriority(os.PRIO_PROCESS, 0, prio0)
            except OSError:
                pass
    base = rows[0]
    out = {
        "workload": (
            f"real bunny scan @ subsample {subsample} "
            f"({json.load(open('/tmp/mh_headline_1_0.json'))['n_src']} pts), "
            f"rigid+noise target, FULL epsilon-certification to convergence "
            f"(gap rule; thr {thr} < noise-floor optimum) through "
            f"GoIcpSolverMultiHost; 1 core per process (4-core box), "
            f"CPU Gloo — efficiencies are LOWER bounds for ICI pods"
        ),
        "mse": base["mse"],
        "gap": base["gap"],
        "rmse_vs_gt": base["rmse_vs_gt"],
        "wall_1_s": base["solver_wall_s"],
        "gap_le_eps": all(
            r["gap"] <= thr * r["n_src"] + 1e-6 for r in rows
        ),
        "rows": [
            {k: r[k] for k in (
                "processes", "total_wall_s", "solver_wall_s", "wall_spread_s",
                "total_nodes", "nodes_per_s", "node_split", "rebalances",
                "phases_mean_s", "lockstep_iters", "starved_round_frac",
                "padded_waste_frac", "nodes_per_iter",
            ) if k in r}
            for r in rows
        ],
    }
    # pose identity vs the single-host solve: the certified pose must agree
    # across 1/2/4 processes (within the f32 refine tolerance of the
    # shared basin — the certification admits any pose with sse within ε)
    R1 = np.array(base["R"])
    pose_ok = True
    for r in rows[1:]:
        out[f"wall_{r['processes']}_s"] = r["solver_wall_s"]
        dR = float(np.abs(np.array(r["R"]) - R1).max())
        dmse = abs(r["mse"] - base["mse"]) / max(base["mse"], 1e-30)
        out[f"pose_dR_{r['processes']}"] = round(dR, 6)
        pose_ok = pose_ok and dR < 5e-3 and dmse < 0.02
        out[f"efficiency_{r['processes']}"] = round(
            r["nodes_per_s"] / (r["processes"] * base["nodes_per_s"]), 2
        )
        out[f"tts_speedup_{r['processes']}"] = round(
            base["solver_wall_s"] / r["solver_wall_s"], 2
        )
    out["pose_identical"] = pose_ok
    assert pose_ok, out
    return out


if __name__ == "__main__":
    sub = float(sys.argv[1]) if len(sys.argv) > 1 else SUBSAMPLE
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else THRESHOLD
    print(json.dumps(run_headline(sub, thr), indent=1))
