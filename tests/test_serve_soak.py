"""Serving resource-growth hardening (VERDICT r3 weak #2 / r4 item 3).

A TCP client controls query sizes, inline payload bytes, and whitelisted
float overrides.  None of those may grow server state without bound:

- shape bucketing → mixed-size queries reuse a handful of compiled
  executables (asserted on the lockstep/vmapped-ICP jit caches);
- the tracking-path cache is LRU-capped (mixed overrides can't retain one
  jitted closure per distinct float forever);
- ``max_points`` / ``max_line`` reject oversized requests with error
  records and the connection keeps serving.
"""

import json
import socket
import threading

import numpy as np
import pytest

from goicp_tpu.bnb import BnbParams
from goicp_tpu.serve import RegistrationService, serve_tcp
from tests.conftest import random_rotation


PARAMS = BnbParams(
    mse_threshold=1e-4,
    grid_resolution=24,
    max_rounds=400,
    init_multistart=4,
    se3_pop=64,
)


def _start_server(service, **kw):
    ready = threading.Event()
    bound: list = []
    th = threading.Thread(
        target=serve_tcp,
        args=(service,),
        kwargs=dict(port=0, ready=ready, bound=bound, window_s=0.01, **kw),
        daemon=True,
    )
    th.start()
    assert ready.wait(10)
    return bound[0]


class _Client:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=120)
        self.f = self.sock.makefile("rwb")

    def ask(self, req: dict) -> dict:
        self.f.write((json.dumps(req) + "\n").encode())
        self.f.flush()
        return json.loads(self.f.readline().decode())

    def close(self):
        try:
            self.f.close()
            self.sock.close()
        except OSError:
            pass


def test_soak_bounded_compiles_and_caches(rng):
    """Hundreds of mixed-size / mixed-override queries over TCP: compiled-
    executable counts stay bucket-bounded and the tracking cache stays at
    its LRU cap."""
    from goicp_tpu import multipair as mp

    tgt = (np.random.default_rng(7).random((120, 3)).astype(np.float32) - 0.5)
    svc = RegistrationService(
        tgt, PARAMS, name="soak", source_root="", icp_cache_size=4,
    )
    port = _start_server(svc)
    cli = _Client(port)
    try:
        mp._pairs_round.clear_cache()
        mp._icp_pairs_jit.clear_cache()

        def q(n):
            Q = random_rotation(rng)
            t = (rng.random(3).astype(np.float32) - 0.5) * 0.2
            idx = rng.choice(tgt.shape[0], n, replace=n > tgt.shape[0])
            return ((tgt[idx] - t) @ Q).astype(np.float32), Q, t

        # -- tracking soak: 200 queries, 40 distinct sizes × 10 distinct
        # wire overrides (each override is a tracking-cache key)
        sizes = [int(s) for s in rng.integers(40, 500, size=40)]
        for i in range(200):
            src, Q, t = q(sizes[i % len(sizes)])
            r = cli.ask({
                "id": i, "points": src.tolist(), "mode": "icp",
                "init": {"R": np.asarray(Q, np.float64).tolist(),
                         "t": np.asarray(t, np.float64).tolist()},
                "mse_threshold": 1e-4 * (1 + (i % 10)),
            })
            assert r["ok"], r
        assert len(svc._icp_cache) <= 4          # LRU cap held

        # -- goicp soak: mixed sizes all land in the 128-point bucket →
        # ONE lockstep executable family serves every query
        for i in range(12):
            src, Q, t = q(int(rng.integers(70, 128)))
            r = cli.ask({"id": 1000 + i, "points": src.tolist()})
            assert r["ok"] and r["converged"], r
        # one compiled round + one multistart executable for the whole
        # size mix (the point of bucketing); allow one extra entry for a
        # K!=default multistart variant
        assert mp._pairs_round._cache_size() <= 2, (
            mp._pairs_round._cache_size()
        )
        assert mp._icp_pairs_jit._cache_size() <= 3, (
            mp._icp_pairs_jit._cache_size()
        )

        # -- oversized inline points → error record, connection survives
        r = cli.ask({
            "id": "big",
            "points": [[0.0, 0.0, 0.0]] * (svc.max_points + 1),
        })
        assert not r["ok"] and "caps queries" in r["error"]
        src, _, _ = q(90)
        r = cli.ask({"id": "after", "points": src.tolist()})
        assert r["ok"]
    finally:
        try:
            cli.ask({"cmd": "shutdown"})
        except Exception:
            pass
        cli.close()


def test_max_line_cap_rejects_and_survives(rng):
    """A request line over the server's max_line cap is drained, refused
    with an error record, and the connection keeps serving."""
    tgt = (np.random.default_rng(3).random((100, 3)).astype(np.float32) - 0.5)
    svc = RegistrationService(tgt, PARAMS, name="line", source_root="")
    port = _start_server(svc, max_line=1 << 16)   # 64 KB cap
    cli = _Client(port)
    try:
        big = {"id": "x", "points": [[0.0, 0.0, 0.0]] * 20000}  # ~0.4 MB
        r = cli.ask(big)
        assert not r["ok"] and "exceeds" in r["error"]
        r = cli.ask({"cmd": "info"})
        assert r["ok"] and r["max_points"] == svc.max_points
    finally:
        try:
            cli.ask({"cmd": "shutdown"})
        except Exception:
            pass
        cli.close()


def test_bucketing_exact_vs_unbucketed(rng):
    """Bucket padding is EXACT: the same query solved with and without
    shape bucketing returns the same pose and sse."""
    tgt = (np.random.default_rng(5).random((110, 3)).astype(np.float32) - 0.5)
    a = RegistrationService(tgt, PARAMS, name="a", bucket_shapes=True)
    b = RegistrationService(tgt, PARAMS, name="b", bucket_shapes=False)
    Q = random_rotation(rng)
    t = (rng.random(3).astype(np.float32) - 0.5) * 0.2
    idx = rng.choice(110, 77, replace=False)
    src = ((tgt[idx] - t) @ Q).astype(np.float32)
    ra = a.register(src)
    rb = b.register(src)
    assert ra.converged and rb.converged
    pa = src @ np.asarray(ra.transform.R).T + np.asarray(ra.transform.t)
    pb = src @ np.asarray(rb.transform.R).T + np.asarray(rb.transform.t)
    assert float(np.abs(pa - pb).max()) < 1e-3
    # tracking path too
    fa = a.refine(src, ra.transform)
    fb = b.refine(src, rb.transform)
    assert abs(fa.sse - fb.sse) <= 1e-6 + 1e-3 * max(fa.sse, fb.sse)
