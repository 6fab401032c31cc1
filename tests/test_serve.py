"""Target-resident registration service (goicp_tpu/serve.py)."""

import io
import json
import socket
import threading
import time

import numpy as np
import pytest

from goicp_tpu.bnb import BnbParams
from goicp_tpu.serve import (
    Batcher,
    RegistrationService,
    handle_request,
    serve_stdio,
    serve_tcp,
)
from tests.conftest import random_rotation


PARAMS = BnbParams(
    mse_threshold=1e-4,
    grid_resolution=24,
    max_rounds=400,
    init_multistart=4,
    se3_pop=64,
)


@pytest.fixture(scope="module")
def service():
    rng = np.random.default_rng(7)
    tgt = (rng.random((120, 3)).astype(np.float32) - 0.5)
    return RegistrationService(tgt, PARAMS, name="unit-target")


def _query(service, rng, n=90):
    """A source that is a rigidly-moved target subsample + its GT pose."""
    Q = random_rotation(rng)
    t = (rng.random(3).astype(np.float32) - 0.5) * 0.3
    idx = rng.choice(service.tgt.shape[0], n, replace=False)
    # src such that src @ Q.T + t lands on the target subset
    src = ((service.tgt[idx] - t) @ Q).astype(np.float32)
    return src, Q, t


def test_register_single(service, rng):
    src, Q, t = _query(service, rng)
    res = service.register(src)
    assert res.converged
    assert np.allclose(np.asarray(res.transform.R), Q, atol=5e-3)
    assert np.allclose(np.asarray(res.transform.t), t, atol=5e-3)


def test_register_batch_matches_singles(service, rng):
    queries = [_query(service, rng, n=80) for _ in range(3)]
    batch = service.register_batch([q[0] for q in queries])
    assert len(batch) == 3
    for res, (src, Q, t) in zip(batch, queries):
        assert res.converged
        a = src @ np.asarray(res.transform.R).T + np.asarray(res.transform.t)
        b = src @ Q.T + t
        assert float(np.sqrt(np.mean(np.sum((a - b) ** 2, 1)))) < 5e-3


def test_param_override_whitelist(service, rng):
    src, _, _ = _query(service, rng)
    res = service.register(src, mse_threshold=1e-2)
    assert res.converged
    with pytest.raises(ValueError, match="forbidden"):
        service.register(src, engine="nested")


def test_handle_request_points_and_errors(service, rng):
    src, Q, t = _query(service, rng)
    resp = handle_request(
        service, {"id": 42, "points": src.tolist()}
    )
    assert resp["ok"] and resp["id"] == 42 and resp["converged"]
    assert np.allclose(np.array(resp["R"]), Q, atol=5e-3)

    bad = handle_request(service, {"id": 7, "source": "/nonexistent.ply"})
    assert bad == {"id": 7, "ok": False, "error": bad["error"]}
    assert "id" in bad and not bad["ok"]

    info = handle_request(service, {"cmd": "info"})
    assert info["ok"] and info["target_points"] == service.tgt.shape[0]


def test_handle_request_batch_isolates_bad_items(service, rng):
    g1, g2 = _query(service, rng, n=70), _query(service, rng, n=70)
    resp = handle_request(service, {"batch": [
        {"id": 1, "points": g1[0].tolist()},
        {"id": 2, "source": "/nope.ply"},
        {"id": 3, "points": g2[0].tolist()},
    ]})
    assert [r["id"] for r in resp] == [1, 2, 3]
    assert resp[0]["ok"] and resp[2]["ok"] and not resp[1]["ok"]
    assert resp[0]["converged"] and resp[2]["converged"]


def test_serve_stdio_roundtrip(service, rng):
    src, Q, t = _query(service, rng)
    lines = [
        json.dumps({"id": "a", "points": src.tolist()}),
        json.dumps({"cmd": "info"}),
        "this is not json",
        json.dumps({"cmd": "shutdown"}),
        json.dumps({"id": "never", "points": src.tolist()}),
    ]
    out = io.StringIO()
    n = serve_stdio(service, io.StringIO("\n".join(lines) + "\n"), out)
    resp = [json.loads(l) for l in out.getvalue().splitlines()]
    assert n == 2  # register + info; bad json answered but not counted
    assert resp[0]["ok"] and resp[0]["id"] == "a"
    assert resp[1]["ok"] and "target_points" in resp[1]
    assert not resp[2]["ok"]
    assert resp[3].get("shutdown") is True
    assert len(resp) == 4  # nothing served after shutdown


def test_tcp_concurrent_queries_microbatch(service, rng):
    ready = threading.Event()
    bound: list = []
    srv = threading.Thread(
        target=serve_tcp,
        kwargs=dict(service=service, port=0, max_batch=4, window_s=0.25,
                    ready=ready, bound=bound),
        daemon=True,
    )
    srv.start()
    assert ready.wait(10)
    port = bound[0]

    queries = [_query(service, rng, n=60) for _ in range(3)]
    results = [None] * 3

    def client(i):
        with socket.create_connection(("127.0.0.1", port), timeout=60) as s:
            f = s.makefile("rw")
            f.write(json.dumps(
                {"id": i, "points": queries[i][0].tolist()}) + "\n")
            f.flush()
            results[i] = json.loads(f.readline())

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    for th in threads:
        th.start()
        time.sleep(0.02)  # arrive within one gather window
    for th in threads:
        th.join(timeout=120)
    for i, r in enumerate(results):
        assert r is not None and r["ok"] and r["id"] == i, r
        src, Q, t = queries[i]
        a = src @ np.array(r["R"]).T + np.array(r["t"])
        b = src @ Q.T + t
        assert float(np.sqrt(np.mean(np.sum((a - b) ** 2, 1)))) < 5e-3

    with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
        f = s.makefile("rw")
        f.write(json.dumps({"cmd": "shutdown"}) + "\n")
        f.flush()
        assert json.loads(f.readline())["shutdown"] is True
    srv.join(timeout=10)


def test_batcher_groups_uniform_requests(service, rng):
    b = Batcher(service, max_batch=4, window_s=0.2)
    b.start()
    reqs = [
        {"id": i, "points": _query(service, rng, n=50)[0].tolist()}
        for i in range(3)
    ]
    pend = [b.submit(r) for r in reqs]
    for p in pend:
        assert p.event.wait(120)
        assert p.resp["ok"], p.resp
    assert 3 in b.batches  # the three uniform queries shared one lockstep
    b.stop()


def test_grid_reuse_matches_fresh_solver(service, rng):
    from goicp_tpu.bnb import make_solver

    src, Q, t = _query(service, rng)
    fresh = make_solver(src, service.tgt, PARAMS).run()
    reused = make_solver(src, service.tgt, PARAMS, grid=service.grid).run()
    assert np.allclose(
        np.asarray(fresh.transform.R), np.asarray(reused.transform.R),
        atol=1e-5,
    )
    assert np.allclose(
        np.asarray(fresh.transform.t), np.asarray(reused.transform.t),
        atol=1e-5,
    )


def test_warmup_runs(service):
    res = service.warmup(64)
    assert res.converged
