"""LiveSnapshotter: periodic registration snapshots from solver progress.

The headless counterpart of the reference's live render loop, which redraws
the incumbent (red) and currently-explored (white) poses every frame
(``goicp_kernel.cu:152-206``, ``kernel.cu:114-118``).
"""

import glob
import os

import numpy as np

from goicp_tpu.core.progress import ProgressBus, SolverState
from goicp_tpu.io.ply import read_ply
from goicp_tpu.viz import LiveSnapshotter


def _state(rnd, finished=False):
    return SolverState(
        opt_R=np.eye(3, dtype=np.float32),
        opt_t=np.zeros(3, np.float32),
        cur_R=np.eye(3, dtype=np.float32),
        cur_t=np.full(3, 0.1, np.float32),
        best_sse=1.0,
        gap=0.5,
        finished=finished,
        rot_nodes=rnd,
        trans_nodes=rnd,
        round=rnd,
    )


def test_live_snapshotter_writes_readable_plys(tmp_path):
    tgt = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    src = np.random.default_rng(1).normal(size=(40, 3)).astype(np.float32)
    bus = ProgressBus()
    snap = LiveSnapshotter(bus, str(tmp_path / "snaps"), tgt, src, every_s=0.0)

    for r in range(3):
        bus.publish(_state(r))
    bus.publish(_state(3, finished=True))

    paths = sorted(glob.glob(str(tmp_path / "snaps" / "snap_r*.ply")))
    assert len(paths) == 4
    assert snap.paths == paths

    # in-progress snapshot: model + incumbent + current (white) clouds
    rows = read_ply(paths[0], properties=("x", "y", "z", "red", "green", "blue"))
    assert rows.shape[0] == 50 + 40 + 40
    assert (rows[-1, 3:] == 240).all()

    # final snapshot drops the in-progress cloud (ref: white cloud stops
    # once goicp_finished flips, goicp_kernel.cu:189-199)
    rows = read_ply(paths[-1])
    assert rows.shape[0] == 50 + 40


def test_live_snapshotter_throttles(tmp_path):
    tgt = np.zeros((5, 3), np.float32)
    src = np.zeros((4, 3), np.float32)
    bus = ProgressBus()
    LiveSnapshotter(bus, str(tmp_path / "s"), tgt, src, every_s=3600.0,
                    html=False)
    for r in range(10):
        bus.publish(_state(r))
    # first publish fires (initial _last=0), the rest are throttled
    assert len(os.listdir(tmp_path / "s")) == 1
    # ...but the terminal state always writes
    bus.publish(_state(10, finished=True))
    assert len(os.listdir(tmp_path / "s")) == 2


def test_live_snapshotter_live_html(tmp_path):
    """live.html self-reloads while the solve runs and becomes the final
    interactive replay (no reload tag) when it finishes."""
    tgt = np.random.default_rng(0).normal(size=(30, 3)).astype(np.float32)
    src = np.random.default_rng(1).normal(size=(20, 3)).astype(np.float32)
    bus = ProgressBus()
    snap = LiveSnapshotter(bus, str(tmp_path / "s"), tgt, src, every_s=0.0)

    bus.publish(_state(0))
    live = tmp_path / "s" / "live.html"
    mid = live.read_text()
    assert 'http-equiv="refresh"' in mid

    bus.publish(_state(1))
    bus.publish(_state(2, finished=True))
    final = live.read_text()
    assert 'http-equiv="refresh"' not in final
    # the full trajectory (all publishes, throttled or not) is embedded
    assert '"round":2' in final and '"round":0' in final
    assert len(snap.states) == 3
    assert not live.with_name("live.html.tmp").exists()


def test_live_snapshotter_finished_beats_snapshot_cap(tmp_path):
    """The terminal state must write (and drop live.html's reload tag) even
    after max_snapshots is reached."""
    tgt = np.zeros((6, 3), np.float32)
    src = np.zeros((4, 3), np.float32)
    bus = ProgressBus()
    LiveSnapshotter(bus, str(tmp_path / "s"), tgt, src, every_s=0.0,
                    max_snapshots=2)
    for r in range(5):
        bus.publish(_state(r))
    live = tmp_path / "s" / "live.html"
    assert 'http-equiv="refresh"' in live.read_text()  # capped mid-solve
    bus.publish(_state(5, finished=True))
    assert 'http-equiv="refresh"' not in live.read_text()


def test_render_html_replay(tmp_path):
    """The interactive HTML replay (C20: the reference's live window, made
    headless): self-contained file embedding clouds + trajectory."""
    import json
    import re

    import numpy as np

    from goicp_tpu.core.progress import SolverState
    from goicp_tpu.viz import render_html

    rng = np.random.default_rng(3)
    tgt = rng.random((500, 3)).astype(np.float32)
    src = rng.random((400, 3)).astype(np.float32)
    states = [
        SolverState(
            opt_R=np.eye(3, dtype=np.float32),
            opt_t=np.float32([0.1 * k, 0, 0]),
            cur_R=np.eye(3, dtype=np.float32),
            cur_t=np.zeros(3, np.float32),
            best_sse=1.0 / (k + 1),
            gap=0.5 / (k + 1),
            finished=k == 9,
            rot_nodes=100 * k,
            trans_nodes=100 * k,
            round=k,
        )
        for k in range(10)
    ]
    path = tmp_path / "viz.html"
    render_html(str(path), tgt, src, states)
    html = path.read_text()
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "embedded DATA not found"
    data = json.loads(m.group(1))
    assert len(data["traj"]) == 10
    assert data["traj"][-1]["round"] == 9
    assert len(data["target"]) == 3 * min(500, 4000)
    assert "canvas" in html and "slider" in html
