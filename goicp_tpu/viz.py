"""Visualization artifacts — the TPU replacement for the OpenGL window.

The reference renders model=blue, data=red, in-progress=white point clouds
live (``src/kernel.cu:114-118``, ``src/window.cpp:182-227``).  A TPU run is
headless; the same information is written as colored PLY snapshots that any
viewer (MeshLab/CloudCompare/Open3D) displays, plus an optional pose
trajectory recorded from solver progress snapshots.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from goicp_tpu.core.progress import ProgressBus, SolverState
from goicp_tpu.io.ply import write_ply

# ≙ the reference's color assignment (kernel.cu:114-118)
COLOR_MODEL = np.array([64, 96, 255], np.uint8)    # target / model: blue
COLOR_DATA = np.array([255, 64, 64], np.uint8)     # registered source: red
COLOR_CURRENT = np.array([240, 240, 240], np.uint8)  # in-progress pose: white


def write_registration_ply(
    path: str,
    target: np.ndarray,
    source: np.ndarray,
    R: np.ndarray,
    t: np.ndarray,
    cur_R: Optional[np.ndarray] = None,
    cur_t: Optional[np.ndarray] = None,
):
    """Write target + transformed source (+ optional in-progress pose)."""
    target = np.asarray(target, np.float32)
    source = np.asarray(source, np.float32)
    moved = source @ np.asarray(R, np.float32).T + np.asarray(t, np.float32)
    clouds = [target, moved]
    colors = [
        np.tile(COLOR_MODEL, (target.shape[0], 1)),
        np.tile(COLOR_DATA, (moved.shape[0], 1)),
    ]
    if cur_R is not None:
        cur = source @ np.asarray(cur_R, np.float32).T + np.asarray(
            cur_t, np.float32
        )
        clouds.append(cur)
        colors.append(np.tile(COLOR_CURRENT, (cur.shape[0], 1)))
    write_ply(
        path,
        np.concatenate(clouds),
        np.concatenate(colors),
        comment="goicp_tpu registration (blue=model red=data white=current)",
    )


def render_png(
    path: str,
    target: np.ndarray,
    source: np.ndarray,
    R: np.ndarray,
    t: np.ndarray,
    phi: float = 0.4,
    theta: float = 0.0,
    max_points: int = 20000,
):
    """Static orthographic snapshot (matplotlib) — the headless stand-in for
    the reference's GL window (`window.cpp:182-227`); ``phi``/``theta`` match
    the TOML ``[visualization]`` camera angles (`common.cpp:60-66`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    target = np.asarray(target, np.float32)
    moved = np.asarray(source, np.float32) @ np.asarray(R, np.float32).T + np.asarray(
        t, np.float32
    )

    def thin(c):
        if c.shape[0] > max_points:
            return c[:: c.shape[0] // max_points + 1]
        return c

    cp, ct = np.cos(phi), np.cos(theta)
    sp, st = np.sin(phi), np.sin(theta)
    Ry = np.array([[ct, 0, st], [0, 1, 0], [-st, 0, ct]], np.float32)
    Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]], np.float32)
    cam = Rx @ Ry
    fig, ax = plt.subplots(figsize=(8, 6), dpi=110)
    for cloud, color, label, size in (
        (thin(target), "#4060ff", "model", 2.0),
        (thin(moved), "#ff4040", "registered data", 2.0),
    ):
        p = cloud @ cam.T
        ax.scatter(p[:, 0], p[:, 1], s=size, c=color, label=label, linewidths=0)
    ax.set_aspect("equal")
    ax.axis("off")
    ax.legend(loc="upper right", frameon=False)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


class LiveSnapshotter:
    """Periodic registration snapshots while the solver runs — the headless
    form of the reference's live render loop, which draws the incumbent
    (red) and currently-explored (white) poses every frame
    (``goicp_kernel.cu:152-206``, ``kernel.cu:114-118``).

    Subscribes to the :class:`ProgressBus`; at most one snapshot per
    ``every_s`` seconds of wall time (the render thread's poll cadence,
    decoupled from round rate) it writes ``snap_rNNNNN.ply`` — model blue,
    incumbent red, current white — into ``directory``, plus an optional PNG.
    Writing happens on the host between rounds; the device pipeline never
    blocks on it.
    """

    def __init__(
        self,
        bus: ProgressBus,
        directory: str,
        target: np.ndarray,
        source: np.ndarray,
        every_s: float = 2.0,
        png: bool = False,
        max_snapshots: int = 200,
    ):
        import os
        import time

        self._os, self._time = os, time
        self.dir = directory
        self.target = np.asarray(target, np.float32)
        self.source = np.asarray(source, np.float32)
        self.every_s = every_s
        self.png = png
        self.max_snapshots = max_snapshots
        self.paths: list[str] = []
        self._last = 0.0   # first publish always fires
        bus.subscribe(self._on_state)

    def _on_state(self, s: SolverState):
        now = self._time.perf_counter()
        if (
            (now - self._last < self.every_s and not s.finished)
            or len(self.paths) >= self.max_snapshots
        ):
            return
        self._last = now
        self._os.makedirs(self.dir, exist_ok=True)
        path = self._os.path.join(self.dir, f"snap_r{s.round:05d}.ply")
        write_registration_ply(
            path, self.target, self.source, s.opt_R, s.opt_t,
            cur_R=None if s.finished else s.cur_R,
            cur_t=None if s.finished else s.cur_t,
        )
        self.paths.append(path)
        if self.png:
            try:
                render_png(
                    self._os.path.splitext(path)[0] + ".png",
                    self.target, self.source, s.opt_R, s.opt_t,
                )
            except Exception:   # matplotlib optional
                pass


class TrajectoryRecorder:
    """Subscribes to solver progress; keeps the pose/error trajectory
    (the headless counterpart of watching the white cloud converge)."""

    def __init__(self, bus: ProgressBus):
        self.states: list[SolverState] = []
        bus.subscribe(self.states.append)

    def dump_csv(self, path: str):
        with open(path, "w") as f:
            f.write("round,best_sse,gap,rot_nodes,trans_nodes\n")
            for s in self.states:
                f.write(
                    f"{s.round},{s.best_sse!r},{s.gap!r},{s.rot_nodes},{s.trans_nodes}\n"
                )
