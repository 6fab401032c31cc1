"""End-to-end scenario runs through the CLI (integration fixtures, SURVEY §4)."""

import os
import tomllib

import numpy as np
import pytest

from goicp_tpu.cli import run_scenario
from goicp_tpu.io.ply import read_ply, write_ply
from goicp_tpu.io.txt import write_txt
from tests.conftest import random_rotation


@pytest.fixture
def synth_scenario(tmp_path, rng):
    """Tiny synthetic scene with known ground truth, written as TOML+data."""
    src = (rng.random((300, 3)).astype(np.float32) - 0.5) * 0.6
    R = random_rotation(rng)
    t = np.array([0.1, -0.08, 0.12], np.float32)
    tgt = (src @ R.T + t).astype(np.float32)
    write_txt(tmp_path / "source.txt", src)
    write_ply(tmp_path / "target.ply", tgt)

    def write_cfg(mode, extra=""):
        cfg = tmp_path / f"scene_m{mode}.toml"
        cfg.write_text(
            f"""
[io]
target = "target.ply"
source = "source.txt"
output = "output.toml"
visualization = "viz.ply"

[params]
mode = {mode}
subsample = 1.0
mse_threshold = 1e-5
resize = 1.0

[params.translation]
xmin = -0.5
xmax = 0.5
ymin = -0.5
ymax = 0.5
zmin = -0.5
zmax = 0.5

[tpu]
grid_resolution = 64
rot_batch = 2
{extra}
"""
        )
        return cfg, (R, t, src, tgt)

    return write_cfg


def _check(out, R, t, src, tgt, tol=5e-3):
    pts = src @ out["R"].T + out["t"]
    rmse = float(np.sqrt(np.mean(np.sum((pts - tgt) ** 2, axis=1))))
    assert rmse < tol, rmse


@pytest.mark.parametrize("mode", [4, 3])
def test_cli_goicp_modes(synth_scenario, tmp_path, mode):
    cfg, (R, t, src, tgt) = synth_scenario(mode)
    out = run_scenario(str(cfg), output_dir=str(tmp_path / "out"))
    assert out["converged"]
    _check(out, R, t, src, tgt)
    # artifacts: result TOML parses, viz PLY re-reads with matching count
    with open(out["output_toml"], "rb") as f:
        doc = tomllib.load(f)
    assert doc["mode"] == mode
    assert np.allclose(np.array(doc["result"]["rotation"]), out["R"], atol=1e-5)
    viz = read_ply(out["viz_ply"])
    assert viz.shape[0] == src.shape[0] + tgt.shape[0]


def test_cli_icp_mode_small_pose(tmp_path, rng):
    """Modes 0/1/2 are local ICP: use a small perturbation."""
    src = (rng.random((300, 3)).astype(np.float32) - 0.5) * 0.6
    from goicp_tpu.geo.rotation import axis_angle_rotation
    import jax.numpy as jnp

    v = np.array([0.05, -0.1, 0.08], np.float32)
    R = np.asarray(axis_angle_rotation(jnp.asarray(v)))
    t = np.array([0.02, 0.01, -0.03], np.float32)
    tgt = (src @ R.T + t).astype(np.float32)
    write_txt(tmp_path / "source.txt", src)
    write_ply(tmp_path / "target.ply", tgt)
    for mode in (0, 1, 2):
        cfg = tmp_path / f"icp_m{mode}.toml"
        cfg.write_text(
            f"""
[io]
target = "target.ply"
source = "source.txt"

[params]
mode = {mode}
mse_threshold = 1e-6

[tpu]
grid_resolution = 64
"""
        )
        out = run_scenario(str(cfg), output_dir=str(tmp_path / f"out{mode}"))
        _check(out, R, t, src, tgt, tol=1e-2 if mode == 2 else 5e-3)
        # ICP modes now record the per-iteration animation (≙ the
        # reference's frame-per-iteration loop): trajectory + HTML replay
        outdir = tmp_path / f"out{mode}"
        assert (outdir / "trajectory.csv").exists()
        assert (outdir / "viz.html").exists()
        n_rows = len((outdir / "trajectory.csv").read_text().splitlines())
        assert n_rows >= 3  # header + >=2 real iterations


def test_cli_icp_stall_reports_not_converged(tmp_path, rng):
    """An ICP that stalls in a local minimum above mse_threshold must report
    converged=False (≙ main.cpp:125-135 — only the threshold is success;
    the old `iters < max_iter` disjunct called any early stop a success)."""
    src = (rng.random((200, 3)).astype(np.float32) - 0.5) * 0.6
    tgt = (rng.random((200, 3)).astype(np.float32) - 0.5) * 0.6  # unrelated
    write_txt(tmp_path / "source.txt", src)
    write_ply(tmp_path / "target.ply", tgt)
    cfg = tmp_path / "stall.toml"
    cfg.write_text(
        """
[io]
target = "target.ply"
source = "source.txt"

[params]
mode = 1
mse_threshold = 1e-12
"""
    )
    out = run_scenario(str(cfg), output_dir=str(tmp_path / "out_stall"))
    assert out["mse"] > 1e-12
    assert out["converged"] is False


def test_render_png(tmp_path, rng):
    from goicp_tpu.viz import render_png

    tgt = rng.random((200, 3)).astype(np.float32)
    src = rng.random((150, 3)).astype(np.float32)
    p = str(tmp_path / "snap.png")
    render_png(p, tgt, src, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    import os

    assert os.path.getsize(p) > 1000


def test_top_level_register_api(rng):
    import goicp_tpu

    src = (rng.random((120, 3)).astype(np.float32) - 0.5) * 0.6
    res = goicp_tpu.register(src, src, mse_threshold=1e-4, se3_pop=32, max_rounds=20)
    assert res.converged and res.mse < 1e-4


def test_metrics_artifact(synth_scenario, tmp_path):
    import json

    cfg, _ = synth_scenario(4)
    out = run_scenario(str(cfg), output_dir=str(tmp_path / "outm"))
    mpath = tmp_path / "outm" / "metrics.json"
    assert mpath.exists()
    doc = json.loads(mpath.read_text())
    assert any(k.startswith("time_s/") for k in doc)


def test_cli_full_cert_knob(synth_scenario, tmp_path):
    """[tpu] full_cert routes mode-4 solves through the adaptive full-cloud
    certification loop; the output TOML carries gap_full ≤ the target."""
    cfg, (R, t, src, tgt) = synth_scenario(
        4, extra="full_cert = true\nse3_pop = 64\n"
    )
    # cap the solve subset so the certificate actually transfers
    text = cfg.read_text().replace(
        "[tpu]", "[tpu]\nbound_backend = \"exact\"\n"
    )
    cfg.write_text(text)
    import goicp_tpu.cli as cli_mod

    out = run_scenario(str(cfg), output_dir=str(tmp_path / "out"))
    assert out["converged"]
    _check(out, R, t, src, tgt)
    # uncapped solve (300 pts < bound_points): passthrough fills the
    # certificate fields directly
    assert out["gap_full"] is not None
    assert out["gap_full"] <= 1e-5 * src.shape[0] + 1e-9
