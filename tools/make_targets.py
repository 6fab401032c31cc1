"""Generate derived scenario clouds with KNOWN ground-truth transforms.

Counterpart of the reference's ``transform_target.py`` (random SO(3) rotation
and/or Gaussian noise sigma=0.5 applied to a model cloud,
``transform_target.py:12-31,39-91``) — but deterministic (fixed seed) and with
the applied pose written to a sidecar TOML, so scenario runs can report RMSE
against ground truth (SURVEY §4: data-level correctness fixtures).

Reads from ``data/`` (read-only reference symlink), writes to
``data_generated/``.  Run: ``python tools/make_targets.py``.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from goicp_tpu.io.ply import read_ply, write_ply

ROOT = os.path.normpath(os.path.join(os.path.dirname(__file__), ".."))
OUT = os.path.join(ROOT, "data_generated")


def rot_xyz(ax: float, ay: float, az: float) -> np.ndarray:
    cx, sx, cy, sy, cz, sz = (
        np.cos(ax), np.sin(ax), np.cos(ay), np.sin(ay), np.cos(az), np.sin(az)
    )
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (Rz @ Ry @ Rx).astype(np.float32)


def make(name: str, src_rel: str, R: np.ndarray, t: np.ndarray, noise_std: float, seed: int):
    pts = read_ply(os.path.join(ROOT, "data", src_rel))
    out = pts @ R.T + t
    if noise_std > 0:
        rng = np.random.default_rng(seed)
        out = out + rng.normal(0.0, noise_std, out.shape).astype(np.float32)
    path = os.path.join(OUT, name)
    write_ply(path, out.astype(np.float32), comment=f"generated from {src_rel}")
    gt = os.path.splitext(path)[0] + "_gt.toml"
    with open(gt, "w") as f:
        f.write(f'source = "{src_rel}"\nnoise_std = {noise_std!r}\nseed = {seed}\n')
        f.write("# applied: target = R @ source + t\nrotation = [\n")
        for row in R:
            f.write(f"  [{float(row[0])!r}, {float(row[1])!r}, {float(row[2])!r}],\n")
        f.write(f"]\ntranslation = [{float(t[0])!r}, {float(t[1])!r}, {float(t[2])!r}]\n")
    print(f"wrote {path} ({out.shape[0]} pts) + {os.path.basename(gt)}")


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(2024)
    # face: "flipped model" target — 180° about y plus a small tilt
    make(
        "flipped_model_face.ply",
        "artec3d/data_face.ply",
        rot_xyz(0.15, np.pi, -0.1),
        np.array([5.0, -3.0, 8.0], np.float32),
        0.0,
        seed=1,
    )
    # spanner: source cloud posed away from the (existing) noisy flipped target
    make(
        "model_spanner.ply",
        "artec3d/flipped_model_spanner.ply",
        rot_xyz(*rng.uniform(0, 2 * np.pi, 3)),
        np.array([2.0, 1.0, -4.0], np.float32),
        0.0,
        seed=2,
    )
    # skull: the reference scenario's model_skull.ply is not shipped in
    # data/; regenerate it as a known rigid transform of the data scan
    make(
        "model_skull.ply",
        "artec3d/data_skull.ply",
        rot_xyz(*rng.uniform(0, 2 * np.pi, 3)),
        np.array([-8.0, 12.0, 5.0], np.float32),
        0.0,
        seed=4,
    )
    # bunny PLY pair with exact ground truth (for RMSE regression tests)
    make(
        "rotated_bunny.ply",
        "bunny/bun000.ply",
        rot_xyz(*rng.uniform(0, 2 * np.pi, 3)),
        np.array([0.03, -0.02, 0.05], np.float32),
        0.0,
        seed=3,
    )
    # dragon: the reference ships the Stanford dragon scans but never uses
    # them (no test/*.toml references data/dragon) — a 6th scenario with
    # exact ground truth extends the coverage matrix
    make(
        "rotated_dragon.ply",
        "dragon/dragonClearSpace2_0.ply",
        rot_xyz(*rng.uniform(0, 2 * np.pi, 3)),
        np.array([0.05, -0.04, 0.06], np.float32),
        0.0,
        seed=5,
    )


if __name__ == "__main__":
    main()
