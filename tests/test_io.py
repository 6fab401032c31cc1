import numpy as np
import pytest

from goicp_tpu.io import (
    load_cloud,
    read_ply,
    read_txt,
    write_ply,
    write_txt,
    write_result_toml,
)
from goicp_tpu.io.loader import subsample_cloud

REF_DATA = "/root/reference/data"


def test_ply_roundtrip_binary(tmp_path, rng):
    pts = rng.normal(size=(257, 3)).astype(np.float32)
    p = tmp_path / "c.ply"
    write_ply(str(p), pts, binary=True)
    out = read_ply(str(p))
    np.testing.assert_array_equal(out, pts)


def test_ply_roundtrip_ascii_with_colors(tmp_path, rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    cols = rng.integers(0, 255, size=(64, 3)).astype(np.uint8)
    p = tmp_path / "c.ply"
    write_ply(str(p), pts, colors=cols, binary=False)
    out = read_ply(str(p))
    np.testing.assert_allclose(out, pts, atol=1e-5)


def test_txt_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    p = tmp_path / "c.txt"
    write_txt(str(p), pts)
    out = read_txt(str(p))
    np.testing.assert_allclose(out, pts, atol=1e-5)


def test_reference_txt_clouds():
    pts = read_txt(f"{REF_DATA}/bunny/model_bunny.txt")
    assert pts.shape == (35947, 3)  # header count, BASELINE.md scene sizes
    pts = read_txt(f"{REF_DATA}/bunny/data_bunny.txt")
    assert pts.shape == (30379, 3)


def test_reference_binary_ply_with_colors():
    # binary_little_endian + uchar rgb properties (data_skull.ply header)
    pts = read_ply(f"{REF_DATA}/artec3d/data_skull.ply")
    assert pts.shape == (98359, 3)
    assert np.isfinite(pts).all()


def test_reference_ascii_ply():
    # ascii + extra vertex properties (confidence/intensity) + range_grid
    # list element after the vertices (bun000.ply)
    pts = read_ply(f"{REF_DATA}/bunny/bun000.ply")
    assert pts.shape == (40256, 3)
    assert np.isfinite(pts).all()
    # sanity: bunny is ~0.15 units tall
    assert 0.05 < pts[:, 1].max() - pts[:, 1].min() < 0.5


def test_subsample_cap_and_determinism(rng):
    pts = rng.normal(size=(10000, 3)).astype(np.float32)
    a = subsample_cloud(pts, 0.1, seed=7)
    b = subsample_cloud(pts, 0.1, seed=7)
    np.testing.assert_array_equal(a, b)
    assert a.shape[0] <= 1000  # cap at floor(n*subsample), common.cpp:115
    assert a.shape[0] > 800  # Bernoulli(0.1) of 10k is near 1000


def test_load_cloud_resize(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    p = tmp_path / "c.txt"
    write_txt(str(p), pts)
    out = load_cloud(str(p), resize=15.0)
    np.testing.assert_allclose(out, pts * 15.0, atol=1e-4)


def test_result_toml_roundtrip(tmp_path):
    import tomllib

    path = tmp_path / "output.toml"
    R = np.eye(3)
    write_result_toml(
        str(path), R, np.array([1.0, 2.0, 3.0]), mse=1e-4, sse=0.3,
        rot_nodes=5, trans_nodes=10, wall_s=1.5, extra={"scenario": "bunny"},
    )
    with open(path, "rb") as f:
        doc = tomllib.load(f)
    np.testing.assert_allclose(doc["result"]["rotation"], R)
    np.testing.assert_allclose(doc["result"]["translation"], [1.0, 2.0, 3.0])
    assert doc["stats"]["trans_nodes"] == 10
    assert doc["extra"]["scenario"] == "bunny"
