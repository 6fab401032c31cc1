"""NN backends vs numpy oracles (SURVEY §4: DT/LUT field vs exact)."""

import numpy as np
import jax.numpy as jnp
import pytest

from goicp_tpu.nn.brute import min_dist_sq, nearest_neighbor
from goicp_tpu.nn.grid import (
    build_distance_grid,
    distance_bounds,
    lookup_index,
    lookup_sq_nearest,
    lookup_sq_trilinear,
)


def _oracle_min_d2(q, t):
    d = q[:, None, :] - t[None, :, :]
    return np.sum(d * d, axis=-1).min(1)


def test_brute_nn_matches_oracle(rng):
    q = rng.normal(size=(64, 3)).astype(np.float32)
    t = rng.normal(size=(777, 3)).astype(np.float32)  # non-multiple of tile
    d2 = np.asarray(min_dist_sq(jnp.asarray(q), jnp.asarray(t)))
    ref = _oracle_min_d2(q, t)
    assert np.allclose(d2, ref, rtol=1e-5, atol=1e-6)
    d2b, idx = nearest_neighbor(jnp.asarray(q), jnp.asarray(t))
    assert np.allclose(np.asarray(d2b), ref, rtol=1e-5, atol=1e-6)
    picked = t[np.asarray(idx)]
    dd = np.sum((q - picked) ** 2, axis=-1)
    assert np.allclose(dd, ref, rtol=1e-5, atol=1e-6)


def test_brute_grid_exact_at_cell_centers(rng):
    t = (rng.random((123, 3)).astype(np.float32) - 0.5)
    g = build_distance_grid(t, n=32, method="brute", with_index=True)
    n = g.n
    cell = float(g.cell)
    origin = np.asarray(g.origin)
    ii = rng.integers(0, n, size=(40, 3))
    centers = origin + (ii + 0.5) * cell
    ref = _oracle_min_d2(centers.astype(np.float32), t)
    vals = np.asarray(g.values)[ii[:, 0], ii[:, 1], ii[:, 2]]
    assert np.allclose(vals, ref, rtol=1e-4, atol=1e-6)
    idxs = np.asarray(g.indices)[ii[:, 0], ii[:, 1], ii[:, 2]]
    picked = t[idxs]
    dd = np.sum((centers - picked) ** 2, axis=-1)
    assert np.allclose(dd, ref, rtol=1e-4, atol=1e-6)


def test_edt_matches_brute_within_raster_err(rng):
    t = (rng.random((200, 3)).astype(np.float32) - 0.5)
    gb = build_distance_grid(t, n=48, method="brute")
    ge = build_distance_grid(t, n=48, method="edt", with_index=True)
    assert ge.raster_err > 0
    db = np.sqrt(np.maximum(np.asarray(gb.values), 0))
    de = np.sqrt(np.maximum(np.asarray(ge.values), 0))
    # EDT distance to rasterized targets is within the Hausdorff bound
    assert np.max(np.abs(db - de)) <= ge.raster_err + 1e-5
    # index field points at genuinely near targets
    n = ge.n
    ii = rng.integers(0, n, size=(30, 3))
    centers = np.asarray(ge.origin) + (ii + 0.5) * float(ge.cell)
    idxs = np.asarray(ge.indices)[ii[:, 0], ii[:, 1], ii[:, 2]]
    dd = np.sqrt(np.sum((centers - t[idxs]) ** 2, axis=-1))
    ref = np.sqrt(_oracle_min_d2(centers.astype(np.float32), t))
    assert np.all(dd <= ref + 2 * ge.raster_err + 1e-5)


def test_edt_odd_resolution(rng):
    """n not divisible by the default chunk must still work (ref uses 300)."""
    t = (rng.random((50, 3)).astype(np.float32) - 0.5)
    g = build_distance_grid(t, n=30, method="edt")
    assert np.isfinite(np.asarray(g.values)).all()


def test_lookup_escape_outside_domain(rng):
    t = (rng.random((100, 3)).astype(np.float32) - 0.5) * 0.2
    g = build_distance_grid(t, n=32, method="brute")
    far = np.array([[5.0, 0.0, 0.0]], np.float32)
    lo, hi = distance_bounds(g, jnp.asarray(far), lookup="nearest")
    true_d = np.sqrt(_oracle_min_d2(far, t))[0]
    assert float(lo[0]) <= true_d <= float(hi[0])


def test_trilinear_interpolates_smoothly(rng):
    t = (rng.random((80, 3)).astype(np.float32) - 0.5)
    g = build_distance_grid(t, n=48, method="brute")
    q = (rng.random((50, 3)).astype(np.float32) - 0.5) * 0.8
    v_tri, _ = lookup_sq_trilinear(g, jnp.asarray(q))
    v_near, _ = lookup_sq_nearest(g, jnp.asarray(q))
    ref = _oracle_min_d2(q, t)
    cell = float(g.cell)
    err_tri = np.abs(np.sqrt(np.maximum(np.asarray(v_tri), 0)) - np.sqrt(ref))
    err_near = np.abs(np.sqrt(np.maximum(np.asarray(v_near), 0)) - np.sqrt(ref))
    assert err_tri.max() <= np.sqrt(3) * cell + 1e-5
    assert err_near.max() <= np.sqrt(3) / 2 * cell + 1e-5


def test_kdtree_oracle_matches_brute(rng):
    from goicp_tpu.nn.kdtree import KDTree

    t = rng.normal(size=(400, 3)).astype(np.float32)
    q = rng.normal(size=(100, 3)).astype(np.float32)
    tree = KDTree(t)
    d, i = tree.query(q)
    ref = _oracle_min_d2(q, t)
    assert np.allclose(d * d, ref, rtol=1e-4, atol=1e-6)


def test_distance_bounds_conservative_inside_domain(rng):
    """The public interval must bracket the TRUE distance even between cell
    centers (review: d_lo used to omit the lattice discretization slack)."""
    t = (rng.random((60, 3)).astype(np.float32) - 0.5)
    g = build_distance_grid(t, n=16, method="brute")  # coarse: big cells
    q = (rng.random((200, 3)).astype(np.float32) - 0.5) * 0.9
    true_d = np.sqrt(_oracle_min_d2(q, t))
    for lookup in ("nearest", "trilinear"):
        lo, hi = distance_bounds(g, jnp.asarray(q), lookup=lookup)
        lo, hi = np.asarray(lo), np.asarray(hi)
        assert (lo <= true_d + 1e-5).all(), (lookup, float((lo - true_d).max()))
        assert (hi >= true_d - 1e-5).all(), lookup


def test_degenerate_single_point_target():
    """A single-point (zero-extent) target must not yield a zero-sized
    domain (cell=0 -> NaN lookups)."""
    t = np.array([[1.0, 2.0, 3.0]], np.float32)
    g = build_distance_grid(t, n=8, method="brute")
    assert float(g.cell) > 0
    q = np.array([[1.0, 2.0, 3.5]], np.float32)
    lo, hi = distance_bounds(g, jnp.asarray(q), lookup="nearest")
    assert np.isfinite(float(lo[0])) and np.isfinite(float(hi[0]))
    assert float(lo[0]) <= 0.5 <= float(hi[0])
