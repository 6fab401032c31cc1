"""Pallas NN kernel vs the XLA brute oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from goicp_tpu.nn.brute import nearest_neighbor
from goicp_tpu.nn.pallas_nn import nearest_neighbor_pallas


def test_pallas_nn_matches_brute(rng):
    q = rng.normal(size=(777, 3)).astype(np.float32)
    t = rng.normal(size=(1531, 3)).astype(np.float32)
    d2p, ip = nearest_neighbor_pallas(q, t)
    d2b, ib = nearest_neighbor(jnp.asarray(q), jnp.asarray(t))
    assert np.allclose(np.asarray(d2p), np.asarray(d2b), rtol=1e-4, atol=1e-5)
    assert (np.asarray(ip) == np.asarray(ib)).all()


def test_pallas_nn_batched_and_edge_sizes(rng):
    t = rng.normal(size=(130, 3)).astype(np.float32)  # < one chunk
    q = rng.normal(size=(2, 65, 3)).astype(np.float32)
    d2p, ip = nearest_neighbor_pallas(q, t)
    d2b, ib = nearest_neighbor(jnp.asarray(q.reshape(-1, 3)), jnp.asarray(t))
    assert np.allclose(np.asarray(d2p).ravel(), np.asarray(d2b), rtol=1e-4, atol=1e-5)
    assert (np.asarray(ip).ravel() == np.asarray(ib)).all()


def test_pallas_exact_correspondence_closure(rng):
    from goicp_tpu.icp import exact_correspondence

    t = rng.normal(size=(500, 3)).astype(np.float32)
    q = rng.normal(size=(64, 3)).astype(np.float32)
    dst_p, d2_p = exact_correspondence(t, use_pallas=True)(jnp.asarray(q))
    dst_b, d2_b = exact_correspondence(t, use_pallas=False)(jnp.asarray(q))
    assert np.allclose(np.asarray(dst_p), np.asarray(dst_b), atol=1e-6)
    assert np.allclose(np.asarray(d2_p), np.asarray(d2_b), rtol=1e-4, atol=1e-6)
