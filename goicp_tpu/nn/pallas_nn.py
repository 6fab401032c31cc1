"""Pallas TPU kernel: exact nearest-neighbor search, targets in VMEM.

The reference's exact NN is a CUDA thread-per-query scalar loop over all
targets (``src/fgoicp/icp3d.cu:13-30``, ``src/icp_kernel.cu:105-119``).  The
XLA recast (``goicp_tpu.nn.brute``) streams target tiles but materializes a
``[Q, tile]`` distance block in HBM per scan step.  This kernel keeps the
whole target set resident in VMEM (~200 KB at 16k points in ``[3, Nt]``
layout) and fuses transform-free distance + running (min, argmin) per query
tile: HBM traffic is one read of the queries and one write of the results.

Layout choices (see pallas_guide: tiling constraints):
- both clouds are stored coordinate-major ``[3, N]`` so the big axis sits on
  the 128-wide lane dimension (a ``[N, 3]`` layout wastes 125/128 lanes);
- the inner product rides the MXU via ``dot_general`` contracting the
  3-coordinate axis; ``|t|²`` and ``|q|²`` close the square afterwards
  (f32 accumulation, exactness within ~1e-6 · magnitudes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

Q_TILE = 1024      # queries per program (lane-dim multiples of 128)
T_CHUNK = 1024     # target columns reduced per inner step
_PAD = 1e15        # sentinel coordinate for padded targets


def _nn_kernel(q_ref, tgt_ref, tn_ref, d2_ref, idx_ref, *, n_chunks):
    q = q_ref[:]                                    # [3, QT]
    qn = jnp.sum(q * q, axis=0, keepdims=True)      # [1, QT]

    def body(c, carry):
        best, bidx = carry
        t = tgt_ref[:, pl.dslice(c * T_CHUNK, T_CHUNK)]      # [3, TC]
        tn = tn_ref[:, pl.dslice(c * T_CHUNK, T_CHUNK)]      # [1, TC]
        # [TC, QT] partial squared distance (|t|² − 2·t·q); MXU contraction
        dots = jax.lax.dot_general(
            t, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d2 = tn.T - 2.0 * dots
        cmin = jnp.min(d2, axis=0, keepdims=True)            # [1, QT]
        carg = jnp.argmin(d2, axis=0).astype(jnp.int32)[None, :] + c * T_CHUNK
        take = cmin < best
        return jnp.where(take, cmin, best), jnp.where(take, carg, bidx)

    best = jnp.full((1, q.shape[1]), jnp.inf, jnp.float32)
    bidx = jnp.zeros((1, q.shape[1]), jnp.int32)
    best, bidx = jax.lax.fori_loop(0, n_chunks, body, (best, bidx))
    d2_ref[:] = jnp.maximum(best + qn, 0.0)
    idx_ref[:] = bidx


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nn_padded(qT, tgtT, tnT, *, interpret: bool):
    """``qT [3, Qp]`` (Qp % Q_TILE == 0), ``tgtT [3, Tp]`` (Tp % T_CHUNK == 0)."""
    n_chunks = tgtT.shape[1] // T_CHUNK
    grid = (qT.shape[1] // Q_TILE,)
    d2, idx = pl.pallas_call(
        functools.partial(_nn_kernel, n_chunks=n_chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, Q_TILE), lambda i: (0, i)),
            pl.BlockSpec((3, tgtT.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((1, tnT.shape[1]), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Q_TILE), lambda i: (0, i)),
            pl.BlockSpec((1, Q_TILE), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, qT.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((1, qT.shape[1]), jnp.int32),
        ],
        interpret=interpret,
    )(qT, tgtT, tnT)
    return d2[0], idx[0]


def nearest_neighbor_pallas(queries, targets, interpret=None):
    """Exact NN: ``queries [..., Q, 3]``, ``targets [Nt, 3]`` →
    ``(d2 [..., Q], idx [..., Q])``.  Drop-in for ``nn.brute.nearest_neighbor``."""
    queries = jnp.asarray(queries, jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch_shape = queries.shape[:-2]
    Q = queries.shape[-2]
    flat_q = queries.reshape(-1, 3)
    total = flat_q.shape[0]
    padq = (-total) % Q_TILE
    if padq:
        flat_q = jnp.concatenate([flat_q, jnp.zeros((padq, 3), jnp.float32)])
    nt = targets.shape[0]
    padt = (-nt) % T_CHUNK
    if padt:
        targets = jnp.concatenate(
            [targets, jnp.full((padt, 3), _PAD, jnp.float32)]
        )
    tgtT = targets.T                                  # [3, Tp]
    tnT = jnp.sum(targets * targets, axis=1)[None, :]  # [1, Tp]
    d2, idx = _nn_padded(flat_q.T, tgtT, tnT, interpret=interpret)
    d2 = d2[:total].reshape(*batch_shape, Q)
    idx = idx[:total].reshape(*batch_shape, Q)
    return d2, idx
