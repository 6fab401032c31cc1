"""Pallas TPU kernel: exact nearest-neighbor search, targets in VMEM.

The reference's exact NN is a CUDA thread-per-query scalar loop over all
targets (``src/fgoicp/icp3d.cu:13-30``, ``src/icp_kernel.cu:105-119``).  The
XLA recast (``goicp_tpu.nn.brute``) streams target tiles but materializes a
``[Q, tile]`` distance block in HBM per scan step.  This kernel keeps the
whole target set resident in VMEM (~200 KB at 16k points in ``[3, Nt]``
layout) and fuses transform-free distance + running (min, argmin) per query
tile: HBM traffic is one read of the queries and one write of the results.

Measured on TPU v5e (40k×8k): correct to the last index, ~2.7 G point-pairs/s
vs ~7.8 G for the XLA scan path (``nn.brute``) — XLA's fused dot+min pipeline
wins here, so the kernel is an opt-in (``GOICP_TPU_PALLAS=1``) reference
implementation, kept for the VMEM-residency pattern and as the starting point
for a bf16-prefilter + f32-rescore variant.

Layout choices (see pallas_guide: tiling constraints):
- both clouds are stored coordinate-major ``[8, N]`` (coordinates zero-padded
  from 3 to the f32 sublane count) so the big axis sits on the 128-wide lane
  dimension AND the MXU contraction axis covers whole sublanes — contracting
  a size-3 axis makes Mosaic read undefined VMEM pad rows on real hardware
  (interpret mode hides this);
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


def _nn_kernel(q_ref, tgt_ref, d2_ref, idx_ref, *, n_chunks):
    # packed layouts (see nearest_neighbor_pallas):
    #   q row 0..2 = coords, row 3 = 1.0           → [8, QT]
    #   t row 0..2 = −2·coords, row 3 = |t|²        → [8, Tp]
    # so the single MXU contraction yields |t|² − 2·t·q directly — no
    # separate |t|² row and no in-kernel transpose.
    q = q_ref[:]
    qsq = q * q
    qn = qsq[0:1] + qsq[1:2] + qsq[2:3]             # [1, QT] (row 3 is the 1s)

    def body(c, carry):
        best, bidx = carry
        t = tgt_ref[:, pl.dslice(c * T_CHUNK, T_CHUNK)]      # [8, TC]
        d2 = jax.lax.dot_general(
            t, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # MXU inputs demote to bf16 by default — ~1e-2 absolute error in
            # d², enough to pick wrong neighbors; HIGHEST runs the 3-pass
            # f32 emulation (same as the XLA brute path)
            precision=jax.lax.Precision.HIGHEST,
        )                                                     # [TC, QT]
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
def _nn_padded(qT, tgtT, *, interpret: bool):
    """``qT [8, Qp]`` (Qp % Q_TILE == 0), ``tgtT [8, Tp]`` (Tp % T_CHUNK == 0)."""
    n_chunks = tgtT.shape[1] // T_CHUNK
    grid = (qT.shape[1] // Q_TILE,)
    d2, idx = pl.pallas_call(
        functools.partial(_nn_kernel, n_chunks=n_chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, Q_TILE), lambda i: (0, i)),
            pl.BlockSpec((8, tgtT.shape[1]), lambda i: (0, 0)),
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
    )(qT, tgtT)
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
    # packed coordinate-major: t rows = (−2·xyz, |t|², 0…), q rows = (xyz, 1, 0…)
    tn = jnp.sum(targets * targets, axis=1)
    tgtT = (
        jnp.zeros((8, targets.shape[0]), jnp.float32)
        .at[:3].set(-2.0 * targets.T)
        .at[3].set(tn)
    )
    qT = (
        jnp.zeros((8, flat_q.shape[0]), jnp.float32)
        .at[:3].set(flat_q.T)
        .at[3].set(1.0)
    )
    d2, idx = _nn_padded(qT, tgtT, interpret=interpret)
    d2 = d2[:total].reshape(*batch_shape, Q)
    idx = idx[:total].reshape(*batch_shape, Q)
    return d2, idx
