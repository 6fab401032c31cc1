"""Batched multi-pair registration — the pod-scale serving surface.

The reference registers exactly one (source, target) pair per process
(``src/main.cpp``).  Production registration workloads (scan matching,
re-localization, dataset alignment) solve MANY pairs; the TPU-shaped answer
is to batch them:

- :func:`icp_pairs` — one device dispatch refines B pose hypotheses, one per
  pair, with per-pair padded clouds (a pure ``vmap`` of the batched ICP);
- :func:`register_pairs` — full Go-ICP per pair; compiled executables are
  shared across same-shaped pairs (module-level jit caches), and pairs can
  be spread over hosts by slicing the list (each host runs its slice; the
  cube axis *within* a solve is the `dist.sharded_bounds_step` path).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from goicp_tpu.bnb import BnbParams, GoIcpResult, make_solver
from goicp_tpu.core.types import RigidTransform
from goicp_tpu.icp import IcpParams, run_icp
from goicp_tpu.nn.brute import nearest_neighbor


def _pad_cloud(pts, n: int, sentinel: float):
    k = pts.shape[0]
    if k >= n:
        return np.asarray(pts[:n], np.float32), k >= n
    pad = np.full((n - k, 3), sentinel, np.float32)
    return np.concatenate([np.asarray(pts, np.float32), pad]), False


def icp_pairs(
    pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
    inits: Optional[RigidTransform] = None,
    params: IcpParams = IcpParams(),
):
    """Refine one pose per pair, all pairs in one jitted call.

    Clouds are zero-padded to the max source size / sentinel-padded to the
    max target size (sentinels at +1e15 never win a nearest-neighbor race,
    and padded source points are weighted out).  Returns ``(transforms [B],
    sse [B], iters [B])`` with per-pair trimming of the padding built in.
    """
    B = len(pairs)
    n_src = max(p[0].shape[0] for p in pairs)
    n_tgt = max(p[1].shape[0] for p in pairs)
    srcs = np.zeros((B, n_src, 3), np.float32)
    tgts = np.full((B, n_tgt, 3), 1e15, np.float32)
    w = np.zeros((B, n_src), np.float32)
    for b, (s, t) in enumerate(pairs):
        srcs[b, : s.shape[0]] = s
        w[b, : s.shape[0]] = 1.0
        tgts[b, : t.shape[0]] = t
    T0 = inits if inits is not None else RigidTransform.identity((B,))
    return _icp_pairs_jit(
        jnp.asarray(srcs), jnp.asarray(tgts), jnp.asarray(w), T0, params
    )


import functools


@functools.partial(jax.jit, static_argnames=("params",))
def _icp_pairs_jit(srcs, tgts, w, T0, params: IcpParams):
    def one(src, tgt, wts, T):
        def corr(pts):
            d2, idx = nearest_neighbor(pts, tgt)
            return jnp.take(tgt, idx, axis=0), d2

        # padded source rows carry weight 0 through Procrustes AND the SSE
        res = run_icp(src, corr, T, params, point_weights=wts)
        return res.transform, res.sse, res.iters

    return jax.vmap(one)(srcs, tgts, w, T0)


def register_pairs(
    pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
    params: BnbParams = BnbParams(),
) -> List[GoIcpResult]:
    """Globally-optimal registration of every pair.

    Same-shaped pairs reuse the same compiled device programs (all solver
    steps are module-level jits keyed by shape); on a multi-host deployment
    each host takes ``pairs[host_id::n_hosts]``.
    """
    return [make_solver(s, t, params).run() for s, t in pairs]
