"""Fused MXU min-distance kernel — the BnB bound hot path, TPU-native.

Replaces the two round-1 backends on their shared bottleneck:

- the **grid backend** (``nn.grid`` lookups ≙ ``tex3D``, ``registration.cu:27-60``)
  is bound by XLA's random-gather ceiling (~110 M lookups/s on v5e,
  measured round 1 — invariant to dtype, table size and index locality);
- the **exact XLA backend** (``bnb.device_inner._exact_min_d2``) computes the
  same ``|q|² − 2q·m + |m|²`` expansion but materializes every
  ``[queries, tile]`` distance block in HBM between the matmul and the min.

This kernel keeps the whole pipeline in VMEM: per (node, query-block)
program it applies the node's rigid transform to the source block, runs one
augmented matmul per target tile on the MXU (contraction yields ``|q−m|²``
directly), and folds the running minimum on the VPU — HBM sees one read of
the clouds and one ``[B, N]`` result write.  No distance grid, no gathers,
and the bounds become *exact* (no discretization slack), which also prunes
the BnB tree harder than any LUT can (≙ the reference's own finding that
brute force beats trees on GPU, ``README.md:103-106`` — one rung further).

Layouts (pallas_guide tiling rules):
- source/targets coordinate-major with the big axis on 128-wide lanes /
  8-deep sublanes: ``src_aug [8, Np]`` rows = (x, y, z, |p|, 0…),
  ``wm [Mp, 8]`` cols = (m_x, m_y, m_z, 1, |m|², 0…);
- per-node params ``[B, 16]`` = (R row-major ×9, t ×3, pad) live in SMEM;
- the augmented query ``qp [8, TQ]`` rows = (−2q_x, −2q_y, −2q_z, |q|², 1, 0…)
  are built on the VPU from the block + params, so
  ``w_tile [TM,8] @ qp [8,TQ] = |q−m|² − |q|²·0…`` — one contraction, no
  separate norm pass (f32 cancellation slack is accounted by the caller's
  certified-mode ``exact_slack``, ``bnb.solver``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_TGT = 1e15     # padded targets: |m|² sentinel keeps them off every min
TQ = 2048           # max query columns per program (lane multiples of 128);
                    # one whole-cloud block per program measured fastest
                    # (388 G pairs/s at 1536 columns vs 338 G tiled, v5e)
TM = 512            # max target rows reduced per inner step (sublane multiples)


def _pick_tile(n: int, cap: int, quantum: int = 128) -> int:
    """Largest divisor of ``n`` that is a multiple of ``quantum`` and ≤ cap.

    Clouds pad to the 128-lane quantum only (``pack_sources``/``pack_targets``);
    the kernels then tile with whatever divides the padded size — bunny@0.05
    (N=1518 → 1536, Nt=1797 → 1920) runs at 1536×1920 instead of the fixed
    2048×2048 tiles' 42% padded-pair waste (measured round 2)."""
    best = quantum
    t = quantum
    while t <= cap:
        if n % t == 0:
            best = t
        t += quantum
    return best

# MXU precision, pinned to HIGHEST (bf16x6 ≈ exact f32): certified bounds
# must not inherit matmul rounding.  HIGH (bf16x3) measured ~2× faster and
# close to f32 for O(1) coordinates, but the 'dot' variant is off the
# default path anyway (the VPU diff form wins — FUTURE.md round-2 ledger),
# so exactness is the only job this constant has.  DEFAULT (1-pass bf16)
# loses ~1e-2 absolute in d² — enough to pick wrong neighbors (round-1).
_PREC = jax.lax.Precision.HIGHEST


def _min_d2_kernel(params_ref, src_ref, wm_ref, d2_ref, idx_ref=None, *,
                   n_chunks: int, want_idx: bool, precision,
                   variant: str = "dot", tm: int = TM):
    """One (node b, query-block n) program: transform, min over all targets.

    ``variant``: "dot" rides the MXU via the augmented |q−m|² contraction
    (bf16 DEFAULT ≈ 4× the f32 bf16x6 emulation, at ~1e-2 absolute d²
    error); "diff" computes coordinate differences on the VPU — exact f32
    at K=8-matmul-free throughput.
    """
    b = pl.program_id(0)
    px = src_ref[0:1, :]
    py = src_ref[1:2, :]
    pz = src_ref[2:3, :]                                  # [1, TQ]
    qx = px * params_ref[b, 0] + py * params_ref[b, 1] + pz * params_ref[b, 2] \
        + params_ref[b, 9]
    qy = px * params_ref[b, 3] + py * params_ref[b, 4] + pz * params_ref[b, 5] \
        + params_ref[b, 10]
    qz = px * params_ref[b, 6] + py * params_ref[b, 7] + pz * params_ref[b, 8] \
        + params_ref[b, 11]
    qn = qx * qx + qy * qy + qz * qz
    if variant not in ("dot", "exp", "diff"):
        raise ValueError(f"unknown variant {variant!r}")
    if variant == "dot":
        one = jnp.ones_like(qx)
        zero = jnp.zeros_like(qx)
        qp = jnp.concatenate(
            [-2.0 * qx, -2.0 * qy, -2.0 * qz, qn, one, zero, zero, zero],
            axis=0,
        )                                                  # [8, TQ]
    elif variant == "exp":
        nqx = -2.0 * qx                                    # hoisted FMA factors
        nqy = -2.0 * qy
        nqz = -2.0 * qz

    def body(c, carry):
        best, bidx = carry
        w = wm_ref[pl.dslice(c * tm, tm), :]              # [tm, 8]
        if variant == "diff":
            dx = w[:, 0:1] - qx                            # [TM, TQ]
            dy = w[:, 1:2] - qy
            dz = w[:, 2:3] - qz
            d2 = dx * dx + dy * dy + dz * dz
        elif variant == "exp":
            # |q−m|² − |q|² = |m|² − 2q·m: 3 FMA/pair (|q|² rejoins after
            # the min — it commutes; f32 cancellation is covered by the
            # caller's exact_slack in certified mode)
            d2 = w[:, 4:5] + nqx * w[:, 0:1]
            d2 = d2 + nqy * w[:, 1:2]
            d2 = d2 + nqz * w[:, 2:3]
        else:
            d2 = jax.lax.dot_general(
                w, qp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )                                              # [TM, TQ]
        cmin = jnp.min(d2, axis=0, keepdims=True)          # [1, TQ]
        take = cmin < best
        best = jnp.where(take, cmin, best)
        if want_idx:
            carg = jnp.argmin(d2, axis=0).astype(jnp.int32)[None, :] + c * tm
            bidx = jnp.where(take, carg, bidx)
        return best, bidx

    best = jnp.full((1, qx.shape[1]), jnp.inf, jnp.float32)
    bidx = jnp.zeros((1, qx.shape[1]), jnp.int32)
    best, bidx = jax.lax.fori_loop(0, n_chunks, body, (best, bidx))
    if variant == "exp":
        best = best + qn
    d2_ref[0, :, :] = jnp.maximum(best, 0.0)
    if want_idx:
        idx_ref[0, :, :] = bidx


@functools.partial(
    jax.jit,
    static_argnames=("want_idx", "interpret", "precision", "variant"),
)
def _min_d2_padded(params, srcT, wm, *, want_idx: bool, interpret: bool,
                   precision=_PREC, variant: str = "dot"):
    """``params [B,16]``, ``srcT [8, Np]``, ``wm [Mp, 8]`` (both 128-padded)
    → ``(d2 [B, Np], idx [B, Np] int32)``."""
    B = params.shape[0]
    Np, Mp = srcT.shape[1], wm.shape[0]
    tq = _pick_tile(Np, TQ)
    tm = _pick_tile(Mp, TM)
    grid = (B, Np // tq)
    kernel = functools.partial(
        _min_d2_kernel,
        n_chunks=Mp // tm,
        want_idx=want_idx,
        precision=precision,
        variant=variant,
        tm=tm,
    )
    # outputs are [B, 1, Np]: a (1, 1, tq) block keeps the last-two dims
    # legal for Mosaic ((1, tq) with the middle dim equal to the array's)
    out_specs = [pl.BlockSpec((1, 1, tq), lambda b, n: (b, 0, n))]
    out_shape = [jax.ShapeDtypeStruct((B, 1, Np), jnp.float32)]
    if want_idx:
        out_specs.append(pl.BlockSpec((1, 1, tq), lambda b, n: (b, 0, n)))
        out_shape.append(jax.ShapeDtypeStruct((B, 1, Np), jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # whole params array resident (scalar reads by program id):
            # SMEM rejects sub-(8,128) blocks, and a [B,16] f32 table can
            # exceed SMEM anyway at production batch sizes
            pl.BlockSpec((B, 16), lambda b, n: (0, 0)),
            pl.BlockSpec((8, tq), lambda b, n: (0, n)),
            pl.BlockSpec((Mp, 8), lambda b, n: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(params, srcT, wm)
    if want_idx:
        return out[0].reshape(B, Np), out[1].reshape(B, Np)
    return out[0].reshape(B, Np), None


def _min_d2_grouped_kernel(params_ref, src_ref, wm_ref, d2_ref, *,
                           n_chunks: int, tm: int = TM,
                           variant: str = "diff"):
    """One (group g, query-block n) program for 8 translation siblings that
    share one rotation (an octant t-split's children, ``bnb.se3``).

    Separability does the work: with ``u = R·p`` (no translation) and base
    plane ``G[i,m] = |u_i − m|²``,

        |u_i + t_j − m|² = G[i,m] + 2·t_j·u_i + (|t_j|² − 2·t_j·m)
                         = G[i,m] + a_j[i] + b_j[m]

    so the 9-op/pair plane ``G`` is computed ONCE per group and each sibling
    costs ~2 VPU ops/pair (broadcast add + running min); `a_j` commutes with
    the min over ``m`` and is added after the loop.  ~3 ops/pair amortized
    vs 9 for the singleton diff kernel — the TPU form of the stream-pool's
    per-tnode reuse of a fixed rotation (``registration.cu:88-151``).
    """
    g = pl.program_id(0)
    px = src_ref[0:1, :]
    py = src_ref[1:2, :]
    pz = src_ref[2:3, :]                                  # [1, TQ]
    ux = px * params_ref[g, 0] + py * params_ref[g, 1] + pz * params_ref[g, 2]
    uy = px * params_ref[g, 3] + py * params_ref[g, 4] + pz * params_ref[g, 5]
    uz = px * params_ref[g, 6] + py * params_ref[g, 7] + pz * params_ref[g, 8]
    if variant == "exp":
        nux = -2.0 * ux                                    # hoisted FMA factors
        nuy = -2.0 * uy
        nuz = -2.0 * uz
        un = ux * ux + uy * uy + uz * uz

    def body(c, best):
        w = wm_ref[pl.dslice(c * tm, tm), :]              # [tm, 8]
        wx = w[:, 0:1]
        wy = w[:, 1:2]
        wz = w[:, 2:3]
        if variant == "exp":
            # base plane shifted by |u|²: |m|² − 2u·m, 3 FMA/pair (|u|²
            # rejoins in the epilogue — it commutes with min over m)
            Gp = w[:, 4:5] + nux * wx
            Gp = Gp + nuy * wy
            Gp = Gp + nuz * wz
        else:
            dx = wx - ux                                  # [TM, TQ]
            dy = wy - uy
            dz = wz - uz
            Gp = dx * dx + dy * dy + dz * dz              # base plane, once
        rows = []
        for j in range(8):
            tx = params_ref[g, 9 + 3 * j]
            ty = params_ref[g, 10 + 3 * j]
            tz = params_ref[g, 11 + 3 * j]
            bj = params_ref[g, 33 + j] - 2.0 * (tx * wx + ty * wy + tz * wz)
            rows.append(jnp.min(Gp + bj, axis=0, keepdims=True))   # [1, TQ]
        return jnp.minimum(best, jnp.concatenate(rows, axis=0))    # [8, TQ]

    best = jnp.full((8, ux.shape[1]), jnp.inf, jnp.float32)
    best = jax.lax.fori_loop(0, n_chunks, body, best)
    arows = []
    for j in range(8):
        tx = params_ref[g, 9 + 3 * j]
        ty = params_ref[g, 10 + 3 * j]
        tz = params_ref[g, 11 + 3 * j]
        aj = 2.0 * (tx * ux + ty * uy + tz * uz)
        arows.append(aj + un if variant == "exp" else aj)
    d2_ref[0, :, :] = jnp.maximum(best + jnp.concatenate(arows, axis=0), 0.0)


@functools.partial(jax.jit, static_argnames=("interpret", "variant"))
def _min_d2_grouped_padded(gparams, srcT, wm, *, interpret: bool,
                           variant: str = "diff"):
    """``gparams [G,48]`` (R×9, 8×t×3, 8×|t|², pad), ``srcT [8, Np]``,
    ``wm [Mp, 8]`` → ``d2 [8·G, Np]`` in (group-major, sibling) node order."""
    G = gparams.shape[0]
    Np, Mp = srcT.shape[1], wm.shape[0]
    tq = _pick_tile(Np, TQ)
    tm = _pick_tile(Mp, TM)
    out = pl.pallas_call(
        functools.partial(
            _min_d2_grouped_kernel, n_chunks=Mp // tm, tm=tm, variant=variant
        ),
        grid=(G, Np // tq),
        in_specs=[
            pl.BlockSpec((G, 48), lambda g, n: (0, 0)),
            pl.BlockSpec((8, tq), lambda g, n: (0, n)),
            pl.BlockSpec((Mp, 8), lambda g, n: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, 8, tq), lambda g, n: (g, 0, n))],
        out_shape=[jax.ShapeDtypeStruct((G, 8, Np), jnp.float32)],
        interpret=interpret,
    )(gparams, srcT, wm)
    return out[0].reshape(8 * G, Np)


def pack_group_params(R, t8) -> jnp.ndarray:
    """``R [G,3,3], t8 [G,8,3] → [G,48]`` grouped-transform rows."""
    R = jnp.asarray(R, jnp.float32)
    t8 = jnp.asarray(t8, jnp.float32)
    G = R.shape[0]
    tn = jnp.sum(t8 * t8, axis=-1)                        # [G, 8]
    return jnp.concatenate(
        [R.reshape(G, 9), t8.reshape(G, 24), tn,
         jnp.zeros((G, 7), jnp.float32)],
        axis=1,
    )


def min_d2_groups(srcT, wm, gparams, *, interpret=None, variant: str = "diff"):
    """Exact min squared distances for 8-sibling translation groups:
    ``d2 [8·G, Np]``, row ``8g+j`` = node (R_g, t_{g,j})."""
    if interpret is None:
        interpret = not _on_tpu()
    return _min_d2_grouped_padded(
        gparams, srcT, wm, interpret=interpret, variant=variant
    )


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def pack_targets(targets) -> jnp.ndarray:
    """``[Nt,3] → wm [Mp, 8]`` cols (m_x, m_y, m_z, 1, |m|², 0…), padded to
    the 128-row quantum with off-scale sentinels."""
    targets = jnp.asarray(targets, jnp.float32)
    nt = targets.shape[0]
    padt = (-nt) % 128
    if padt:
        targets = jnp.concatenate(
            [targets, jnp.full((padt, 3), _PAD_TGT, jnp.float32)]
        )
    tn = jnp.sum(targets * targets, axis=1)
    wm = (
        jnp.zeros((targets.shape[0], 8), jnp.float32)
        .at[:, 0:3].set(targets)
        .at[:, 3].set(1.0)
        .at[:, 4].set(tn)
    )
    return wm


def pack_sources(src) -> jnp.ndarray:
    """``[N,3] → srcT [8, Np]`` rows (x, y, z, 0…), zero-padded to the
    128-lane quantum."""
    src = jnp.asarray(src, jnp.float32)
    n = src.shape[0]
    padn = (-n) % 128
    if padn:
        src = jnp.concatenate([src, jnp.zeros((padn, 3), jnp.float32)])
    return jnp.zeros((8, src.shape[0]), jnp.float32).at[0:3].set(src.T)


def pack_params(R, t) -> jnp.ndarray:
    """``R [B,3,3], t [B,3] → [B,16]`` rigid-transform rows for SMEM."""
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    B = R.shape[0]
    return jnp.concatenate(
        [R.reshape(B, 9), t, jnp.zeros((B, 4), jnp.float32)], axis=1
    )


def min_d2_nodes(srcT, wm, params, *, interpret=None, precision=_PREC,
                 variant: str = "diff"):
    """Per-node exact min squared distances: ``d2 [B, Np]`` for queries
    ``R_b·p + t_b`` (the fused form of ``kernComputeBounds``'s per-point
    LUT fetch, ``registration.cu:27-60``, minus the LUT)."""
    if interpret is None:
        interpret = not _on_tpu()
    d2, _ = _min_d2_padded(
        params, srcT, wm, want_idx=False, interpret=interpret,
        precision=precision, variant=variant,
    )
    return d2


# ---------------------------------------------------------------------------
# fused-bounds kernels: min-distance + Yang eq. 10 epilogue + PROGRESSIVE
# SCREENING in one kernel.  One program per node walks the point-blocks in
# an inner fori_loop whose body is a lax.cond on the carried partial lower
# bound: once it crosses the node's prune threshold, the remaining blocks
# cost one predicate each.  A measured 70% of evaluated BnB children carry
# lb ≥ 2× the threshold (bunny@0.05), so most nodes finish after a fraction
# of the cloud.  Partial sums of the nonnegative per-point terms are
# themselves valid lower bounds, so a screened node reports (ub=+inf,
# lb=partial ≥ thresh): the engine prunes it exactly as jly prunes on
# lb ≥ optError − SSEThresh (jly_goicp.cpp:554-562) without ever paying the
# full evaluation.  (Design history: (node × block) grids — whether blocks
# were inner or outer, with SMEM scratch or output-row accumulators — paid
# a measured ~1.1 µs per-program launch floor that erased the savings.)
# ---------------------------------------------------------------------------

TQB = 384           # point-block cap for the screened kernels (smaller blocks
                    # = finer screening granularity; cap balances skip rate
                    # against per-program overhead)


# NOTE: the ~20-line transform + min-over-target-chunks block is repeated
# (with different parameter-row layouts) across _min_d2_kernel,
# _bounds_kernel, _bounds_grouped_kernel and _bounds_trimmed_kernel ON
# PURPOSE: these are the measured-at-the-VPU-ceiling hot kernels, and
# Mosaic codegen is sensitive to the exact traced form (FUTURE.md ledger:
# the algebraically-equal expansion form lost ~25%).  Edit all four
# together; the bracket tests in tests/test_bnb.py catch any divergence.
def _bounds_kernel(params_ref, src_ref, wm_ref, out_ref, *,
                   n_chunks: int, tm: int, tq: int, nb: int):
    """ONE program per node: fused bounds with in-program screening.

    The whole (padded) cloud is resident; an inner ``fori_loop`` walks
    ``nb`` point-blocks of ``tq`` columns, and each iteration's body is a
    ``lax.cond`` on the carried partial lower bound — once it crosses the
    node's threshold the remaining blocks cost one predicate each.  One
    program per node keeps the launch count identical to the unfused
    kernel: the earlier (node × block) grids paid a measured ~1.1 µs
    per-program floor that erased the skip savings.

    ``params`` row: R×9, t×3, af (2·sin(min(√3σ,π)/2)), γt, slack, thresh.
    ``src`` rows: x, y, z, ‖p‖, valid.  ``out [B,1,128]``: col0 ub (1e30
    when screened early — never a valid incumbent), col1 lb (partial ≥
    thresh when screened — still a valid lower bound).
    """
    b = pl.program_id(0)
    thresh = params_ref[b, 15]
    slack = params_ref[b, 14]

    def block(n, carry):
        ub_acc, lb_acc = carry

        def compute(c0):
            ub0, lb0 = c0
            sl = pl.dslice(n * tq, tq)
            px = src_ref[0:1, sl]
            py = src_ref[1:2, sl]
            pz = src_ref[2:3, sl]
            pn = src_ref[3:4, sl]
            pv = src_ref[4:5, sl]
            qx = px * params_ref[b, 0] + py * params_ref[b, 1] \
                + pz * params_ref[b, 2] + params_ref[b, 9]
            qy = px * params_ref[b, 3] + py * params_ref[b, 4] \
                + pz * params_ref[b, 5] + params_ref[b, 10]
            qz = px * params_ref[b, 6] + py * params_ref[b, 7] \
                + pz * params_ref[b, 8] + params_ref[b, 11]

            def body(c, best):
                w = wm_ref[pl.dslice(c * tm, tm), :]
                dx = w[:, 0:1] - qx
                dy = w[:, 1:2] - qy
                dz = w[:, 2:3] - qz
                d2 = dx * dx + dy * dy + dz * dz
                return jnp.minimum(best, jnp.min(d2, axis=0, keepdims=True))

            best = jax.lax.fori_loop(
                0, n_chunks, body,
                jnp.full((1, tq), jnp.inf, jnp.float32),
            )
            d = jnp.sqrt(jnp.maximum(best, 0.0))
            d_hi = d + slack
            d_lo = jnp.maximum(d - slack, 0.0)
            defl = params_ref[b, 12] * pn + params_ref[b, 13]
            lb_c = jnp.maximum(d_lo - defl, 0.0)
            return (ub0 + jnp.sum(d_hi * d_hi * pv),
                    lb0 + jnp.sum(lb_c * lb_c * pv))

        return jax.lax.cond(lb_acc < thresh, compute, lambda c0: c0,
                            (ub_acc, lb_acc))

    ub, lb = jax.lax.fori_loop(
        0, nb, block, (jnp.float32(0.0), jnp.float32(0.0))
    )
    # lb ≥ thresh ⇒ the node is dead under the ε-rule.  Its ub is replaced
    # by a sentinel EVEN IF every block ran (a completed ub in
    # [thresh, best) could nudge the incumbent by < ε, but distinguishing
    # "completed" from "screened early — partial, invalid ub" would cost a
    # flag per node; ε-optimality is unaffected either way).
    ub = jnp.where(lb < thresh, ub, 1e30)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out_ref[0, :, :] = jnp.where(col == 0, ub, jnp.where(col == 1, lb, 0.0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bounds_padded(params, srcT, wm, *, interpret: bool):
    B = params.shape[0]
    Np, Mp = srcT.shape[1], wm.shape[0]
    tq = _pick_tile(Np, TQB)
    tm = _pick_tile(Mp, TM)
    nb = Np // tq
    out = pl.pallas_call(
        functools.partial(
            _bounds_kernel, n_chunks=Mp // tm, tm=tm, tq=tq, nb=nb
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B, 16), lambda b: (0, 0)),
            pl.BlockSpec((8, Np), lambda b: (0, 0)),
            pl.BlockSpec((Mp, 8), lambda b: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, 1, 128), jnp.float32)],
        interpret=interpret,
    )(params, srcT, wm)[0]
    return out[:, 0, 0], out[:, 0, 1]                      # ub, lb


def _bounds_grouped_kernel(params_ref, src_ref, wm_ref, out_ref, *,
                           n_chunks: int, tm: int, tq: int, nb: int):
    """Grouped (8 translation siblings / rotation) fused bounds with
    GROUP-level in-program screening: the next point-block is skipped once
    every sibling's carried partial lb crosses the threshold (per-sibling
    masking would save nothing on the VPU — the shared base plane is the
    cost).  Same one-program-per-group structure as ``_bounds_kernel``.

    ``params`` row [64]: R×9, t8×24, |t_j|²×8, af, γt×8 (42-49), slack,
    thresh.  ``out [G,1,128]``: cols 0-7 sibling ubs, 8-15 sibling lbs.
    """
    g = pl.program_id(0)
    thresh = params_ref[g, 51]
    slack = params_ref[g, 50]
    af = params_ref[g, 41]

    def block(n, carry):
        def compute(c0):
            ub0, lb0 = c0                                  # [1,8] rows
            sl = pl.dslice(n * tq, tq)
            px = src_ref[0:1, sl]
            py = src_ref[1:2, sl]
            pz = src_ref[2:3, sl]
            pn = src_ref[3:4, sl]
            pv = src_ref[4:5, sl]
            ux = px * params_ref[g, 0] + py * params_ref[g, 1] \
                + pz * params_ref[g, 2]
            uy = px * params_ref[g, 3] + py * params_ref[g, 4] \
                + pz * params_ref[g, 5]
            uz = px * params_ref[g, 6] + py * params_ref[g, 7] \
                + pz * params_ref[g, 8]

            def body(c, best):
                w = wm_ref[pl.dslice(c * tm, tm), :]
                wx = w[:, 0:1]
                wy = w[:, 1:2]
                wz = w[:, 2:3]
                dx = wx - ux
                dy = wy - uy
                dz = wz - uz
                Gp = dx * dx + dy * dy + dz * dz           # base plane, once
                rows = []
                for j in range(8):
                    tx = params_ref[g, 9 + 3 * j]
                    ty = params_ref[g, 10 + 3 * j]
                    tz = params_ref[g, 11 + 3 * j]
                    bj = params_ref[g, 33 + j] \
                        - 2.0 * (tx * wx + ty * wy + tz * wz)
                    rows.append(jnp.min(Gp + bj, axis=0, keepdims=True))
                return jnp.minimum(best, jnp.concatenate(rows, axis=0))

            best = jax.lax.fori_loop(
                0, n_chunks, body,
                jnp.full((8, tq), jnp.inf, jnp.float32),
            )
            ubs, lbs = [], []
            for j in range(8):
                tx = params_ref[g, 9 + 3 * j]
                ty = params_ref[g, 10 + 3 * j]
                tz = params_ref[g, 11 + 3 * j]
                aj = 2.0 * (tx * ux + ty * uy + tz * uz)
                d2 = jnp.maximum(best[j : j + 1, :] + aj, 0.0)
                d = jnp.sqrt(d2)
                d_hi = d + slack
                d_lo = jnp.maximum(d - slack, 0.0)
                defl = af * pn + params_ref[g, 42 + j]
                lb_c = jnp.maximum(d_lo - defl, 0.0)
                ubs.append(jnp.sum(d_hi * d_hi * pv))
                lbs.append(jnp.sum(lb_c * lb_c * pv))
            return (ub0 + jnp.stack(ubs).reshape(1, 8),
                    lb0 + jnp.stack(lbs).reshape(1, 8))

        ub_acc, lb_acc = carry
        return jax.lax.cond(
            jnp.min(lb_acc) < thresh, compute, lambda c0: c0, carry
        )

    zero = jnp.zeros((1, 8), jnp.float32)
    ub, lb = jax.lax.fori_loop(0, nb, block, (zero, zero))
    ub = jnp.where(jnp.min(lb) < thresh, ub, 1e30)  # group screened: sentinel
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row = jnp.zeros((1, 128), jnp.float32)
    for j in range(8):
        row = jnp.where(col == j, ub[0, j], row)
        row = jnp.where(col == 8 + j, lb[0, j], row)
    out_ref[0, :, :] = row


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bounds_grouped_padded(gparams, srcT, wm, *, interpret: bool):
    G = gparams.shape[0]
    Np, Mp = srcT.shape[1], wm.shape[0]
    tq = _pick_tile(Np, TQB)
    tm = _pick_tile(Mp, TM)
    nb = Np // tq
    out = pl.pallas_call(
        functools.partial(
            _bounds_grouped_kernel, n_chunks=Mp // tm, tm=tm, tq=tq, nb=nb
        ),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((G, 64), lambda g: (0, 0)),
            pl.BlockSpec((8, Np), lambda g: (0, 0)),
            pl.BlockSpec((Mp, 8), lambda g: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, 1, 128), lambda g: (g, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((G, 1, 128), jnp.float32)],
        interpret=interpret,
    )(gparams, srcT, wm)[0]
    ub = out[:, 0, 0:8].reshape(8 * G)                     # group-major
    lb = out[:, 0, 8:16].reshape(8 * G)
    return ub, lb


def pack_sources_ext(src, norms) -> jnp.ndarray:
    """``[N,3] → srcT [8, Np]`` rows (x, y, z, ‖p‖, valid, 0…) for the
    fused-bounds kernels; zero-padded (valid=0) to the 128-lane quantum.
    jnp-traceable (called inside the jitted round)."""
    src = jnp.asarray(src, jnp.float32)
    norms = jnp.asarray(norms, jnp.float32)
    n = src.shape[0]
    npad = n + ((-n) % 128)
    return (
        jnp.zeros((8, npad), jnp.float32)
        .at[0:3, :n].set(src.T)
        .at[3, :n].set(norms)
        .at[4, :n].set(1.0)
    )


def _bounds_trimmed_kernel(params_ref, src_ref, wm_ref, out_ref, scr_ref, *,
                           n_chunks: int, tm: int, tq: int, nb: int,
                           h: int, drop: int):
    """Screened fused bounds with TRIMMING (one program per node).

    Screening uses the clamped partial sum: with ``l̃ᵢ = min(lᵢ, τ)``,

        trimmed_h(l) ≥ Σ_{i∈S} l̃ᵢ − (N−h)·τ          (any processed S, τ>0)

    because the h kept terms include all but ≤ N−h of S, each clamped term
    ≤ τ.  The kernel carries ``Σ l̃`` and skips remaining blocks once it
    crosses ``thresh' = thresh + (N−h)·τ`` (params slot 15); a screened node
    reports lb = Σl̃ − (N−h)·τ ≥ thresh — prunable, exactly like the
    untrimmed screen.  Unscreened nodes get EXACT trimmed sums: per-point
    contributions are staged in a VMEM scratch and reduced by the same
    threshold-bisection as ``bnb.se3._trimmed_sum_bisect`` (lower end for
    lb, upper end for ub — bound directions preserved).

    ``params`` row [24]: R×9, t×3, af, γt, slack, thresh', τ, pad.
    ``src`` rows: x, y, z, ‖p‖, valid.  ``out [B,1,128]`` cols: 0 ub, 1 lb.
    """
    b = pl.program_id(0)
    thresh_eff = params_ref[b, 15]
    slack = params_ref[b, 14]
    tau = params_ref[b, 16]

    def block(n, carry):
        def compute(acc0):
            sl = pl.dslice(n * tq, tq)
            px = src_ref[0:1, sl]
            py = src_ref[1:2, sl]
            pz = src_ref[2:3, sl]
            pn = src_ref[3:4, sl]
            pv = src_ref[4:5, sl]
            qx = px * params_ref[b, 0] + py * params_ref[b, 1] \
                + pz * params_ref[b, 2] + params_ref[b, 9]
            qy = px * params_ref[b, 3] + py * params_ref[b, 4] \
                + pz * params_ref[b, 5] + params_ref[b, 10]
            qz = px * params_ref[b, 6] + py * params_ref[b, 7] \
                + pz * params_ref[b, 8] + params_ref[b, 11]

            def body(c, best):
                w = wm_ref[pl.dslice(c * tm, tm), :]
                dx = w[:, 0:1] - qx
                dy = w[:, 1:2] - qy
                dz = w[:, 2:3] - qz
                d2 = dx * dx + dy * dy + dz * dz
                return jnp.minimum(best, jnp.min(d2, axis=0, keepdims=True))

            best = jax.lax.fori_loop(
                0, n_chunks, body,
                jnp.full((1, tq), jnp.inf, jnp.float32),
            )
            d = jnp.sqrt(jnp.maximum(best, 0.0))
            d_hi = d + slack
            d_lo = jnp.maximum(d - slack, 0.0)
            defl = params_ref[b, 12] * pn + params_ref[b, 13]
            lb_c = jnp.maximum(d_lo - defl, 0.0) ** 2
            ub_c = d_hi * d_hi
            # pad sentinels keep invalid lanes out of the trimmed inlier set
            scr_ref[0:1, sl] = ub_c * pv + (1.0 - pv) * 1e30
            scr_ref[1:2, sl] = lb_c * pv + (1.0 - pv) * 1e30
            return acc0 + jnp.sum(jnp.minimum(lb_c, tau) * pv)

        return jax.lax.cond(carry < thresh_eff, compute, lambda a: a, carry)

    acc = jax.lax.fori_loop(0, nb, block, jnp.float32(0.0))
    screened = acc >= thresh_eff

    # exact trimmed sums over the staged contributions (24-step threshold
    # bisection ≙ bnb.se3._trimmed_sum_bisect; runs only on survivors'
    # complete scratch — screened nodes take the clamped-bound branch)
    x = scr_ref[:, :]                                      # [2, Np]
    rowmax = jnp.max(jnp.where(x < 1e29, x, 0.0), axis=-1, keepdims=True)
    lo0 = jnp.zeros_like(rowmax)
    hi0 = rowmax + 1e-12

    def bisect(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((x <= mid).astype(jnp.float32), axis=-1, keepdims=True)
        take = cnt >= h
        return jnp.where(take, lo, mid), jnp.where(take, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 24, bisect, (lo0, hi0))
    sel = x <= lo
    S = jnp.sum(jnp.where(sel, x, 0.0), axis=-1, keepdims=True)
    C = jnp.sum(sel.astype(jnp.float32), axis=-1, keepdims=True)
    rem = jnp.maximum(h - C, 0.0)
    ub_exact = S[0, 0] + rem[0, 0] * hi[0, 0]              # upper end
    lb_exact = S[1, 0] + rem[1, 0] * lo[1, 0]              # lower end

    ub = jnp.where(screened, 1e30, ub_exact)
    lb = jnp.where(screened, acc - drop * tau, lb_exact)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out_ref[0, :, :] = jnp.where(col == 0, ub, jnp.where(col == 1, lb, 0.0))


@functools.partial(jax.jit, static_argnames=("h", "drop", "interpret"))
def _bounds_trimmed_padded(params, srcT, wm, *, h: int, drop: int,
                           interpret: bool):
    B = params.shape[0]
    Np, Mp = srcT.shape[1], wm.shape[0]
    tq = _pick_tile(Np, TQB)
    tm = _pick_tile(Mp, TM)
    nb = Np // tq
    out = pl.pallas_call(
        functools.partial(
            _bounds_trimmed_kernel, n_chunks=Mp // tm, tm=tm, tq=tq, nb=nb,
            h=h, drop=drop,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B, 24), lambda b: (0, 0)),
            pl.BlockSpec((8, Np), lambda b: (0, 0)),
            pl.BlockSpec((Mp, 8), lambda b: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, 1, 128), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, Np), jnp.float32)],
        interpret=interpret,
    )(params, srcT, wm)[0]
    return out[:, 0, 0], out[:, 0, 1]                      # ub, lb


def pack_params_bounds_trimmed(R, t, af, gt, slack, thresh_eff,
                               tau) -> jnp.ndarray:
    """``[B,24]`` rows (R×9, t×3, af, γt, slack, thresh', τ, pad)."""
    R = jnp.asarray(R, jnp.float32)
    B = R.shape[0]
    return jnp.concatenate(
        [
            R.reshape(B, 9),
            jnp.asarray(t, jnp.float32),
            jnp.asarray(af, jnp.float32)[:, None],
            jnp.asarray(gt, jnp.float32)[:, None],
            jnp.broadcast_to(jnp.float32(slack), (B,))[:, None],
            jnp.broadcast_to(jnp.asarray(thresh_eff, jnp.float32), (B,))[:, None],
            jnp.broadcast_to(jnp.asarray(tau, jnp.float32), (B,))[:, None],
            jnp.zeros((B, 7), jnp.float32),
        ],
        axis=1,
    )


def bounds_nodes_trimmed(srcT_ext, wm, params, *, h: int, drop: int,
                         interpret=None):
    """Fused screened TRIMMED bounds for singleton nodes: ``(ub, lb) [B]``."""
    if interpret is None:
        interpret = not _on_tpu()
    return _bounds_trimmed_padded(
        params, srcT_ext, wm, h=h, drop=drop, interpret=interpret
    )


def _bounds_trimmed_grouped_kernel(params_ref, src_ref, wm_ref, out_ref,
                                   scr_ref, *, n_chunks: int, tm: int,
                                   tq: int, nb: int, h: int, drop: int):
    """Grouped (8 translation siblings / rotation) screened TRIMMED bounds
    (one program per group) — the trimmed twin of ``_bounds_grouped_kernel``
    with ``_bounds_trimmed_kernel``'s clamped-sum screen + in-kernel
    bisection:

    - the 9-op/pair base plane is computed ONCE per group (separability —
      see ``_min_d2_grouped_kernel``);
    - each sibling carries its own clamped partial sum ``Σ min(l̃ᵢ, τ)``;
      the next point-block is skipped once EVERY sibling crosses
      ``thresh' = thresh + (N−h)·τ`` (group granularity — per-sibling
      masking saves nothing on the VPU, the shared plane is the cost);
    - survivors' per-sibling contributions are staged in a ``[16, Np]``
      VMEM scratch (8 ub rows + 8 lb rows) and reduced by the 24-step
      threshold bisection, exact at both bound ends.

    ``params`` row [64]: R×9, t8×24, |t_j|²×8, af, γt×8 (42-49), slack,
    thresh', τ (52).  ``out [G,1,128]``: cols 0-7 sibling ubs, 8-15 lbs.
    """
    g = pl.program_id(0)
    thresh_eff = params_ref[g, 51]
    slack = params_ref[g, 50]
    af = params_ref[g, 41]
    tau = params_ref[g, 52]

    def block(n, carry):
        def compute(acc0):
            sl = pl.dslice(n * tq, tq)
            px = src_ref[0:1, sl]
            py = src_ref[1:2, sl]
            pz = src_ref[2:3, sl]
            pn = src_ref[3:4, sl]
            pv = src_ref[4:5, sl]
            ux = px * params_ref[g, 0] + py * params_ref[g, 1] \
                + pz * params_ref[g, 2]
            uy = px * params_ref[g, 3] + py * params_ref[g, 4] \
                + pz * params_ref[g, 5]
            uz = px * params_ref[g, 6] + py * params_ref[g, 7] \
                + pz * params_ref[g, 8]

            def body(c, best):
                w = wm_ref[pl.dslice(c * tm, tm), :]
                wx = w[:, 0:1]
                wy = w[:, 1:2]
                wz = w[:, 2:3]
                dx = wx - ux
                dy = wy - uy
                dz = wz - uz
                Gp = dx * dx + dy * dy + dz * dz           # base plane, once
                rows = []
                for j in range(8):
                    tx = params_ref[g, 9 + 3 * j]
                    ty = params_ref[g, 10 + 3 * j]
                    tz = params_ref[g, 11 + 3 * j]
                    bj = params_ref[g, 33 + j] \
                        - 2.0 * (tx * wx + ty * wy + tz * wz)
                    rows.append(jnp.min(Gp + bj, axis=0, keepdims=True))
                return jnp.minimum(best, jnp.concatenate(rows, axis=0))

            best = jax.lax.fori_loop(
                0, n_chunks, body,
                jnp.full((8, tq), jnp.inf, jnp.float32),
            )
            accs = []
            for j in range(8):
                tx = params_ref[g, 9 + 3 * j]
                ty = params_ref[g, 10 + 3 * j]
                tz = params_ref[g, 11 + 3 * j]
                aj = 2.0 * (tx * ux + ty * uy + tz * uz)
                d2 = jnp.maximum(best[j : j + 1, :] + aj, 0.0)
                d = jnp.sqrt(d2)
                d_hi = d + slack
                d_lo = jnp.maximum(d - slack, 0.0)
                defl = af * pn + params_ref[g, 42 + j]
                lb_c = jnp.maximum(d_lo - defl, 0.0) ** 2
                ub_c = d_hi * d_hi
                scr_ref[j : j + 1, sl] = ub_c * pv + (1.0 - pv) * 1e30
                scr_ref[8 + j : 9 + j, sl] = lb_c * pv + (1.0 - pv) * 1e30
                accs.append(jnp.sum(jnp.minimum(lb_c, tau) * pv))
            return acc0 + jnp.stack(accs).reshape(1, 8)

        return jax.lax.cond(
            jnp.min(carry) < thresh_eff, compute, lambda a: a, carry
        )

    acc = jax.lax.fori_loop(0, nb, block, jnp.zeros((1, 8), jnp.float32))
    screened = jnp.min(acc) >= thresh_eff       # group-level skip fired

    # exact trimmed sums over the staged contributions: one 24-step
    # threshold bisection over all 16 rows at once (survivor groups only —
    # a screened group's scratch is incomplete and its branch is discarded)
    x = scr_ref[:, :]                                      # [16, Np]
    rowmax = jnp.max(jnp.where(x < 1e29, x, 0.0), axis=-1, keepdims=True)
    lo0 = jnp.zeros_like(rowmax)
    hi0 = rowmax + 1e-12

    def bisect(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((x <= mid).astype(jnp.float32), axis=-1, keepdims=True)
        take = cnt >= h
        return jnp.where(take, lo, mid), jnp.where(take, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 24, bisect, (lo0, hi0))
    sel = x <= lo
    S = jnp.sum(jnp.where(sel, x, 0.0), axis=-1, keepdims=True)
    C = jnp.sum(sel.astype(jnp.float32), axis=-1, keepdims=True)
    rem = jnp.maximum(h - C, 0.0)
    ub_exact = (S + rem * hi)[0:8, 0]                      # upper end
    lb_exact = (S + rem * lo)[8:16, 0]                     # lower end

    ub = jnp.where(screened, 1e30, ub_exact)               # [8]
    lb = jnp.where(screened, acc[0] - drop * tau, lb_exact)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row = jnp.zeros((1, 128), jnp.float32)
    for j in range(8):
        row = jnp.where(col == j, ub[j], row)
        row = jnp.where(col == 8 + j, lb[j], row)
    out_ref[0, :, :] = row


@functools.partial(jax.jit, static_argnames=("h", "drop", "interpret"))
def _bounds_trimmed_grouped_padded(gparams, srcT, wm, *, h: int, drop: int,
                                   interpret: bool):
    G = gparams.shape[0]
    Np, Mp = srcT.shape[1], wm.shape[0]
    tq = _pick_tile(Np, TQB)
    tm = _pick_tile(Mp, TM)
    nb = Np // tq
    out = pl.pallas_call(
        functools.partial(
            _bounds_trimmed_grouped_kernel, n_chunks=Mp // tm, tm=tm, tq=tq,
            nb=nb, h=h, drop=drop,
        ),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((G, 64), lambda g: (0, 0)),
            pl.BlockSpec((8, Np), lambda g: (0, 0)),
            pl.BlockSpec((Mp, 8), lambda g: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, 1, 128), lambda g: (g, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((G, 1, 128), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((16, Np), jnp.float32)],
        interpret=interpret,
    )(gparams, srcT, wm)[0]
    ub = out[:, 0, 0:8].reshape(8 * G)                     # group-major
    lb = out[:, 0, 8:16].reshape(8 * G)
    return ub, lb


def pack_group_params_bounds_trimmed(R, t8, af, gt8, slack, thresh_eff,
                                     tau) -> jnp.ndarray:
    """``[G,64]`` rows (R×9, t8×24, |t_j|²×8, af, γt×8, slack, thresh', τ,
    pad) for the grouped trimmed kernel."""
    R = jnp.asarray(R, jnp.float32)
    t8 = jnp.asarray(t8, jnp.float32)
    G = R.shape[0]
    tn = jnp.sum(t8 * t8, axis=-1)                         # [G, 8]
    return jnp.concatenate(
        [
            R.reshape(G, 9),
            t8.reshape(G, 24),
            tn,
            jnp.asarray(af, jnp.float32)[:, None],
            jnp.asarray(gt8, jnp.float32).reshape(G, 8),
            jnp.broadcast_to(jnp.float32(slack), (G,))[:, None],
            jnp.broadcast_to(jnp.asarray(thresh_eff, jnp.float32), (G,))[:, None],
            jnp.broadcast_to(jnp.asarray(tau, jnp.float32), (G,))[:, None],
            jnp.zeros((G, 11), jnp.float32),
        ],
        axis=1,
    )


def bounds_groups_trimmed(srcT_ext, wm, gparams, *, h: int, drop: int,
                          interpret=None):
    """Fused screened TRIMMED bounds for 8-sibling groups: ``(ub, lb)
    [8·G]`` in group-major node order."""
    if interpret is None:
        interpret = not _on_tpu()
    return _bounds_trimmed_grouped_padded(
        gparams, srcT_ext, wm, h=h, drop=drop, interpret=interpret
    )


def pack_params_bounds(R, t, af, gt, slack, thresh) -> jnp.ndarray:
    """``[B,16]`` rows (R×9, t×3, af, γt, slack, thresh)."""
    R = jnp.asarray(R, jnp.float32)
    B = R.shape[0]
    return jnp.concatenate(
        [
            R.reshape(B, 9),
            jnp.asarray(t, jnp.float32),
            jnp.asarray(af, jnp.float32)[:, None],
            jnp.asarray(gt, jnp.float32)[:, None],
            jnp.broadcast_to(jnp.float32(slack), (B,))[:, None],
            jnp.broadcast_to(jnp.float32(thresh), (B,))[:, None],
        ],
        axis=1,
    )


def pack_group_params_bounds(R, t8, af, gt8, slack, thresh) -> jnp.ndarray:
    """``[G,64]`` rows (R×9, t8×24, |t_j|²×8, af, γt×8, slack, thresh, pad)."""
    R = jnp.asarray(R, jnp.float32)
    t8 = jnp.asarray(t8, jnp.float32)
    G = R.shape[0]
    tn = jnp.sum(t8 * t8, axis=-1)                         # [G, 8]
    return jnp.concatenate(
        [
            R.reshape(G, 9),
            t8.reshape(G, 24),
            tn,
            jnp.asarray(af, jnp.float32)[:, None],
            jnp.asarray(gt8, jnp.float32).reshape(G, 8),
            jnp.broadcast_to(jnp.float32(slack), (G,))[:, None],
            jnp.broadcast_to(jnp.float32(thresh), (G,))[:, None],
            jnp.zeros((G, 12), jnp.float32),
        ],
        axis=1,
    )


def bounds_nodes(srcT_ext, wm, params, *, interpret=None):
    """Fused screened bounds for singleton nodes: ``(ub, lb) [B]``."""
    if interpret is None:
        interpret = not _on_tpu()
    return _bounds_padded(params, srcT_ext, wm, interpret=interpret)


def bounds_groups(srcT_ext, wm, gparams, *, interpret=None):
    """Fused screened bounds for 8-sibling groups: ``(ub, lb) [8·G]``."""
    if interpret is None:
        interpret = not _on_tpu()
    return _bounds_grouped_padded(gparams, srcT_ext, wm, interpret=interpret)


def nearest_neighbor_mxu(queries, targets, *, interpret=None):
    """Exact NN (values + indices): drop-in for ``nn.brute.nearest_neighbor``.

    ``queries [..., Q, 3]``, ``targets [Nt, 3]`` → ``(d2 [..., Q], idx)``.
    The returned ``d2`` is recomputed exactly (coordinate differences) from
    the gathered winner, so downstream mse thresholds at 1e-5 keep full f32
    accuracy regardless of the in-kernel expansion.
    """
    queries = jnp.asarray(queries, jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)
    if interpret is None:
        interpret = not _on_tpu()
    batch_shape = queries.shape[:-2]
    Q = queries.shape[-2]
    flat = queries.reshape(-1, 3)
    total = flat.shape[0]
    srcT = pack_sources(flat)
    wm = pack_targets(targets)
    params = pack_params(
        jnp.eye(3, dtype=jnp.float32)[None], jnp.zeros((1, 3), jnp.float32)
    )
    # diff variant: exact f32 AND ~20x the argmin throughput of the
    # HIGHEST-precision dot (the bf16x6 emulation dominates there)
    _, idx = _min_d2_padded(
        params, srcT, wm, want_idx=True, interpret=interpret, variant="diff"
    )
    idx = jnp.minimum(idx[0, :total], targets.shape[0] - 1)
    diff = flat - jnp.take(targets, idx, axis=0)
    d2 = jnp.sum(diff * diff, axis=-1)
    return d2.reshape(*batch_shape, Q), idx.reshape(*batch_shape, Q)
