"""Blocked simplex driver with the Pallas persistent-VMEM inner loop.

Same algorithm as ``tpulp.solve.blocked`` (rank-K eta blocks), but the K
inner pivots run as ONE Pallas program with the eta factors resident in VMEM
(see ``tpulp.kernels.pallas_block``): per-pivot HBM traffic drops from ~6MB
(re-reading U/V) to two 8-row window DMAs (~400KB).

Costs this variant adds: a transposed tableau copy ``Tt`` is maintained so
the entering-column fetch is a contiguous (windowed) row DMA; the per-block
flush is two MXU matmuls (``T += U^T V`` and ``Tt += V^T U``) instead of one.

Padding contract (required by Mosaic's 8-row tile alignment for dynamic HBM
slices): T is zero-padded to (M8, N8) with M8/N8 the next multiples of 8;
the RHS stays at logical column n_real-1; the col-active/artificial masks
are widened to (1, N8) with zeros at the RHS column and all pads; the basis
vector is widened to (1, M8-2) with a BIG fill so padded rows never win the
Bland row rule. Pad rows/cols of T are zero and stay zero under the rank-K
flush because the eta factors are zero there.

``run_simplex_blocked_pallas`` is a drop-in alternative to
``run_simplex_blocked`` with the same SimplexState in/out contract; the
pivot budget may overshoot by at most one block (the kernel checks
termination, the budget is enforced at block boundaries).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.state import SimplexState, SolverOptions, Status
from ..kernels.pallas_block import BIG_I, blocked_inner_block
from .driver import _budget_key

__all__ = ["run_simplex_blocked_pallas"]


def _pad8(x: int) -> int:
    # both dims padded to 128: a window DMA slices dim0 by 8 (sublane tile)
    # and dim1 fully, and Mosaic requires full-width slices to be 128-aligned
    # (lane tile); T and Tt are transposes so both dims need both properties.
    # Small instances pay up to +127 rows/cols of zero traffic here — which
    # is why solve_lp's 'auto' engine selection keeps tableaus below ~4M
    # elements on the rank-1/blocked drivers and routes only genuinely
    # large ones to this kernel (solve/api.py)
    return -(-x // 128) * 128


class _Carry(NamedTuple):
    T: jax.Array          # (M8, N8)
    Tt: jax.Array         # (N8, M8)
    row0: jax.Array       # (1, N8)
    row1: jax.Array       # (1, N8)
    bvec: jax.Array       # (1, M8)
    ca: jax.Array         # (1, N8) int32
    ac: jax.Array         # (1, N8) int32
    basis: jax.Array      # (1, M8-2) int32
    ab: jax.Array         # (1, M8-2) int32
    gamma: jax.Array      # (1, N8) dtype devex weights (ones unless devex)
    iscal: jax.Array      # (8,) int32 [phase, status, niter, stuck, bland, t]
    fscal: jax.Array      # (2,) dtype [last_z]


@functools.lru_cache(maxsize=16)
def _compiled(opts: SolverOptions, stall_limit: int, K: int,
              interpret: bool):
    @jax.jit
    def driver(state: SimplexState, max_iters: jax.Array) -> SimplexState:
        dtype = state.T.dtype
        M, N = state.T.shape
        m = M - 2
        M8, N8 = _pad8(M), _pad8(N)
        m8 = M8 - 2

        T = jnp.zeros((M8, N8), dtype).at[:M, :N].set(state.T)
        ca = jnp.zeros((1, N8), jnp.int32).at[0, :N - 1].set(
            state.col_active.astype(jnp.int32))
        ac = jnp.zeros((1, N8), jnp.int32).at[0, :N - 1].set(
            state.art_cols.astype(jnp.int32))
        basis = jnp.full((1, m8), BIG_I, jnp.int32).at[0, :m].set(
            state.basis.astype(jnp.int32))
        ab = jnp.zeros((1, m8), jnp.int32).at[0, :m].set(
            state.art_cols[state.basis].astype(jnp.int32))

        carry = _Carry(
            T=T,
            Tt=T.T,
            row0=T[0:1, :],
            row1=T[1:2, :],
            bvec=T[:, N - 1].reshape(1, M8),
            ca=ca,
            ac=ac,
            basis=basis,
            ab=ab,
            gamma=jnp.ones((1, N8), dtype),
            iscal=jnp.stack([
                state.phase.astype(jnp.int32),
                state.status.astype(jnp.int32),
                state.niter.astype(jnp.int32),
                state.stuck.astype(jnp.int32),
                state.bland.astype(jnp.int32),
                jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.int32),
            ]),
            fscal=jnp.stack([state.last_z.astype(dtype),
                             jnp.zeros((), dtype)]),
        )

        def cond(c: _Carry):
            return (c.iscal[1] == Status.RUNNING) & (c.iscal[2] < max_iters)

        def body(c: _Carry):
            (U, V, row0, row1, bvec, ca, ac, basis, ab, gamma, iscal,
             fscal) = blocked_inner_block(
                 c.T, c.Tt, c.row0, c.row1, c.bvec, c.ca, c.ac, c.basis,
                 c.ab, c.gamma, c.iscal, c.fscal,
                 opts=opts, stall_limit=stall_limit, K=K,
                 n_real=N, m_real=m, interpret=interpret)
            # FUSED flush (r5, profile-driven — BENCH.md trace breakdown):
            # one tiled Pallas pass computes ``Tn = T + U^T V`` on the MXU
            # and writes BOTH Tn and its transpose from the same in-VMEM
            # tile. Correctness contract unchanged from the r3 fix: two
            # separately-accumulated matmuls (T += U^T V and Tt += V^T U)
            # round differently on the MXU and corrupt the walk (caught by
            # a compiled pin: 2000-pivot stall); here Tt == T^T bit-for-bit
            # by construction. What it buys: the old ``T.T`` lowered to two
            # full-tableau layout copies (852 us/block at 4096x8192/K=256 =
            # ~24% of wall) — now the transpose is one extra tile WRITE
            # inside the flush pass.
            from ..kernels.pallas_block import fused_flush

            if K * M8 * dtype.itemsize <= 12 * 2 ** 20:
                T, Tt, scan = fused_flush(c.T, U, V, ca,
                                          opt_tol=float(opts.opt_tol),
                                          piv_tol=float(opts.piv_tol),
                                          interpret=interpret)
                imp_cols = scan[0] > 0
                blocked_cols = scan[1] > 0
            else:
                # VERY tall tableaus (K*M8 past the fused kernel's VMEM
                # residency budget): the pre-r5 XLA formulation — einsum
                # flush then an exact transpose (HIGHEST precision: f32
                # einsums otherwise feed the MXU bf16 inputs, and two
                # separately-accumulated matmuls would let Tt drift from
                # T^T and corrupt the walk — the r3 compiled-pin finding)
                T = c.T + jnp.einsum('km,kn->mn', U, V,
                                     preferred_element_type=dtype,
                                     precision=lax.Precision.HIGHEST)
                Tt = T.T
                imp_cols = (ca[0, :] > 0) & (T[0, :] < -opts.opt_tol)
                blocked_cols = jnp.any(T[2:, :] > opts.piv_tol, axis=0)
            # per-block RAY SCAN (round 4, mirrors solve.blocked): the
            # inputs now ride the fused flush (r5 — the standalone scan
            # re-read the whole tableau, 189 us/block); reducing the
            # accumulators here certifies unboundedness the in-kernel
            # pricing may circle for thousands of pivots under devex.
            # Pads are zero / masked; RHS column sits at N-1 < N8.
            ray = (jnp.any(imp_cols & ~blocked_cols)
                   & (iscal[0] == 2) & (iscal[1] == Status.RUNNING))
            iscal = iscal.at[1].set(jnp.where(
                ray, jnp.int32(Status.UNBOUNDED), iscal[1]))
            # re-derive the running vectors from the flushed tableau (kills
            # incremental drift once per block)
            # devex weights persist across the flush boundary (matching the
            # jnp blocked driver)
            return _Carry(
                T=T, Tt=Tt,
                row0=T[0:1, :], row1=T[1:2, :],
                bvec=T[:, N - 1].reshape(1, M8),
                ca=ca, ac=ac, basis=basis, ab=ab, gamma=gamma,
                iscal=iscal.at[5].set(0), fscal=fscal)

        out = lax.while_loop(cond, body, carry)
        status = out.iscal[1]
        status = jnp.where(status == Status.RUNNING,
                           jnp.int32(Status.ITERATION_LIMIT), status)
        return SimplexState(
            T=out.T[:M, :N],
            basis=out.basis[0, :m],
            col_active=out.ca[0, :N - 1] > 0,
            art_cols=out.ac[0, :N - 1] > 0,
            phase=out.iscal[0],
            status=status,
            niter=out.iscal[2],
            stuck=out.iscal[3],
            bland=out.iscal[4] > 0,
            last_z=out.fscal[0],
        )

    return driver


def run_simplex_blocked_pallas(
    state: SimplexState,
    opts: SolverOptions | None = None,
    block: int = 128,
    interpret: bool | None = None,
) -> SimplexState:
    """Run the Pallas-inner-loop blocked driver to termination."""
    from ..core.state import eta_scaled_options

    if opts is None:
        opts = SolverOptions.for_dtype(state.T.dtype)
    opts = eta_scaled_options(opts, state.T.dtype)
    if state.T.dtype == jnp.float64 and jax.default_backend() == "tpu":
        # measured round 4: Mosaic has no f64 lowering — the kernel dies in
        # infinite _convert_element_type recursion at trace time. Fail with
        # an actionable message instead; the f64 engine is the jnp blocked
        # driver (954 pivots/s at the bench shape, BENCH.md row 6).
        raise ValueError(
            "the Pallas kernel cannot run float64 on TPU (Mosaic has no "
            "f64 support); use driver='blocked' for f64, or f32 iterates "
            "with exact refinement (the production policy)")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    stall_limit = opts.resolved_stall_limit(state.m, state.n)
    driver = _compiled(_budget_key(opts), stall_limit, block, interpret)
    return driver(state, jnp.asarray(opts.max_iters, jnp.int32))
