"""Blocked simplex driver with the Pallas persistent-VMEM inner loop.

Same algorithm as ``tpulp.solve.blocked`` (rank-K eta blocks), but the K
inner pivots run as ONE Pallas program with the eta factors resident in VMEM
(see ``tpulp.kernels.pallas_block``): per-pivot HBM traffic drops from ~6MB
(re-reading U/V) to ~48KB (one tableau column + one row DMA).

Costs this variant adds: a transposed tableau copy ``Tt`` is maintained so
the entering-column fetch is a contiguous row DMA; the per-block flush is
two MXU matmuls (``T += U^T V`` and ``Tt += V^T U``) instead of one.

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
from ..kernels.pallas_block import blocked_inner_block
from .driver import _budget_key

__all__ = ["run_simplex_blocked_pallas"]


class _Carry(NamedTuple):
    T: jax.Array          # (M, N)
    Tt: jax.Array         # (N, M)
    row0: jax.Array       # (1, N)
    row1: jax.Array       # (1, N)
    bvec: jax.Array       # (1, M)
    ca: jax.Array         # (1, N-1) int32
    ac: jax.Array         # (1, N-1) int32
    basis: jax.Array      # (1, m) int32
    ab: jax.Array         # (1, m) int32
    iscal: jax.Array      # (8,) int32 [phase, status, niter, stuck, bland, t]
    fscal: jax.Array      # (2,) dtype [last_z]


@functools.lru_cache(maxsize=16)
def _compiled(opts: SolverOptions, stall_limit: int, K: int,
              interpret: bool):
    @jax.jit
    def driver(state: SimplexState, max_iters: jax.Array) -> SimplexState:
        dtype = state.T.dtype
        T = state.T
        M, N = T.shape
        m = M - 2

        carry = _Carry(
            T=T,
            Tt=T.T,
            row0=T[0:1, :],
            row1=T[1:2, :],
            bvec=T[:, -1].reshape(1, M),
            ca=state.col_active.astype(jnp.int32).reshape(1, N - 1),
            ac=state.art_cols.astype(jnp.int32).reshape(1, N - 1),
            basis=state.basis.astype(jnp.int32).reshape(1, m),
            ab=state.art_cols[state.basis].astype(jnp.int32).reshape(1, m),
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
            (U, V, row0, row1, bvec, ca, ac, basis, ab, iscal,
             fscal) = blocked_inner_block(
                 c.T, c.Tt, c.row0, c.row1, c.bvec, c.ca, c.ac, c.basis,
                 c.ab, c.iscal, c.fscal,
                 opts=opts, stall_limit=stall_limit, K=K,
                 interpret=interpret)
            # flush the rank-K update into both tableau copies (2 matmuls)
            T = c.T + jnp.einsum('km,kn->mn', U, V,
                                 preferred_element_type=dtype)
            Tt = c.Tt + jnp.einsum('kn,km->nm', V, U,
                                   preferred_element_type=dtype)
            # re-derive the running vectors from the flushed tableau (kills
            # incremental drift once per block)
            return _Carry(
                T=T, Tt=Tt,
                row0=T[0:1, :], row1=T[1:2, :],
                bvec=T[:, -1].reshape(1, M),
                ca=ca, ac=ac, basis=basis, ab=ab,
                iscal=iscal.at[5].set(0), fscal=fscal)

        out = lax.while_loop(cond, body, carry)
        status = out.iscal[1]
        status = jnp.where(status == Status.RUNNING,
                           jnp.int32(Status.ITERATION_LIMIT), status)
        return SimplexState(
            T=out.T,
            basis=out.basis.reshape(m),
            col_active=out.ca.reshape(N - 1) > 0,
            art_cols=out.ac.reshape(N - 1) > 0,
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
    if opts is None:
        opts = SolverOptions.for_dtype(state.T.dtype)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    stall_limit = opts.resolved_stall_limit(state.m, state.n)
    driver = _compiled(_budget_key(opts), stall_limit, block, interpret)
    return driver(state, jnp.asarray(opts.max_iters, jnp.int32))
