"""Rank-K blocked simplex driver: amortize tableau traffic over K pivots.

The rank-1 driver (``driver.py``) is HBM-bound: every pivot reads and writes
the whole (m+2)x(n+1) tableau (~268MB per pivot at 4096x8192 f32), capping
throughput at ~3k pivots/s per chip. This driver uses the product-form-of-
inverse idea reshaped for TPU:

* K-1 consecutive pivots are performed WITHOUT touching the tableau. Pivot t
  appends an eta pair: ``U[:, t] = (e_r - u)/piv`` (the elimination vector,
  where ``u`` is the CURRENT entering column) and ``V[t, :] = current pivot
  row``; the tableau-after-t-pivots is implicitly ``T0 + U V``.
* The decisions each pivot needs are reconstructed cheaply:
    - reduced-cost rows and the RHS column are maintained incrementally
      (O(n)/O(m) vector updates per pivot),
    - the entering column is ``T0[:, j] + U @ V[:, j]`` (one tableau column
      + an (m x K) matvec),
    - the pivot row is ``T0[r, :] + U[r, :] @ V`` (one tableau row + a
      (K x n) vec-mat).
* Once per block the accumulated rank-K update flushes as ONE matmul
  ``T <- T0 + U @ V`` — an MXU op with a single read+write of the tableau —
  and one ordinary branchless ``simplex_step`` runs on the flushed tableau
  to handle everything unusual (phase transition, artificial cleanup,
  unbounded/infeasible/optimal termination) with full generality.

Net HBM traffic per pivot drops from 2·m·n to ~(2·m·n)/K + K·n (the V read),
a >10x reduction for K=32. Inner pivots that encounter anything unusual
simply coast (zero eta) until the block boundary; the outer plain step —
the single source of truth for corner cases — resolves it.

The decision logic (Dantzig/Bland pricing, ratio-test tie-breaks, stall
detection) is IDENTICAL to the rank-1 driver, so both drivers walk the same
pivot path modulo float roundoff.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.state import RULE_BLAND, SimplexState, SolverOptions, Status
from .driver import simplex_step

__all__ = ["run_simplex_blocked"]


class _BlockCarry(NamedTuple):
    s: SimplexState      # s.T is the STALE block-start tableau T0
    U: jax.Array         # (K, m+2) eta vectors as ROWS (zero-padded beyond t)
    V: jax.Array         # (K, n+1) pivot rows (zero-padded beyond t)
    t: jax.Array         # () int32: etas accumulated
    row0: jax.Array      # (n+1,) current phase-2 objective row
    row1: jax.Array      # (n+1,) current phase-1 objective row
    bvec: jax.Array      # (m+2,) current RHS column
    defer: jax.Array     # () bool: unusual event -> coast to block end


def _blocked_pivot(carry: _BlockCarry, opts: SolverOptions,
                   stall_limit: int) -> _BlockCarry:
    s = carry.s
    dtype = s.T.dtype
    n = s.n
    inf = jnp.asarray(jnp.inf, dtype)
    running = s.status == Status.RUNNING

    # anything unusual is deferred to the outer plain step: basic artificials
    # needing cleanup (possible right after a phase transition)...
    needs_cleanup = jnp.any(s.art_cols[s.basis]) & (s.phase == 2)

    # ---- pricing on the maintained objective rows --------------------------
    crow = jnp.where(s.phase == 1, carry.row1[:-1], carry.row0[:-1])
    c_eff = jnp.where(s.col_active, crow, inf)
    improving = c_eff < -opts.opt_tol
    has_improving = jnp.any(improving)
    use_bland = s.bland | (opts.rule == RULE_BLAND)
    col_ids = jnp.arange(n, dtype=jnp.int32)
    j_dantzig = jnp.argmin(c_eff).astype(jnp.int32)
    j_bland = jnp.min(jnp.where(improving, col_ids, n - 1)).astype(jnp.int32)
    j = jnp.where(use_bland, j_bland, j_dantzig)

    # ---- current entering column: T0 column + corrections ------------------
    # both eta factors keep the eta index on the MAJOR axis: a minor-axis
    # (lane-offset) dynamic_update_slice costs ~0.5ms/iter on TPU vs ~1us
    # for a row update (measured), an 8x difference for the whole inner loop
    colj = s.T[:, j] + jnp.einsum('k,km->m', carry.V[:, j], carry.U)

    # ---- ratio test on maintained b ---------------------------------------
    col = colj[2:]
    b = carry.bvec[2:]
    pos = col > opts.piv_tol
    has_ratio = jnp.any(pos)
    ratios = jnp.where(pos, b / jnp.where(pos, col, 1.0), inf)
    min_ratio = jnp.min(ratios)
    tie = ratios <= min_ratio
    r_first = jnp.argmax(tie).astype(jnp.int32)
    r_bland = jnp.argmin(
        jnp.where(tie, s.basis, jnp.int32(2**30))).astype(jnp.int32)
    r = jnp.where(use_bland, r_bland, r_first)

    # ...no improving column (optimal/phase end) or no ratio (unbounded)
    defer = carry.defer | needs_cleanup | ~has_improving | ~has_ratio
    act = running & ~defer & (s.niter < opts.max_iters)
    actf = act.astype(dtype)

    # ---- append the eta pair ----------------------------------------------
    rg = r + 2
    piv = colj[rg]
    safe_piv = jnp.where(act, piv, 1.0)
    w = ((jnp.arange(s.T.shape[0]) == rg).astype(dtype) - colj) / safe_piv
    w = w * actf
    vrow = (s.T[rg, :] + jnp.einsum('k,kn->n', carry.U[:, rg], carry.V)) * actf
    zero = jnp.zeros((), jnp.int32)
    U = lax.dynamic_update_slice(carry.U, w[None, :], (carry.t, zero))
    V = lax.dynamic_update_slice(carry.V, vrow[None, :], (carry.t, zero))

    # ---- maintain running vectors -----------------------------------------
    row0 = carry.row0 + w[0] * vrow
    row1 = carry.row1 + w[1] * vrow
    bvec = carry.bvec + w * vrow[-1]

    basis = jnp.where(act, s.basis.at[r].set(j), s.basis)

    # ---- stall / Bland switch (same contract as the rank-1 driver) --------
    z = jnp.where(s.phase == 1, -row1[-1], -row0[-1])
    improved = (s.last_z - z) > opts.degen_tol
    stuck = jnp.where(
        act, jnp.where(improved, 0, s.stuck + 1), s.stuck).astype(jnp.int32)
    last_z = jnp.where(act, z, s.last_z)
    bland = s.bland | (stuck >= stall_limit)

    s = s._replace(
        basis=basis,
        niter=s.niter + act.astype(jnp.int32),
        stuck=stuck,
        bland=bland,
        last_z=last_z,
    )
    return _BlockCarry(
        s=s, U=U, V=V, t=carry.t + act.astype(jnp.int32),
        row0=row0, row1=row1, bvec=bvec, defer=defer)


@functools.lru_cache(maxsize=32)
def _compiled_blocked_driver(opts: SolverOptions, stall_limit: int, K: int):
    @jax.jit
    def driver(state: SimplexState) -> SimplexState:
        M = state.T.shape[0]
        N = state.T.shape[1]
        dtype = state.T.dtype

        def outer_cond(carry):
            s = carry.s
            return (s.status == Status.RUNNING) & (s.niter < opts.max_iters)

        def outer_body(carry):
            s = carry.s
            # fresh running vectors from the (current) tableau
            carry = _BlockCarry(
                s=s,
                U=jnp.zeros((K, M), dtype=dtype),
                V=jnp.zeros((K, N), dtype=dtype),
                t=jnp.asarray(0, jnp.int32),
                row0=s.T[0, :],
                row1=s.T[1, :],
                bvec=s.T[:, -1],
                defer=jnp.asarray(False),
            )
            # K-1 cheap pivots without touching the tableau
            carry = lax.fori_loop(
                0, K - 1,
                lambda _, c: _blocked_pivot(c, opts, stall_limit),
                carry)
            # flush the rank-K update (one MXU matmul + one tableau pass);
            # einsum contracts the leading eta axis of both factors without
            # materializing a transpose
            T = carry.s.T + jnp.einsum(
                'km,kn->mn', carry.U, carry.V,
                preferred_element_type=dtype)
            s = carry.s._replace(T=T)
            # ...and resolve any deferred event with the general step (also
            # performs one ordinary pivot when nothing unusual happened)
            s = simplex_step(s, opts, stall_limit)
            return carry._replace(s=s)

        init = _BlockCarry(
            s=state,
            U=jnp.zeros((K, M), dtype=dtype),
            V=jnp.zeros((K, N), dtype=dtype),
            t=jnp.asarray(0, jnp.int32),
            row0=state.T[0, :],
            row1=state.T[1, :],
            bvec=state.T[:, -1],
            defer=jnp.asarray(False),
        )
        out = lax.while_loop(outer_cond, outer_body, init).s
        return out._replace(status=jnp.where(
            out.status == Status.RUNNING,
            jnp.int32(Status.ITERATION_LIMIT), out.status))

    return driver


def run_simplex_blocked(
    state: SimplexState,
    opts: SolverOptions | None = None,
    block: int = 32,
) -> SimplexState:
    """Run the rank-K blocked driver to termination (single problem)."""
    if opts is None:
        opts = SolverOptions.for_dtype(state.T.dtype)
    stall_limit = opts.resolved_stall_limit(state.m, state.n)
    return _compiled_blocked_driver(opts, stall_limit, block)(state)
